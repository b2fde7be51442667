"""Structured Streaming face of the envelope router: connector topic tail
→ N LakeTables, exactly-once per (micro-batch, table), dead letters
landed per batch.

Same streaming discipline as :mod:`etl_spark.streaming.stream_replay`:
the file source's checkpoint is the offset log, ``foreachBatch`` applies
the batch through :func:`etl_spark.cdc.router.apply_envelope_batch`, and
the per-table commit-manifest keys ``env:{stream_id}:{batch_id}:{table}``
make a replayed micro-batch a metadata no-op table by table — a crash
between two tables' merges resumes precisely (committed prefix no-ops,
rest applies). ``stream_id`` is the checkpoint-incarnation identity
(streaming/identity.py), so a rebuilt checkpoint cannot fold new batch
ids into a stale watermark.

The source is ``spark.readStream.text`` over a directory of newline-
delimited envelope JSON — the shape a Kafka-connect S3/GCS sink or a
debezium-server file sink actually lands (one message per line). In this
container there is no Kafka; on a real cluster the reader swaps for
``readStream.format("kafka")`` + ``selectExpr("CAST(value AS STRING)")``
with zero change below the source.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable

__all__ = ["stream_envelope_ingest"]


def stream_envelope_ingest(
    spark: SparkSession,
    wire_dir: str,
    schemas: dict[str, StructType],
    tables: dict[str, LakeTable],
    checkpoint_dir: str,
    quarantine_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    stream_id: str | None = None,
    metrics_sink=None,
    infer_drift: bool = False,
):
    """Tail ``wire_dir`` (newline-delimited envelope JSON files) and keep
    every routed LakeTable current; returns the StreamingQuery.

    ``available_now=True`` drains what's landed and stops (catch-up);
    otherwise tails forever. Restart with the same ``checkpoint_dir`` to
    resume exactly-once. ``infer_drift=True`` discovers payload keys
    beyond the declared schemas per micro-batch and evolves the lake
    tables additively mid-stream (cdc/envelope.py::infer_payload_schema)."""
    import time

    from etl_spark.cdc.router import apply_envelope_batch
    from etl_spark.streaming.identity import stream_identity

    if stream_id is None:
        stream_id = stream_identity(checkpoint_dir)

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.text(wire_dir)

    def apply_batch(batch_df, batch_id: int) -> None:
        t0 = time.monotonic()
        stats = apply_envelope_batch(
            batch_df,
            schemas,
            tables,
            manifest_key=f"env:{stream_id}:{batch_id}",
            quarantine_dir=quarantine_dir,
            infer_drift=infer_drift,
        )
        if metrics_sink is not None:
            for s in stats.values():
                metrics_sink.record(s, wall_sec=time.monotonic() - t0)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
