"""Structured Streaming replay: WAL tail → LakeTable MERGE, exactly-once.

The reference's scheduled-capture loop discovers pending work from a control
table, locks, loads, then records history in the same transaction
(/root/reference/src/impulsoetl/scripts/geral.py:36-116,
utilitarios/semaforos.py:26-119). Streaming equivalent:

- **pending-work discovery** = the file source's checkpointed offsets (new
  WAL files are the schedule; ``maxFilesPerTrigger`` is the reference's
  ``passo`` batch-size knob);
- **exactly-once** = checkpoint (which micro-batch saw which files) +
  idempotent commit manifest keyed ``stream:{stream_id}:{batch_id}`` inside
  ``foreachBatch`` — a restart that replays the last micro-batch hits the
  manifest and is a metadata no-op (the double-guard the reference builds
  from semaphores + history rows);
- **late/revised data** = the LWW version columns; arrival order never
  affects the final state, so no watermark is needed for correctness
  (a watermark would only bound tombstone retention).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_spark.lake import LakeTable

__all__ = ["stream_replay"]


def stream_replay(
    spark: SparkSession,
    events_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    metrics_sink=None,
    drop_cols: tuple[str, ...] = ("epoch",),
    stream_id: str | None = None,
):
    """Stream the landed WAL into ``table``; returns the StreamingQuery.

    With ``available_now`` the query drains everything already landed and
    stops (bounded replay / catch-up); without it, it tails the directory
    forever. Restart with the same ``checkpoint_dir`` to resume.

    ``stream_id`` namespaces the exactly-once manifest keys. Batch ids are
    only unique *per checkpoint incarnation*: a second stream feeding the
    same table — or a checkpoint deleted and rebuilt at the same path,
    whose batch ids restart at 0 with different file groupings — would
    otherwise collide with the old ``stream:<n>`` watermark and silently
    drop its rows. Default: :func:`etl_spark.streaming.identity
    .stream_identity` — a marker persisted inside the checkpoint, so
    same-checkpoint restarts stay idempotent while a rebuilt checkpoint
    gets a fresh manifest prefix.
    """
    import time

    from etl_spark.streaming.identity import stream_identity

    if stream_id is None:
        stream_id = stream_identity(checkpoint_dir)

    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)

    def apply_batch(batch_df, batch_id: int) -> None:
        t0 = time.monotonic()
        df = batch_df.drop(*[c for c in drop_cols if c in batch_df.columns])
        stats = table.merge(df, manifest_key=f"stream:{stream_id}:{batch_id}")
        if metrics_sink is not None:
            metrics_sink.record(stats, wall_sec=time.monotonic() - t0)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
