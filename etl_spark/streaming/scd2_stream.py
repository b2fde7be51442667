"""Streaming SCD Type-2 maintenance: CDC event stream → current + history.

The streaming face of :func:`etl_spark.cdc.scd2.apply_scd2` (reference
analogue: the scheduled re-capture loop that revises history tables slice
by slice, scripts/geral.py:36-116 — the file source's checkpointed
offsets are the schedule). Each micro-batch collapses to per-key LWW
winners, closes the affected open intervals into the append-only history
table, then LWW-merges the winners into the entity-keyed current table,
under per-stream manifest keys ``scd2:{stream_id}:hist:{batch_id}`` /
``scd2:{stream_id}:cur:{batch_id}`` (batch seq last, so both fold into
bounded per-prefix watermarks; the stream identity in the prefix keeps a
second stream into the same pair from colliding).

Restart semantics inherit apply_scd2's history-before-current crash
contract: the checkpoint replays the in-flight micro-batch, the close set
re-derives identically from the unchanged current table, and whichever
merge already landed is a metadata no-op. Micro-batches are processed
serially, so each batch closes against exactly the state batches
``< batch_id`` left — the same sequential contract the batch harness and
the ``scd2_incremental`` oracle verify.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_spark.lake import LakeTable

__all__ = ["stream_scd2"]


def stream_scd2(
    spark: SparkSession,
    events_dir: str,
    current: LakeTable,
    history: LakeTable,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    stream_id: str | None = None,
    stats_sink: list | None = None,
):
    """Tail ``events_dir`` (FLAT parquet event files carrying the current
    table's key/version/payload columns plus ``op``) into the SCD2 pair;
    returns the StreamingQuery. ``stats_sink`` (a list) collects one
    ``(hist MergeStats, cur MergeStats)`` pair per micro-batch."""
    from etl_spark.cdc.scd2 import apply_scd2
    from etl_spark.streaming.identity import stream_identity

    if stream_id is None:
        # checkpoint-incarnation id, not a path hash: a rebuilt checkpoint
        # restarts batch ids at 0 and must not fold into the old watermark
        stream_id = stream_identity(checkpoint_dir)

    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)

    def apply_batch(batch_df, batch_id: int) -> None:
        stats = apply_scd2(
            current, history, batch_df, epoch=batch_id,
            manifest_prefix=f"scd2:{stream_id}",
        )
        if stats_sink is not None:
            stats_sink.append(stats)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
