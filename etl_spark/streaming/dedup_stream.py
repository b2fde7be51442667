"""Streaming dedup-gated ingest: document stream → gate → docs + state.

The streaming face of :func:`etl_spark.cdc.dedup_ingest.dedup_gated_merge`
(reference analogue: the scheduled-capture loop that discovers pending
slices and loads each exactly once, scripts/geral.py:36-116 — here the
file source's checkpointed offsets are the schedule and the gate is the
load's QA step). Each micro-batch runs the full gate — exact dedup,
verified within-batch LSH dedup, verified near-dup check against the
sketch state accumulated by all PREVIOUS micro-batches — and commits
survivors + sketches under one ``stream:{stream_id}:{batch_id}`` key.

Restart semantics inherit the gate's crash contract: the checkpoint
replays the in-flight micro-batch, the gate recomputes the identical
survivor set against unchanged state (docs-before-state commit ordering),
and whichever of the two merges already landed is a metadata no-op.

Ordering note: micro-batches are processed serially by the streaming
engine, so the state a batch sees is exactly the survivors of batches
``< batch_id`` — the same sequential contract the batch harness (and the
``cdc_dedup_ingest`` oracle) verifies.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_spark.lake import LakeTable

__all__ = ["stream_dedup_ingest"]


def stream_dedup_ingest(
    spark: SparkSession,
    docs_dir: str,
    docs: LakeTable,
    state: LakeTable,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    stream_id: str | None = None,
    stats_sink: list | None = None,
    **gate_kwargs,
):
    """Tail ``docs_dir`` (parquet document batches carrying the docs
    table's key/version/payload columns plus ``op``) through the dedup
    gate; returns the StreamingQuery. ``gate_kwargs`` pass through to
    :func:`dedup_gated_merge` (threshold, bands, max_bucket, ...);
    ``stats_sink`` (a list) collects one ``DedupIngestStats`` per applied
    micro-batch."""
    from etl_spark.cdc.dedup_ingest import dedup_gated_merge
    from etl_spark.streaming.identity import stream_identity

    if stream_id is None:
        # checkpoint-incarnation id, not a path hash: a rebuilt checkpoint
        # restarts batch ids at 0 and must not fold into the old watermark
        stream_id = stream_identity(checkpoint_dir)

    schema = spark.read.parquet(docs_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def apply_batch(batch_df, batch_id: int) -> None:
        stats = dedup_gated_merge(
            docs, state, batch_df,
            manifest_key=f"stream:{stream_id}:{batch_id}", **gate_kwargs,
        )
        if stats_sink is not None:
            stats_sink.append(stats)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
