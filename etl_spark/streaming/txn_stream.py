"""Structured Streaming face of the transaction gate: connector topic
tail → whole-transaction releases → routed multi-table apply.

Composition per micro-batch (``foreachBatch``):

1. ``TxnGate.apply_wave`` — buffer transactional rows, release
   autocommit rows plus every transaction now complete;
2. ``apply_envelope_batch`` — route the released rows into their
   LakeTables under per-(batch, table) exactly-once manifests, dead
   letters landed idempotently;
3. ``TxnGate.confirm_released`` — evict the applied transactions.

Crash anywhere: the checkpoint replays the micro-batch; gate merges
no-op on their wave manifests, unconfirmed releases re-release, and the
destination merges no-op where already committed — the table never
holds half a source transaction and never loses one. The gate's wave
manifests are namespaced by the checkpoint-incarnation identity, so a
rebuilt checkpoint cannot fold new batch ids into stale no-ops.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from etl_spark.cdc.txn import TxnGate
from etl_spark.lake import LakeTable

__all__ = ["stream_txn_ingest"]


def stream_txn_ingest(
    spark: SparkSession,
    wire_dir: str,
    gate_path: str,
    schemas: dict[str, StructType],
    tables: dict[str, LakeTable],
    checkpoint_dir: str,
    quarantine_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    stats_sink: list | None = None,
):
    """Tail ``wire_dir`` (newline-delimited envelope JSON + transaction
    markers) applying only whole source transactions; returns the
    StreamingQuery. The gate state must already exist at ``gate_path``
    (``create_txn_gate``)."""
    from etl_spark.cdc.router import apply_envelope_batch
    from etl_spark.streaming.identity import stream_identity

    stream_id = stream_identity(checkpoint_dir)
    gate = TxnGate.load(spark, gate_path, manifest_prefix=stream_id)

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.text(wire_dir)

    def apply_batch(batch_df, batch_id: int) -> None:
        released, stats = gate.apply_wave(batch_df, wave=batch_id)
        apply_envelope_batch(
            released,
            schemas,
            tables,
            manifest_key=f"txnenv:{stream_id}:{batch_id}",
            quarantine_dir=quarantine_dir,
        )
        gate.confirm_released(batch_id)
        if stats_sink is not None:
            stats_sink.append(stats)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
