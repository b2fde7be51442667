"""CDC event model, last-writer-wins semantics, replay drivers.

The reference's "capture" unit — an idempotent incremental load per
``(tabela_destino, unidade_geografica, periodo)``
(/root/reference/src/impulsoetl/scripts/geral.py:36-116) — maps here to a
WAL/binlog stream of ``I/U/D`` events keyed ``(repo, path)``, replayed in
epochs (micro-batches) into a :class:`etl_spark.lake.LakeTable` with
exactly-once manifests.
"""

from etl_spark.cdc.agg_sync import (
    create_aggregate_table,
    create_rollup_table,
    sync_aggregate,
    sync_aggregate_recompute,
)
from etl_spark.cdc.scd2 import (
    apply_scd2,
    create_scd2_tables,
    purge_scd2,
    replay_scd2,
    scd2_history,
    scd2_view,
)
from etl_spark.cdc.dedup_ingest import (
    DedupIngestStats,
    create_dedup_state,
    dedup_gated_merge,
    minhash_sketch,
)
from etl_spark.cdc.bootstrap import (
    BootstrapStats,
    bootstrap_active,
    bootstrap_snapshot,
    bootstrap_status,
)
from etl_spark.cdc.consistent import aligned_version, read_group, route_keys
from etl_spark.cdc.envelope import (
    envelope_schema,
    infer_payload_schema,
    make_envelope,
    parse_envelopes,
    suggest_promotions,
)
from etl_spark.cdc.events import EVENT_SCHEMA, synth_events, write_event_epochs
from etl_spark.cdc.gaps import sequence_gap_stats, sequence_gaps
from etl_spark.cdc.join_sync import JSYNC_SEQ, create_join_table, sync_join
from etl_spark.cdc.lww import lww_dedup
from etl_spark.cdc.reconcile import (
    ReconcileStats,
    reconcile_snapshot,
    snapshot_corrections,
)
from etl_spark.cdc.router import apply_envelope_batch, route_envelopes
from etl_spark.cdc.replay import replay_batches, replay_events
from etl_spark.cdc.sketch_sync import create_sketch_table, \
    sync_aggregate_sketch
from etl_spark.cdc.sync import last_synced_version, sync_changes
from etl_spark.cdc.txn import TxnGate, TxnWaveStats, create_txn_gate

__all__ = [
    "BootstrapStats",
    "bootstrap_active",
    "bootstrap_snapshot",
    "bootstrap_status",
    "DedupIngestStats",
    "aligned_version",
    "read_group",
    "route_keys",
    "apply_envelope_batch",
    "envelope_schema",
    "infer_payload_schema",
    "make_envelope",
    "parse_envelopes",
    "suggest_promotions",
    "route_envelopes",
    "ReconcileStats",
    "reconcile_snapshot",
    "snapshot_corrections",
    "TxnGate",
    "TxnWaveStats",
    "create_txn_gate",
    "create_dedup_state",
    "dedup_gated_merge",
    "minhash_sketch",
    "EVENT_SCHEMA",
    "synth_events",
    "write_event_epochs",
    "sequence_gap_stats",
    "sequence_gaps",
    "lww_dedup",
    "replay_batches",
    "replay_events",
    "last_synced_version",
    "sync_changes",
    "JSYNC_SEQ",
    "create_join_table",
    "sync_join",
    "create_aggregate_table",
    "create_rollup_table",
    "sync_aggregate",
    "sync_aggregate_recompute",
    "create_sketch_table",
    "sync_aggregate_sketch",
    "apply_scd2",
    "create_scd2_tables",
    "purge_scd2",
    "replay_scd2",
    "scd2_history",
    "scd2_view",
]
