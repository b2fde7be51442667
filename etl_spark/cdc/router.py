"""Multi-table CDC envelope routing: one wire stream → N lake tables.

A Debezium/DMS connector emits every table of the captured database onto
one stream; each message names its table in ``source.table``. This module
fans that stream out — one cheap header probe per row, one full payload
parse per table *on that table's rows only* — and applies each table's
events to its own :class:`~etl_spark.lake.LakeTable` under per-table
exactly-once manifest keys, with poison messages and unknown tables landed
in a dead-letter output instead of aborting the stream. The reference runs
one capture loop per upstream table with shared transport plumbing
(/root/reference/src/impulsoetl/scripts/geral.py:36-116 — the operator
list enumerates per-table capture functions over one scheduling shape);
here the shape is one routed stream.

Scale notes: routing costs ``get_json_object(value, '$.source.table')`` —
a simd-jsonpath header probe, no full parse — plus one ``from_json`` per
table over its own (filtered) subset, so total parse work is ~2 passes
over the bytes regardless of table count, all codegen'd, no shuffle
before the per-table merges. In ``apply_envelope_batch`` the raw batch is
persisted once so the per-table scans don't re-read the source N times.

Crash story (same ledger discipline as the rest of the engine): tables
merge in sorted-name order, each under ``{manifest_key}:{table}``; a
crash between tables replays as no-ops on the already-committed prefix
and applies the rest. The quarantine lands under a per-batch directory
with overwrite, so a replayed batch rewrites — never duplicates — its
dead letters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.cdc.envelope import (
    envelope_schema,
    parse_envelopes,
    quarantine_reason,
)
from etl_spark.lake import LakeTable

__all__ = ["route_envelopes", "apply_envelope_batch", "read_quarantine"]

_TABLE_PROBE = "$.source.table"


def route_envelopes(
    df: DataFrame,
    schemas: dict[str, StructType],
    value_col: str = "value",
    infer_drift: bool = False,
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Split an envelope batch by ``source.table``.

    Returns ``(events_by_table, quarantine)``: one flat I/U/D event
    DataFrame per table in ``schemas`` (the engine shape —
    ``op/op_ts/seq`` + payload, see :func:`parse_envelopes`), and one
    combined quarantine ``(value, reason, _table)`` where ``reason`` adds
    ``unknown_table`` for well-formed envelopes naming a table this
    router has no schema for (a new upstream table appearing mid-stream
    must surface in the dead letter, not vanish).

    ``infer_drift=True`` runs :func:`~etl_spark.cdc.envelope
    .infer_payload_schema` per table over that table's own rows before
    parsing, so payload keys the declared schema lacks surface as extra
    (consensus-typed) columns instead of being silently dropped — the
    live wire-drift path into the lake's additive evolution. One
    control-plane aggregation per table per batch.
    """
    from etl_spark.cdc.envelope import infer_payload_schema

    raw = F.col(value_col)
    probed_table = F.get_json_object(raw, _TABLE_PROBE)
    events: dict[str, DataFrame] = {}
    quarantines: list[DataFrame] = []
    for name in sorted(schemas):
        subset = df.filter(raw.isNotNull() & (probed_table == F.lit(name)))
        schema = schemas[name]
        if infer_drift:
            schema = infer_payload_schema(subset, schema, value_col)
        good, bad = parse_envelopes(subset, schema, value_col)
        events[name] = good
        quarantines.append(
            bad.withColumn("_table", F.lit(name))
        )

    # Rows whose header probe matches no routed table: either poison
    # (classified with the standard reasons) or a genuinely unknown table.
    known = list(schemas)
    unknown = df.filter(
        raw.isNotNull() & (probed_table.isNull() | ~probed_table.isin(known))
    )
    env = F.from_json(raw, envelope_schema(StructType([])))
    unknown_q = unknown.select(
        raw.alias("value"),
        F.coalesce(quarantine_reason(env), F.lit("unknown_table")).alias(
            "reason"
        ),
        probed_table.alias("_table"),
    )
    quarantines.append(unknown_q)

    quarantine = quarantines[0]
    for q in quarantines[1:]:
        quarantine = quarantine.unionAll(q)
    return events, quarantine


def apply_envelope_batch(
    batch_df: DataFrame,
    schemas: dict[str, StructType],
    tables: dict[str, LakeTable],
    manifest_key: str,
    quarantine_dir: str | None = None,
    value_col: str = "value",
    drop_cols: tuple[str, ...] = ("_table",),
    infer_drift: bool = False,
) -> dict[str, object]:
    """Route one batch and MERGE each table's events into its LakeTable.

    Exactly-once per table via ``{manifest_key}:{table}``; a replay of the
    whole batch (streaming restart, retried job) no-ops on every table the
    previous attempt committed. The quarantine (if ``quarantine_dir``)
    lands under ``{quarantine_dir}/{manifest_key with ':'→'='}/`` in
    overwrite mode — idempotent under the same replays. Returns
    ``{table: MergeStats}``.

    ``infer_drift=True`` discovers payload keys beyond each declared
    schema (see :func:`route_envelopes`) and lets the MERGE's additive
    evolution add them to the lake table mid-stream.
    """
    if set(schemas) != set(tables):
        raise ValueError(
            f"schemas/tables key mismatch: {sorted(schemas)} vs "
            f"{sorted(tables)}"
        )
    from pyspark import StorageLevel

    batch_df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        events, quarantine = route_envelopes(
            batch_df, schemas, value_col, infer_drift=infer_drift
        )
        stats = {}
        for name in sorted(tables):
            flat = events[name].drop(
                *[c for c in drop_cols if c in events[name].columns]
            )
            stats[name] = tables[name].merge(
                flat, manifest_key=f"{manifest_key}:{name}"
            )
        if quarantine_dir is not None:
            sub = os.path.join(
                quarantine_dir, manifest_key.replace(":", "=")
            )
            quarantine.write.mode("overwrite").parquet(sub)
        return stats
    finally:
        batch_df.unpersist()


def read_quarantine(spark: SparkSession, quarantine_dir: str) -> DataFrame:
    """All dead letters landed so far (every batch subdirectory). Feed the
    ``value`` column back through :func:`route_envelopes` after a
    connector fix to re-ingest."""
    return spark.read.option("recursiveFileLookup", "true").parquet(
        quarantine_dir
    )
