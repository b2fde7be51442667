"""Consumer-lag / freshness observability for the incremental tier.

Every downstream consumer (``cdc.sync``, ``cdc.agg_sync``,
``cdc.join_sync``, SCD2) records its cursor — the highest upstream
snapshot version it has applied — inside its own commit manifests. This
module turns those cursors into the ops view a CDC deployment watches:
how many upstream commits behind is each replica, and (optionally) how
far behind in *event time*. The reference keeps the same ledger for its
scheduled captures (capturas_historico — which periods landed, when:
/root/reference/src/impulsoetl/bd.py + scripts/geral.py:36-116); here
the ledger is the snapshot metadata itself.

``versions_behind`` is METADATA-ONLY — two snapshot-log reads per
consumer, no data I/O, so a monitor can poll it every few seconds
against 100 TB tables. ``with_event_time=True`` additionally resolves the
first version column's high-water per side (use where the version leads
with an event timestamp, which all the engine's WAL shapes do) through
the metadata-plane aggregates (lake/fastagg.py): footer stats answer
for compacted all-live buckets, so on a well-maintained table even the
event-time probe stays near-metadata-cost; only tombstone-bearing files
and dirty buckets are scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_spark.lake import LakeTable

__all__ = ["consumer_lag"]


def _event_high_water(table: LakeTable):
    # metadata-plane max (lake/fastagg.py): footer stats answer for every
    # compacted all-live bucket; only tombstone-bearing files and dirty
    # buckets are scanned — same live-rows semantics as read().agg(max)
    from etl_spark.lake.fastagg import fast_min_max

    col = table.current_snapshot().version_cols[0]
    vals, _ = fast_min_max(table, [col])
    return vals[col][1]


def consumer_lag(
    spark: SparkSession,
    src: LakeTable,
    consumers: dict[str, LakeTable],
    prefix: str = "sync",
    with_event_time: bool = False,
) -> DataFrame:
    """One row per consumer: ``consumer, cursor_version, src_version,
    versions_behind, caught_up`` (+ ``src_event_hw, dst_event_hw`` under
    ``with_event_time``). ``cursor_version`` NULL = never synced
    (``versions_behind`` then counts from version 0)."""
    src_version = src.current_snapshot().version
    src_hw = _event_high_water(src) if with_event_time else None

    rows = []
    for name in sorted(consumers):
        dst = consumers[name]
        from etl_spark.cdc.sync import last_synced_version

        cursor = last_synced_version(dst, prefix=prefix)
        behind = src_version - (cursor if cursor is not None else 0)
        row = {
            "consumer": name,
            "cursor_version": cursor,
            "src_version": src_version,
            "versions_behind": behind,
            "caught_up": behind == 0,
        }
        if with_event_time:
            row["src_event_hw"] = src_hw
            row["dst_event_hw"] = _event_high_water(dst)
        rows.append(row)

    base = (
        "consumer string, cursor_version bigint, src_version bigint, "
        "versions_behind bigint, caught_up boolean"
    )
    if with_event_time:
        # event high-waters keep the version column's own type; stringify
        # for a type-stable report (it's a monitoring surface, not data)
        for r in rows:
            r["src_event_hw"] = (
                None if r["src_event_hw"] is None else str(r["src_event_hw"])
            )
            r["dst_event_hw"] = (
                None if r["dst_event_hw"] is None else str(r["dst_event_hw"])
            )
        base += ", src_event_hw string, dst_event_hw string"
    return spark.createDataFrame(
        [tuple(r.values()) for r in rows], base
    )
