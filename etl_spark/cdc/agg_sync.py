"""Incremental aggregate maintenance: change feed → materialized rollup.

The reference maintains downstream *aggregated* tables by re-running whole
capture slices when their inputs change (the ``(geo, period)`` granularity
of capturas_historico, /root/reference/src/impulsoetl/scripts/geral.py:92-109,
feeding QA/summary checks like
sisab/relatorio_validacao_producao/verificacao.py:15-44). At lake scale a
"re-run the slice" contract becomes incremental view maintenance: keep a
``GROUP BY``-shaped destination exactly equal to the aggregate of the
upstream's CURRENT state, touching only what changed.

Protocol per round (``sync_aggregate``):

1. ``src.changes(cursor, end)`` identifies the CHANGED KEYS — never trusted
   for values (a feed post-image may be a late LWW loser; only snapshot
   reads see the true winner).
2. The changed keys' **old** rows (``version=cursor``) and **new** rows
   (``version=end``) are read with bucket pruning: keys hash to a bounded
   set of buckets, so both reads touch ≈ |changed buckets| / n_buckets of
   the table — never a full scan.
3. Signed contributions (``+row`` at new group, ``−row`` at old group)
   collapse into one combinable per-group delta; integer (fixed-point)
   measures make the arithmetic exact, so an untouched key's +x/−x cancels
   bit-for-bit and repeated maintenance never drifts. This is why
   ``sum_exprs`` must be integral — floating-point sums are NOT safely
   maintainable incrementally (error accumulates per round); scale the
   measure to cents/micros first, divide at query time.
4. Only the affected groups' current totals are read back from the
   destination (bucket-pruned again — the rollup is keyed by the group
   columns), added to the delta, and MERGEd with the cursor advanced in
   the same atomic commit (manifest key ``{prefix}:{end}``) — the same
   crash-safe exactly-once shape as :func:`etl_spark.cdc.sync.sync_changes`.
   A group whose row count reaches zero is tombstoned.

Supported aggregates: ``COUNT(*)`` plus any integral ``SUM`` (AVG derives
as sum/count at query time). MIN/MAX are deliberately out: they are not
subtractable — maintaining them incrementally requires re-aggregating a
group when its extremum leaves, i.e. the recompute-affected-groups plan,
which this module's O(changed keys) contract refuses to hide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from etl_spark.cdc.sync import _guard_upstream, last_synced_version
from etl_spark.lake import LakeTable, MergeStats

__all__ = ["create_aggregate_table", "sync_aggregate"]

SRC_VERSION_COL = "_src_version"


def create_aggregate_table(
    spark: SparkSession,
    path: str,
    src: LakeTable,
    group_cols: list[str],
    sum_names: list[str],
    n_buckets: int = 16,
    count_col: str = "n_rows",
    prefix: str = "aggsync",
    props: dict | None = None,
) -> LakeTable:
    """Create the rollup destination for :func:`sync_aggregate`: keyed by
    ``group_cols`` (types copied from the upstream schema), versioned by
    the upstream snapshot version, carrying ``count_col`` plus one BIGINT
    column per ``sum_names`` entry, with ``prefix`` pre-declared as a
    monotone cursor so sync metadata stays bounded."""
    src_fields = {f.name: f for f in src.current_snapshot().schema.fields}
    missing = [c for c in group_cols if c not in src_fields]
    if missing:
        raise ValueError(f"group columns {missing} not in upstream schema")
    fields = [StructField(c, src_fields[c].dataType, True) for c in group_cols]
    fields.append(StructField(count_col, LongType(), True))
    fields.extend(StructField(s, LongType(), True) for s in sum_names)
    fields.append(StructField(SRC_VERSION_COL, LongType(), True))
    merged_props = dict(props or {})
    pfx = merged_props.get("cursor_prefixes", "")
    merged_props["cursor_prefixes"] = f"{pfx},{prefix}" if pfx else prefix
    return LakeTable.create(
        spark, path, StructType(fields), key_cols=list(group_cols),
        version_cols=[SRC_VERSION_COL], n_buckets=n_buckets,
        props=merged_props,
    )


def _contrib(
    rows: DataFrame,
    group_cols: list[str],
    sum_exprs: dict[str, Column],
    count_col: str,
    sign: int,
) -> DataFrame:
    """Signed per-row contribution: ±1 toward the group's count and
    ±measure toward each sum. Casting AFTER the sign keeps ANSI mode happy
    for any integral-valued expression."""
    return rows.select(
        *group_cols,
        F.lit(sign).cast("long").alias(count_col),
        *[
            (F.lit(sign) * expr.cast("long")).alias(name)
            for name, expr in sum_exprs.items()
        ],
    )


def _changed_buckets(table: LakeTable, keys: DataFrame, version: int) -> list[int]:
    """Distinct bucket ids of a key set under ``version``'s layout — the
    control-plane collect is ≤ n_buckets ints (layouts may differ across
    versions after a rebucket, so each snapshot hashes for itself)."""
    snap = table.snapshot(version)
    return sorted(
        r["__b"]
        for r in keys.select(table.bucket_expr(snap).alias("__b"))
        .distinct().collect()
    )


def sync_aggregate(
    src: LakeTable,
    dst: LakeTable,
    group_cols: list[str],
    sum_exprs: dict[str, Column] | None = None,
    prefix: str = "aggsync",
    count_col: str = "n_rows",
    end_version: int | None = None,
    full_refresh: bool = False,
) -> MergeStats | None:
    """One incremental aggregate-maintenance round; returns the merge stats
    or ``None`` when the destination is already caught up.

    ``sum_exprs`` maps destination column name → integral-valued Column
    over upstream rows (e.g. ``F.round(F.col("v") * 100).cast("bigint")``
    for cent-exact money). See the module docstring for the protocol and
    why measures must be fixed-point."""
    sum_exprs = dict(sum_exprs or {})
    if prefix not in dst.current_snapshot().cursor_prefixes():
        raise ValueError(
            f"destination does not declare {prefix!r} a cursor prefix: "
            f"create it via create_aggregate_table (or with "
            f"props={{'cursor_prefixes': {prefix!r}}}) so sync cursor "
            f"metadata stays bounded"
        )
    recorded = last_synced_version(dst, prefix)
    end = src.current_version() if end_version is None else end_version
    _guard_upstream(src, recorded, end)

    def totals(rows: DataFrame) -> DataFrame:
        return _contrib(rows, group_cols, sum_exprs, count_col, 1).groupBy(
            *group_cols
        ).agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(n).alias(n) for n in sum_exprs],
        )

    if recorded is None or full_refresh:
        if recorded is not None and end <= recorded:
            raise RuntimeError(
                f"full_refresh at v{end} would be a manifest no-op: the "
                f"destination already recorded sync through v{recorded}. "
                f"To pick up new data call sync_aggregate without "
                f"full_refresh; for divergence repair, recreate the "
                f"destination and bootstrap fresh"
            )
        fresh = totals(src.read(version=end))
        rows = fresh.withColumn(SRC_VERSION_COL, F.lit(end).cast("long"))
        # a refresh must also retract groups that vanished upstream: the
        # destination's live group set minus the recomputed one
        stale = (
            dst.read().select(*group_cols)
            .join(fresh.select(*group_cols), group_cols, "left_anti")
            .select(
                *group_cols,
                F.lit(None).cast("long").alias(count_col),
                *[F.lit(None).cast("long").alias(n) for n in sum_exprs],
                F.lit(end).cast("long").alias(SRC_VERSION_COL),
            )
        ) if recorded is not None else None
        batch = rows.withColumn("op", F.lit("U"))
        if stale is not None:
            batch = batch.unionByName(stale.withColumn("op", F.lit("D")))
        return dst.merge(batch, manifest_key=f"{prefix}:{end}")

    if end <= recorded:
        return None
    if recorded not in set(src.versions()):
        raise RuntimeError(
            f"aggregate-sync cursor v{recorded} fell past the upstream "
            f"snapshot-retention horizon (oldest kept: "
            f"v{min(src.versions())}); re-bootstrap with "
            f"sync_aggregate(..., full_refresh=True)"
        )

    src_keys = src.current_snapshot().key_cols
    keys = src.changes(recorded, end).select(*src_keys).distinct()
    old = src.read(
        version=recorded, buckets=_changed_buckets(src, keys, recorded)
    ).join(keys, src_keys, "left_semi")
    new = src.read(
        version=end, buckets=_changed_buckets(src, keys, end)
    ).join(keys, src_keys, "left_semi")
    delta = (
        _contrib(new, group_cols, sum_exprs, count_col, 1)
        .unionByName(_contrib(old, group_cols, sum_exprs, count_col, -1))
        .groupBy(*group_cols)
        .agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(n).alias(n) for n in sum_exprs],
        )
    )
    # drop all-zero deltas (keys rewritten without net effect — e.g. a
    # late LWW loser delivered): nothing to write for those groups
    nonzero = F.col(count_col) != 0
    for n in sum_exprs:
        nonzero = nonzero | (F.col(n) != 0)
    delta = delta.filter(nonzero)

    cur = dst.read(
        buckets=_changed_buckets(dst, delta.select(*group_cols),
                                 dst.current_version())
    ).join(delta.select(*group_cols), group_cols, "left_semi")

    mcols = [count_col, *sum_exprs]
    joined = delta.alias("d").join(cur.alias("c"), group_cols, "left")
    # A negative maintained count means the protocol was violated (rounds
    # skipped, destination edited out-of-band): corrupt silently nowhere —
    # assert_true is evaluated because it feeds the published column.
    new_n = F.col(f"d.{count_col}") + F.coalesce(F.col(f"c.{count_col}"),
                                                 F.lit(0))
    guarded_n = new_n + F.coalesce(
        F.assert_true(
            new_n >= 0,
            "sync_aggregate: maintained count went negative — destination "
            "diverged from upstream (out-of-band edits or skipped rounds); "
            "re-bootstrap with full_refresh=True",
        ).cast("long"),
        F.lit(0),
    )
    out = joined.select(
        *group_cols,
        guarded_n.alias(count_col),
        *[
            (F.col(f"d.{n}") + F.coalesce(F.col(f"c.{n}"), F.lit(0))).alias(n)
            for n in sum_exprs
        ],
        F.lit(end).cast("long").alias(SRC_VERSION_COL),
        F.when(new_n == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    # groups emptied out are tombstoned with nulled measures (merge nulls
    # tombstone payloads anyway; doing it here keeps the plan explicit)
    out = out.select(
        *group_cols,
        *[
            F.when(F.col("op") == "D", F.lit(None).cast("long"))
            .otherwise(F.col(c)).alias(c)
            for c in mcols
        ],
        SRC_VERSION_COL, "op",
    )
    return dst.merge(out, manifest_key=f"{prefix}:{end}")
