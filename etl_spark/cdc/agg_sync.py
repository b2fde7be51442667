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
as sum/count at query time). NULL measure values contribute 0 — the
maintained column is ``SUM(COALESCE(x, 0))``, so an all-NULL group holds
0 where SQL's ``SUM(x)`` would be NULL (coalesce upstream if the
distinction matters; any other choice is not incrementally maintainable
without tracking a per-measure non-NULL count). MIN/MAX are deliberately out: they are not
subtractable — maintaining them incrementally requires re-aggregating a
group when its extremum leaves, i.e. the recompute-affected-groups plan,
which this module's O(changed keys) contract refuses to hide. That plan
IS available, priced honestly, as :func:`sync_aggregate_recompute`: any
Spark aggregate (MIN/MAX/countDistinct/...), cost O(rows of affected
groups) instead of O(changed keys) — affected groups found from the
feed exactly like the delta path, then recomputed wholesale from the new
snapshot (zone-map + parquet pushdown via an IN-list when the affected
group set is small; null-safe semi-join fallback otherwise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from etl_spark.cdc.sync import _guard_upstream, last_synced_version
from etl_spark.lake import LakeTable, MergeStats

__all__ = [
    "create_aggregate_table",
    "create_rollup_table",
    "sync_aggregate",
    "sync_aggregate_recompute",
]

SRC_VERSION_COL = "_src_version"


def _nullsafe_on(left: str, right: str, cols: list[str]) -> Column:
    """Join condition matching GROUP BY semantics: SQL groups NULLs
    together, but a plain equi-join drops them — every join that aligns
    rollup rows by group value must use ``<=>``. Spark still plans these
    as hash joins (EqualNullSafe is a supported equi-join key)."""
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
    return cond


def _with_cursor_prefix(props: dict | None, prefix: str) -> dict:
    merged = dict(props or {})
    pfx = merged.get("cursor_prefixes", "")
    merged["cursor_prefixes"] = f"{pfx},{prefix}" if pfx else prefix
    return merged


def _publish_refresh(
    dst: LakeTable,
    fresh: DataFrame,
    group_cols: list[str],
    measure_names: list[str],
    end: int,
    prefix: str,
    retract: bool,
) -> MergeStats:
    """Publish a full recomputation: upsert every fresh group and (when the
    destination already holds state) retract groups that vanished upstream.
    The anti join is null-safe — a NULL group value is an ordinary GROUP BY
    group, and a plain anti join would double-publish it as both 'U' and
    'D' under the same version."""
    types = {f.name: f.dataType for f in dst.current_snapshot().schema.fields}
    batch = (
        fresh.withColumn(SRC_VERSION_COL, F.lit(end).cast("long"))
        .withColumn("op", F.lit("U"))
    )
    if retract:
        stale = (
            dst.read().select(*group_cols).alias("c")
            .join(fresh.select(*group_cols).alias("f"),
                  _nullsafe_on("c", "f", group_cols), "left_anti")
            .select(
                *[F.col(f"c.{c}").alias(c) for c in group_cols],
                *[F.lit(None).cast(types[n]).alias(n) for n in measure_names],
                F.lit(end).cast("long").alias(SRC_VERSION_COL),
                F.lit("D").alias("op"),
            )
        )
        batch = batch.unionByName(stale)
    return dst.merge(batch, manifest_key=f"{prefix}:{end}")


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
    return LakeTable.create(
        spark, path, StructType(fields), key_cols=list(group_cols),
        version_cols=[SRC_VERSION_COL], n_buckets=n_buckets,
        props=_with_cursor_prefix(props, prefix),
    )


def create_rollup_table(
    spark: SparkSession,
    path: str,
    src: LakeTable,
    group_cols: list[str],
    agg_exprs: dict[str, Column],
    n_buckets: int = 16,
    prefix: str = "aggsync",
    props: dict | None = None,
) -> LakeTable:
    """Destination for :func:`sync_aggregate_recompute`: measure names and
    types are inferred by PLANNING (never running) the caller's aggregate
    over an empty slice of the upstream — Catalyst resolves the output
    types, so any aggregate expression yields a matching destination
    schema. Keyed by ``group_cols``, versioned by the upstream snapshot
    version, with ``prefix`` pre-declared as a monotone cursor."""
    src_fields = [f.name for f in src.current_snapshot().schema.fields]
    missing = [c for c in group_cols if c not in src_fields]
    if missing:
        raise ValueError(f"group columns {missing} not in upstream schema")
    probe = (
        src.read().limit(0).groupBy(*group_cols)
        .agg(*[expr.alias(n) for n, expr in agg_exprs.items()])
    )
    fields = [StructField(f.name, f.dataType, True) for f in probe.schema.fields]
    fields.append(StructField(SRC_VERSION_COL, LongType(), True))
    return LakeTable.create(
        spark, path, StructType(fields), key_cols=list(group_cols),
        version_cols=[SRC_VERSION_COL], n_buckets=n_buckets,
        props=_with_cursor_prefix(props, prefix),
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
    for any integral-valued expression.

    NULL measures contribute 0 (coalesced HERE so bootstrap and delta
    paths share one definition): the maintained sum is
    ``SUM(COALESCE(x, 0))``, which equals SQL's ``SUM(x)`` whenever a
    group has ≥1 non-NULL value and is 0 (not NULL) for an all-NULL
    group. Without the coalesce, a delta round whose changed rows all
    carry NULL measures would sum to NULL and ``d + coalesce(c, 0)``
    would publish NULL — silently wiping the group's maintained sum."""
    return rows.select(
        *group_cols,
        F.lit(sign).cast("long").alias(count_col),
        *[
            (F.lit(sign) * F.coalesce(expr.cast("long"), F.lit(0)))
            .alias(name)
            for name, expr in sum_exprs.items()
        ],
    )


def _round_preamble(
    src: LakeTable, dst: LakeTable, prefix: str, end_version: int | None
) -> tuple[int | None, int]:
    """Shared per-round setup: the destination must pre-declare the cursor
    prefix (bounded metadata), then the cursor and sync end are resolved
    and sanity-checked against upstream resets/rollbacks."""
    if prefix not in dst.current_snapshot().cursor_prefixes():
        raise ValueError(
            f"destination does not declare {prefix!r} a cursor prefix: "
            f"create it via create_aggregate_table / create_rollup_table "
            f"(or with props={{'cursor_prefixes': {prefix!r}}}) so sync "
            f"cursor metadata stays bounded"
        )
    recorded = last_synced_version(dst, prefix)
    end = src.current_version() if end_version is None else end_version
    _guard_upstream(src, recorded, end)
    return recorded, end


def _check_refresh_useful(recorded: int | None, end: int) -> None:
    if recorded is not None and end <= recorded:
        raise RuntimeError(
            f"full_refresh at v{end} would be a manifest no-op: the "
            f"destination already recorded sync through v{recorded}. "
            f"To pick up new data sync without full_refresh; for "
            f"divergence repair, recreate the destination and bootstrap "
            f"fresh"
        )


def _check_horizon(src: LakeTable, recorded: int) -> None:
    if recorded not in set(src.versions()):
        raise RuntimeError(
            f"aggregate-sync cursor v{recorded} fell past the upstream "
            f"snapshot-retention horizon (oldest kept: "
            f"v{min(src.versions())}); re-bootstrap with full_refresh=True"
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
    recorded, end = _round_preamble(src, dst, prefix, end_version)

    def totals(rows: DataFrame) -> DataFrame:
        return _contrib(rows, group_cols, sum_exprs, count_col, 1).groupBy(
            *group_cols
        ).agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(n).alias(n) for n in sum_exprs],
        )

    if recorded is None or full_refresh:
        _check_refresh_useful(recorded, end)
        fresh = totals(src.read(version=end))
        retract = recorded is not None
        return _publish_refresh(dst, fresh, group_cols,
                                [count_col, *sum_exprs], end, prefix, retract)

    if end <= recorded:
        return None
    _check_horizon(src, recorded)

    src_keys = src.current_snapshot().key_cols
    # materialized once: reused for two bucket collects and two semi joins,
    # and must not lazily re-read feed files a concurrent vacuum could drop
    keys = (src.changes(recorded, end).select(*src_keys).distinct()
            .localCheckpoint(eager=True))
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
    ).alias("c").join(
        delta.select(*group_cols).alias("g"),
        _nullsafe_on("c", "g", group_cols), "left_semi",
    )

    mcols = [count_col, *sum_exprs]
    joined = delta.alias("d").join(
        cur.alias("c"), _nullsafe_on("d", "c", group_cols), "left"
    )
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
        *[F.col(f"d.{c}").alias(c) for c in group_cols],
        guarded_n.alias(count_col),
        *[
            (F.coalesce(F.col(f"d.{n}"), F.lit(0))
             + F.coalesce(F.col(f"c.{n}"), F.lit(0))).alias(n)
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


def sync_aggregate_recompute(
    src: LakeTable,
    dst: LakeTable,
    group_cols: list[str],
    agg_exprs: dict[str, Column],
    prefix: str = "aggsync",
    end_version: int | None = None,
    full_refresh: bool = False,
    in_list_max: int = 1000,
) -> MergeStats | None:
    """Recompute-affected-groups aggregate maintenance: supports ANY Spark
    aggregate (MIN/MAX, countDistinct, sketches, ...) because affected
    groups are re-aggregated wholesale from the new snapshot instead of
    patched with subtractable deltas. The honest price of that generality
    is O(rows of the affected groups) per round, against
    :func:`sync_aggregate`'s O(changed keys) — the same recompute tier
    incremental-view engines fall back to for MIN/MAX retractions.

    Affected-group discovery is identical to the delta path: changed keys
    from the change feed, their old and new group values via bucket-pruned
    snapshot reads. The recompute read then prunes with
    ``where=[(col, 'in', affected)]`` — zone-map file skipping plus
    parquet row-group pushdown — when there is ONE group column with
    ``<= in_list_max`` non-null affected values; otherwise a null-safe
    semi-join (strategy left to AQE — the affected-group set is
    batch-sized, not guaranteed broadcastable) bounds the aggregate's
    input (the scan itself
    reads every file, so declare the group column in ``stats_cols`` and
    keep it correlated with ingest order to get file skipping).

    ``agg_exprs`` must be the same name → aggregate-Column mapping the
    destination was created with (:func:`create_rollup_table` infers the
    measure schema from it). Groups emptied upstream are tombstoned; the
    cursor advances in the same atomic commit (manifest
    ``{prefix}:{end}``).
    """
    agg_exprs = dict(agg_exprs)
    recorded, end = _round_preamble(src, dst, prefix, end_version)
    measures = list(agg_exprs)

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(*group_cols).agg(
            *[expr.alias(n) for n, expr in agg_exprs.items()]
        )

    if recorded is None or full_refresh:
        _check_refresh_useful(recorded, end)
        return _publish_refresh(dst, rollup(src.read(version=end)),
                                group_cols, measures, end, prefix,
                                recorded is not None)
    if end <= recorded:
        return None
    _check_horizon(src, recorded)

    src_keys = src.current_snapshot().key_cols
    # materialized once: reused for two bucket collects and two semi joins,
    # and must not lazily re-read feed files a concurrent vacuum could drop
    keys = (src.changes(recorded, end).select(*src_keys).distinct()
            .localCheckpoint(eager=True))
    old = src.read(
        version=recorded, buckets=_changed_buckets(src, keys, recorded)
    ).join(keys, src_keys, "left_semi")
    new = src.read(
        version=end, buckets=_changed_buckets(src, keys, end)
    ).join(keys, src_keys, "left_semi")
    groups = (
        old.select(*group_cols).unionByName(new.select(*group_cols))
        .distinct().localCheckpoint(eager=True)
    )

    fact = None
    if groups.isEmpty():
        # feed-only churn (e.g. a replayed no-op): nothing to recompute,
        # but the cursor still advances via an empty merge below
        fact = src.read(version=end).limit(0)
    elif len(group_cols) == 1:
        vals = [r[group_cols[0]]
                for r in groups.limit(in_list_max + 1).collect()]
        if len(vals) <= in_list_max and all(v is not None for v in vals):
            fact = src.read(version=end,
                            where=[(group_cols[0], "in", vals)])
    if fact is None:
        # no broadcast hint: the affected-group set is O(changed keys) —
        # batch-sized, not guaranteed broadcastable — so AQE picks the
        # join strategy from the actual size at runtime
        fact = src.read(version=end).alias("f").join(
            groups.alias("g"),
            _nullsafe_on("f", "g", group_cols), "left_semi",
        )
    fresh = rollup(fact)
    types = {f.name: f.dataType for f in dst.current_snapshot().schema.fields}
    vanished = (
        groups.alias("g")
        .join(fresh.select(*group_cols).alias("f"),
              _nullsafe_on("g", "f", group_cols), "left_anti")
        .select(
            *[F.col(f"g.{c}").alias(c) for c in group_cols],
            *[F.lit(None).cast(types[n]).alias(n) for n in measures],
        )
    )
    batch = (
        fresh.withColumn("op", F.lit("U"))
        .unionByName(vanished.withColumn("op", F.lit("D")))
        .withColumn(SRC_VERSION_COL, F.lit(end).cast("long"))
    )
    return dst.merge(batch, manifest_key=f"{prefix}:{end}")
