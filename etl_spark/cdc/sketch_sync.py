"""Mergeable-sketch aggregate maintenance: approx lifetime distincts.

The third tier of incremental rollup maintenance, beside the exact
signed-delta tier (:func:`etl_spark.cdc.agg_sync.sync_aggregate`) and
the recompute tier (:func:`~etl_spark.cdc.agg_sync.sync_aggregate_recompute`):

===================  =======================  ==========================
tier                 cost per round           supports
===================  =======================  ==========================
sync_aggregate       O(changed keys)          COUNT / integral SUM
sync_aggregate_      O(rows of affected       any aggregate, exactly
  recompute            groups)
sync_aggregate_      O(changed keys)          APPROX DISTINCT-EVER via
  sketch                                        HLL (this module)
===================  =======================  ==========================

``COUNT(DISTINCT …)`` is the one common rollup the exact tier can never
maintain in O(changed keys): distinct counts are not subtractable, so
exactness forces the recompute tier's O(group rows). The standard
web-scale answer (Druid/Pinot/BigQuery rollups alike) is a **mergeable
HyperLogLog sketch per group**: each round folds only the changed keys'
values into the stored sketch — one union, no history re-read — at a
documented ~1-2 % relative error (Spark's Apache DataSketches HLL,
``lgConfigK`` dial).

Semantics are **distinct-ever** (lifetime cardinality), stated loudly:
an HLL cannot retract, so a deleted key's values stay counted and a
group never tombstones. That IS the wanted meaning for append-mostly
telemetry ("distinct users ever seen per day/segment"); for
current-state distinct counts use the recompute tier. The reference's
QA matrices compute the same distinct-per-slice shapes, recomputed
wholesale per capture (sisab/relatorio_validacao_producao/
verificacao.py:15-44) — this is that check made maintainable at 100 TB.

Crash story: identical to the other tiers — the batch's sketches merge
under manifest key ``{prefix}:{end}`` with the cursor advanced in the
same atomic commit; a replayed round re-unions the same values into the
same registers (HLL union is idempotent), so even the at-least-once
window is harmless here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from etl_spark.cdc.agg_sync import (
    SRC_VERSION_COL,
    _changed_buckets,
    _nullsafe_on,
    _round_preamble,
    _with_cursor_prefix,
)
from etl_spark.lake import LakeTable, MergeStats

__all__ = ["create_sketch_table", "sync_aggregate_sketch"]


def _sketch_col(name: str) -> str:
    return f"{name}_sketch"


def create_sketch_table(
    spark: SparkSession,
    path: str,
    group_fields: list[StructField],
    distinct_names: list[str],
    n_buckets: int = 32,
    prefix: str = "sketchsync",
    props: dict[str, str] | None = None,
) -> LakeTable:
    """Destination for :func:`sync_aggregate_sketch`: per distinct name
    an HLL register blob (``{name}_sketch`` BINARY) plus its readable
    estimate (``{name}`` BIGINT), keyed by the group columns and
    versioned by the source snapshot the row was maintained at."""
    fields = list(group_fields)
    for n in distinct_names:
        fields.append(StructField(_sketch_col(n), BinaryType(), True))
        fields.append(StructField(n, LongType(), True))
    fields.append(StructField(SRC_VERSION_COL, LongType(), True))
    return LakeTable.create(
        spark, path, StructType(fields),
        key_cols=[f.name for f in group_fields],
        version_cols=[SRC_VERSION_COL],
        n_buckets=n_buckets,
        props=_with_cursor_prefix(props, prefix),
    )


def sync_aggregate_sketch(
    src: LakeTable,
    dst: LakeTable,
    group_cols: list[str],
    distinct_exprs: dict[str, Column],
    prefix: str = "sketchsync",
    lg_k: int = 12,
    end_version: int | None = None,
    full_refresh: bool = False,
) -> MergeStats | None:
    """One sketch-maintenance round; returns merge stats or ``None`` when
    already caught up.

    ``distinct_exprs`` maps destination name → the upstream Column whose
    distinct-ever cardinality the group tracks (NULLs never count).
    ``lg_k`` sizes every sketch (``2^lg_k`` registers; 12 ≈ 1.6 % rse,
    ~2.5 KiB dense) — fixed per destination so stored and batch sketches
    always union losslessly."""
    distinct_exprs = dict(distinct_exprs)
    if not distinct_exprs:
        raise ValueError("distinct_exprs must name at least one column")
    names = list(distinct_exprs)
    recorded, end = _round_preamble(src, dst, prefix, end_version)

    def sketches(rows: DataFrame) -> DataFrame:
        return rows.groupBy(*group_cols).agg(
            *[
                F.hll_sketch_agg(expr, F.lit(lg_k))
                .alias(_sketch_col(n))
                for n, expr in distinct_exprs.items()
            ]
        )

    if recorded is None or full_refresh:
        from etl_spark.cdc.agg_sync import _check_refresh_useful, \
            _publish_refresh

        _check_refresh_useful(recorded, end)
        fresh = sketches(src.read(version=end)).select(
            *group_cols,
            *[c for n in names for c in (
                F.col(_sketch_col(n)).alias(_sketch_col(n)),
                F.hll_sketch_estimate(_sketch_col(n)).alias(n),
            )],
        )
        return _publish_refresh(
            dst, fresh, group_cols,
            [c for n in names for c in (_sketch_col(n), n)],
            end, prefix, retract=recorded is not None,
        )

    if end <= recorded:
        return None
    from etl_spark.cdc.agg_sync import _check_horizon

    _check_horizon(src, recorded)
    src_keys = src.current_snapshot().key_cols
    keys = (src.changes(recorded, end).select(*src_keys).distinct()
            .localCheckpoint(eager=True))
    # distinct-ever: only the changed keys' CURRENT rows fold in — prior
    # values were folded when they were current, deletions never retract
    new = src.read(
        version=end, buckets=_changed_buckets(src, keys, end)
    ).join(keys, src_keys, "left_semi")
    batch = sketches(new)

    cur = dst.read(
        buckets=_changed_buckets(dst, batch.select(*group_cols),
                                 dst.current_version())
    ).alias("c").join(
        batch.select(*group_cols).alias("g"),
        _nullsafe_on("c", "g", group_cols), "left_semi",
    )
    joined = batch.alias("d").join(
        cur.alias("c"), _nullsafe_on("d", "c", group_cols), "left"
    )

    def unioned(n: str) -> Column:
        d, c = F.col(f"d.{_sketch_col(n)}"), F.col(f"c.{_sketch_col(n)}")
        # hll_union returns NULL if either side is NULL — guard both:
        # a brand-new group has no stored sketch; a group whose changed
        # rows were all deletes/NULLs has no batch sketch
        return (
            F.when(c.isNull(), d)
            .when(d.isNull(), c)
            .otherwise(F.hll_union(d, c))
        )

    out = joined.select(
        *[F.col(f"d.{g}").alias(g) for g in group_cols],
        *[c for n in names for c in (
            unioned(n).alias(_sketch_col(n)),
            F.hll_sketch_estimate(unioned(n)).alias(n),
        )],
        F.lit(end).cast("long").alias(SRC_VERSION_COL),
        F.lit("U").alias("op"),
    )
    return dst.merge(out, manifest_key=f"{prefix}:{end}")
