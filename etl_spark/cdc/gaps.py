"""Wire sequence-gap auditing: find dropped LSN/offset windows.

A CDC wire carries a dense per-partition sequence (Kafka offsets,
Postgres LSNs, binlog positions). When a connector silently drops a
window — the drift :mod:`etl_spark.cdc.reconcile` exists to repair —
the cheapest detector is the sequence itself: any missing run between
the observed min and max is data that never arrived. The reference's
posture is the same audit-then-recapture loop (re-run the slice,
/root/reference/src/impulsoetl/scripts/geral.py:36-116); here the
"slice" is located from the wire metadata alone, before anyone compares
payloads.

Scale shape: a naive `lag()` over the whole partition is one global
sort per source partition — a straggler at 100 TB. Instead:

1. dedup `(part, seq)` (one combinable shuffle — re-deliveries are
   normal and are reported separately by :func:`sequence_gap_stats`),
2. coarse-bucket the sequence space (``seq div bucket_span``) and run
   the `lag()` window only WITHIN ``(part, bucket)`` — every window
   partition is bounded by ``bucket_span`` regardless of stream size,
3. find cross-bucket gaps on the per-bucket ``(min, max)`` SUMMARY —
   thousands of rows per partition, not billions — with a second tiny
   window.

Both windows shuffle the same deduped rows once; nothing is ever
globally sorted and no driver-side state exists, so the audit runs as
one linear job at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sequence_gap_stats", "sequence_gaps"]

_PART = "__gap_part"


def _with_part(df: DataFrame, part_cols: list[str] | None):
    # one logical partition when the wire has a single global sequence
    if part_cols:
        return df, part_cols
    return df.withColumn(_PART, F.lit("all")), [_PART]


def sequence_gaps(
    df: DataFrame,
    seq_col: str,
    part_cols: list[str] | None = None,
    *,
    step: int = 1,
    bucket_span: int = 1 << 20,
) -> DataFrame:
    """Missing-run intervals per source partition.

    Returns one row per maximal missing run strictly inside the observed
    ``[min, max]`` of each partition: ``part_cols + (gap_lo, gap_hi,
    missing)`` where ``gap_lo``/``gap_hi`` are the first/last missing
    sequence values and ``missing`` counts them (``step`` > 1 for
    strided sequences). Head/tail truncation is invisible to any
    sequence audit — pair with :func:`sequence_gap_stats` high-water
    marks against the source's published positions for that.
    """
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    if bucket_span < 2 * step:
        raise ValueError("bucket_span must cover at least two steps")
    df, parts = _with_part(df, part_cols)
    seq = F.col(seq_col).cast("long")
    d = (
        df.select(*parts, seq.alias("__seq"))
        .where(F.col("__seq").isNotNull())
        .distinct()
        .withColumn("__bk", F.floor(F.col("__seq") / F.lit(bucket_span)))
    )
    in_bk = Window.partitionBy(*parts, "__bk").orderBy("__seq")
    # intra-bucket runs: bounded window partitions (<= bucket_span rows)
    intra = (
        d.withColumn("__prev", F.lag("__seq").over(in_bk))
        .where(F.col("__seq") - F.col("__prev") > F.lit(step))
        .select(
            *parts,
            (F.col("__prev") + F.lit(step)).alias("gap_lo"),
            (F.col("__seq") - F.lit(step)).alias("gap_hi"),
        )
    )
    # cross-bucket runs: lag over the per-bucket summary (tiny). Empty
    # buckets between two occupied ones collapse into one reported run.
    summary = d.groupBy(*parts, "__bk").agg(
        F.min("__seq").alias("__mn"), F.max("__seq").alias("__mx")
    )
    across = Window.partitionBy(*parts).orderBy("__bk")
    inter = (
        summary.withColumn("__pmx", F.lag("__mx").over(across))
        .where(F.col("__mn") - F.col("__pmx") > F.lit(step))
        .select(
            *parts,
            (F.col("__pmx") + F.lit(step)).alias("gap_lo"),
            (F.col("__mn") - F.lit(step)).alias("gap_hi"),
        )
    )
    out_parts = part_cols or []
    return (
        intra.unionByName(inter)
        .withColumn(
            "missing",
            ((F.col("gap_hi") - F.col("gap_lo")) / F.lit(step) + 1)
            .cast("long"),
        )
        .select(*out_parts, "gap_lo", "gap_hi", "missing")
    )


def sequence_gap_stats(
    df: DataFrame,
    seq_col: str,
    part_cols: list[str] | None = None,
    *,
    step: int = 1,
) -> DataFrame:
    """Per-partition wire health in one pass: ``seq_lo, seq_hi,
    observed`` (distinct sequences), ``expected`` (dense span),
    ``missing`` (expected − observed — the reconcile trigger) and
    ``redelivered`` (total − distinct — at-least-once noise, not loss).
    Two combinable shuffles, no window, no sort."""
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    df, parts = _with_part(df, part_cols)
    seq = F.col(seq_col).cast("long")
    per_seq = (
        df.select(*parts, seq.alias("__seq"))
        .where(F.col("__seq").isNotNull())
        .groupBy(*parts, "__seq")
        .agg(F.count("*").alias("__n"))
    )
    out_parts = part_cols or []
    expected = (
        F.floor((F.col("seq_hi") - F.col("seq_lo")) / F.lit(step))
        + F.lit(1)
    ).cast("long")
    return (
        per_seq.groupBy(*parts)
        .agg(
            F.min("__seq").alias("seq_lo"),
            F.max("__seq").alias("seq_hi"),
            F.count("*").alias("observed"),
            (F.sum("__n") - F.count("*")).alias("redelivered"),
        )
        .withColumn("expected", expected)
        .withColumn("missing", F.col("expected") - F.col("observed"))
        .select(*out_parts, "seq_lo", "seq_hi", "expected", "observed",
                "missing", "redelivered")
    )
