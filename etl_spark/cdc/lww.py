"""Last-writer-wins dedup — the engine's core window semantics.

The reference handles late/revised data by re-capturing revised
"competências" and preferring FINAIS over PRELIM files
(/root/reference/src/impulsoetl/sinan/violencia.py:444-463); our engine
generalizes that to per-key LWW ordered by ``(op_ts, event_id)``.

Implementation note (scale): the obvious formulation is
``row_number() OVER (PARTITION BY key ORDER BY version DESC) = 1``, but a
window forces a full shuffle + per-partition sort and a hot key (one repo
holding 30% of a batch) serializes into one task. We instead use
``groupBy(key).agg(max_by(payload_struct, version_struct))`` which Spark
executes as a hash aggregate with **partial (map-side) aggregation** — each
input partition pre-reduces its local winner per key, so a hot key costs one
combine per upstream partition instead of one giant sorted partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lww_dedup", "lww_latest_window"]


def lww_dedup(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
) -> DataFrame:
    """One row per key: the one with the greatest ``version_cols`` tuple.

    Column order of the result matches ``df``. Duplicate deliveries of the
    same event (same version tuple) collapse to one row.
    """
    payload = [c for c in df.columns if c not in key_cols]
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in version_cols]),
    ).alias("__w")
    out = df.groupBy(*[F.col(c) for c in key_cols]).agg(winner)
    return out.select(
        *[F.col(c) if c in key_cols else F.col(f"__w.{c}").alias(c) for c in df.columns]
    )


def lww_latest_window(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
) -> DataFrame:
    """Window-based formulation (kept for parity tests vs ``lww_dedup``)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in version_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
