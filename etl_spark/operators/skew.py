"""Skew-handling utilities (SURVEY.md §4 item 2).

The reference splits work per UF/municipality by hand
(/root/reference/src/impulsoetl/utilitarios/repetidores.py:23-87); at
10^10-event scale the equivalents are:

- **full-key bucketing** (the LakeTable layout — a hot repo spreads over
  every bucket; see etl_spark/lake/table.py);
- **salted two-phase aggregation** for hot *grouping* keys: partial
  aggregate on (key, salt), final aggregate on key — the hot key's work
  fans out over ``n_salts`` tasks, then one tiny combine;
- **salted repartition** for hot *write/partition* keys;
- AQE skew-join splitting (enabled in etl_spark.session) for the join side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_repartition", "salted_agg"]

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int, deterministic_by: str | None = None) -> DataFrame:
    """Append a salt column in [0, n_salts). Deterministic when derived
    from a unique column (replay-stable); otherwise row-random."""
    if deterministic_by is not None:
        salt = F.pmod(F.xxhash64(F.col(deterministic_by)), F.lit(n_salts))
    else:
        salt = (F.rand() * n_salts).cast("int")
    return df.withColumn(SALT_COL, salt.cast("int"))


def salted_repartition(
    df: DataFrame, n_partitions: int, keys: list[str], n_salts: int = 16,
    deterministic_by: str | None = None,
) -> DataFrame:
    """Repartition on (keys..., salt) so one hot key spreads over
    ``n_salts`` partitions instead of serializing into one task
    (SURVEY §4: ``repartition(N, repo, pmod(hash(path), SALT))``)."""
    salted = with_salt(df, n_salts, deterministic_by)
    return salted.repartition(n_partitions, *[F.col(k) for k in keys], F.col(SALT_COL)).drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    deterministic_by: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output column -> (op, input)
    with op in {sum, count, min, max}. Result is identical to a plain
    ``groupBy(keys).agg(...)``; the shape survives a 1000x hot key.

    (Spark's own partial aggregation covers this for combinable aggs; the
    explicit form matters when a custom/UDAF stage or a downstream
    repartition pins the hot key to one task.)
    """
    phase1, phase2 = [], []
    for out, (op, col) in aggs.items():
        if op == "count":
            phase1.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            phase2.append(F.sum(f"__p_{out}").alias(out))
        elif op == "sum":
            phase1.append(F.sum(col).alias(f"__p_{out}"))
            phase2.append(F.sum(f"__p_{out}").alias(out))
        elif op == "min":
            phase1.append(F.min(col).alias(f"__p_{out}"))
            phase2.append(F.min(f"__p_{out}").alias(out))
        elif op == "max":
            phase1.append(F.max(col).alias(f"__p_{out}"))
            phase2.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported salted agg op: {op}")
    salted = with_salt(df, n_salts, deterministic_by)
    partial = salted.groupBy(*keys, SALT_COL).agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)
