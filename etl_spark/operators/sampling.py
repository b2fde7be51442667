"""Deterministic hash-based sampling and split assignment.

A 100 TB training-data pipeline never uses ``df.sample`` (RNG-based, not
replay-stable, not resumable): membership must be a pure function of the
row key so that re-running a capture after a crash — or re-deriving a
downstream table months later — selects byte-identical rows (the same
reason the engine replaces the reference's per-row ``uuid7().hex``,
/root/reference/src/impulsoetl/siasus/procedimentos.py:387-389, with
content-derived keys). Everything here is built on
:func:`etl_spark.functions.hashing.portable_hash60`, so every sample is
bit-reproducible in the DuckDB oracle as well.

All three operators are per-row projections — no shuffle, no UDF, fully
inside whole-stage codegen — so they cost one scan at any scale. The
per-stratum rates compile into a literal ``when`` chain (bounded label
domains like language or source; no join at all), the scalable analogue
of the reference's hand-rolled per-UF work splitting
(utilitarios/repetidores.py:23-87).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark.functions.hashing import portable_hash60, portable_hash60_sql

__all__ = ["hash_permille", "hash_permille_sql", "hash_sample", "hash_split",
           "mix_rates_permille", "mix_sample", "stratified_sample"]


def hash_permille(key: Column | str, salt: str) -> Column:
    """Uniform pseudo-random draw in [0, 1000) as a pure function of
    (salt, key). Distinct salts give independent draws, so a sample and a
    train/val/test split over the same key column do not correlate."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        portable_hash60(F.concat(F.lit(salt + "|"), c.cast("string"))),
        F.lit(1000),
    )


def hash_permille_sql(key_expr: str, salt: str) -> str:
    """DuckDB SQL computing the same draw as :func:`hash_permille`."""
    lit = salt.replace("'", "''")
    e = f"concat('{lit}|', CAST({key_expr} AS VARCHAR))"
    return f"({portable_hash60_sql(e)} % 1000)"


def hash_sample(df: DataFrame, key: str, rate_permille: int,
                salt: str = "sample") -> DataFrame:
    """Keep ~rate_permille/1000 of rows, deterministically by key."""
    return df.filter(hash_permille(key, salt) < F.lit(rate_permille))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    rates_permille: dict[str, int],
    default_permille: int = 1000,
    salt: str = "strat",
) -> DataFrame:
    """Class-balanced downsampling: per-stratum keep rates (e.g. cut the
    dominant language to 25% while keeping the tail at 100% when curating
    a pretraining mix). Rows whose stratum is absent from the map (or is
    NULL) use ``default_permille``."""
    thresh: Column = F.lit(default_permille)
    for label, rate in sorted(rates_permille.items()):
        thresh = F.when(F.col(strata) == F.lit(label), F.lit(rate)).otherwise(thresh)
    return df.filter(hash_permille(key, salt) < thresh)


def hash_split(
    df: DataFrame,
    key: str,
    splits: list[tuple[str, int]],
    out_col: str = "split",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative permille
    ranges (e.g. ``[("train", 800), ("val", 100), ("test", 100)]``).
    Weights must sum to 1000 so the assignment is total."""
    total = sum(w for _, w in splits)
    if total != 1000:
        raise ValueError(f"split weights must sum to 1000, got {total}")
    bad = [(n, w) for n, w in splits if w <= 0]
    if bad:
        raise ValueError(f"split weights must be positive, got {bad}")
    draw = hash_permille(key, salt)
    expr: Column | None = None
    hi = 0
    for name, weight in splits[:-1]:
        hi += weight
        cond = draw < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(splits[-1][0])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, assigned)


def mix_rates_permille(
    counts: dict[str, int], shares: dict[str, float],
) -> dict[str, int]:
    """Per-group keep rates (permille) that rebalance observed group
    ``counts`` toward target mix ``shares`` without upsampling: the
    binding group (smallest ``count/share``) keeps everything; every
    other group downsamples to match. Pure float arithmetic in a fixed
    expression shape (``1000.0 * share * t / count``, left-associative)
    so the DuckDB oracle reproduces the rates bit-for-bit."""
    import math

    missing = [g for g in shares if g not in counts]
    if missing:
        raise ValueError(f"shares reference absent groups: {missing}")
    t = min(counts[g] / s for g, s in shares.items() if s > 0)
    return {
        g: min(1000, math.floor(1000.0 * s * t / counts[g]))
        for g, s in shares.items() if s > 0
    }


def mix_sample(
    df: DataFrame,
    key: str,
    group_col: str,
    shares: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Training-mix rebalancing: deterministically downsample each group
    so the expected output follows the target ``shares`` distribution
    (e.g. rebalance a language- or domain-skewed crawl before packing a
    pretraining mix). Groups absent from ``shares`` are dropped.

    Group counts are a control-plane aggregate (one combinable count per
    group, collected — #groups is mix-config-sized); membership is then
    a pure per-row filter ``hash_permille(key) < rate[group]`` — zero
    additional shuffles, replay-stable, and exact in the DuckDB oracle
    (:func:`mix_rates_permille` + :func:`hash_permille_sql`)."""
    counts = {
        r[group_col]: r["n"]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[group_col] in shares
    }
    rates = mix_rates_permille(counts, shares)
    return stratified_sample(
        df, key, group_col, rates, default_permille=0, salt=salt,
    )
