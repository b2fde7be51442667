"""Dimension-enrichment joins (SURVEY.md §2.4).

The reference executes every join as memoized per-value point SELECTs against
Postgres (``lru_cache``'d lookups, /root/reference/src/impulsoetl/comum/
geografias.py:57-143, datas.py:65-128) — i.e. a hand-rolled broadcast hash
join with the dim cached driver-side. Here each becomes one declarative join
Catalyst can reorder/prune, with the small side broadcast explicitly so the
plan holds at 100 TB fact scale (no shuffle of the fact table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["broadcast_lookup", "range_join", "asof_join", "anti_join_fill"]


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Equi-join a fact table to a small dimension, dimension broadcast
    (geografias.py lookup equivalent: no fact shuffle, dim shipped to every
    executor once)."""
    return fact.join(F.broadcast(dim), on, how)


def range_join(
    fact: DataFrame,
    dim: DataFrame,
    value: Column,
    lo: Column,
    hi: Column,
    how: str = "left",
) -> DataFrame:
    """Interval lookup ``lo <= value <= hi`` against a *small* dim
    (periodo_por_data, datas.py:65-92). Broadcasting the dim turns the range
    join into a broadcast nested-loop with a cheap predicate — the only sane
    physical plan when the dim is tiny and the fact is 100 TB."""
    return fact.join(F.broadcast(dim), (value >= lo) & (value <= hi), how)


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: list[str],
    dim_keys: list[str],
    fact_time: str,
    dim_time: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each fact row, the dim row with the greatest
    ``dim_time <= fact_time`` per key (reference: indicator-rule versioning,
    sisab/indicadores_municipios/tratamento.py:61-85).

    Implementation: broadcast the (small, versioned) dim, equi+range join,
    then keep the per-fact-row winner with ``max_by`` — a map-side-combinable
    hash aggregate, NOT a row_number window, so a hot key never serializes
    into one task.
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    fact_cols = fact.columns
    dim_payload = [c for c in dim.columns if c not in dim_keys]
    f_ = fact.alias("f")
    d_ = dim.alias("d")
    cond = F.lit(True)
    for fk, dk in zip(fact_keys, dim_keys):
        cond = cond & (F.col(f"f.{fk}") == F.col(f"d.{dk}"))
    cond = cond & (F.col(f"d.{dim_time}") <= F.col(f"f.{fact_time}"))
    joined = f_.join(F.broadcast(d_), cond, "left")
    # One winner per fact row: argmax over dim_time. Group on a deterministic
    # fact-row identity (all fact columns) — callers pass key-complete facts.
    winner = F.max_by(
        F.struct(*[F.col(f"d.{c}").alias(c) for c in dim_payload]),
        F.col(f"d.{dim_time}"),
    ).alias("__d")
    out = joined.groupBy(*[F.col(f"f.{c}").alias(c) for c in fact_cols]).agg(winner)
    return out.select(*fact_cols, *[F.col(f"__d.{c}").alias(c) for c in dim_payload])


def anti_join_fill(
    keys: DataFrame,
    detail: DataFrame,
    on: list[str],
    fill: dict[str, Column] | None = None,
) -> DataFrame:
    """Keys with no detail record become placeholder rows (all-NULL payload
    unless ``fill`` overrides), unioned with the real detail rows — the
    reference's empty-record fill for entities whose detail fetch failed
    (scnes/estabelecimentos_identificados/extracao.py:56-80,136-145)."""
    payload = [c for c in detail.columns if c not in on]
    missing = keys.join(detail.select(*on), on, "left_anti")
    placeholders = missing.select(
        *on,
        *[
            (fill or {}).get(c, F.lit(None)).cast(dict(detail.dtypes)[c]).alias(c)
            for c in payload
        ],
    )
    return detail.unionByName(placeholders)
