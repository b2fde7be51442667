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

__all__ = ["broadcast_lookup", "range_join", "asof_join", "anti_join_fill",
           "period_lead"]


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

    Scale shape: the (small, versioned) dim is pre-collapsed to ONE row per
    key holding its versions as a time-sorted array, broadcast, and the
    as-of winner resolved per fact row with a pure array expression — the
    fact side is never shuffled, aggregated or windowed, so the plan is a
    single BroadcastHashJoin + projection regardless of fact skew or fact
    width. (The earlier formulation grouped on every fact column to argmax
    the joined candidates — correct, but a wide-row shuffle of the whole
    fact table at 100 TB.) Per-row cost is a linear scan of the key's
    version array; versioned dims are small by nature (the reference's rule
    table is dozens of rows per indicator).
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    fact_cols = fact.columns
    dim_payload = [c for c in dim.columns if c not in dim_keys]
    # dim_time leads the struct so array_sort orders versions by time
    # (remaining payload fields only break exact-time ties, deterministically).
    ver_struct = F.struct(
        F.col(dim_time).alias(dim_time),
        *[F.col(c).alias(c) for c in dim_payload if c != dim_time],
    )
    # dim keys renamed so a dim derived from the fact itself (or sharing
    # key names, the common case) never creates ambiguous references
    packed = (
        dim.groupBy(*[F.col(c) for c in dim_keys])
        .agg(F.array_sort(F.collect_list(ver_struct)).alias("__vers"))
        .select(
            *[F.col(dk).alias(f"__dk{i}") for i, dk in enumerate(dim_keys)],
            "__vers",
        )
    )
    on = [F.col(fk) == F.col(f"__dk{i}") for i, fk in enumerate(fact_keys)]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    joined = fact.join(F.broadcast(packed), cond, "left")
    eligible = F.filter(
        F.col("__vers"), lambda v: v[dim_time] <= F.col(fact_time)
    )
    # last eligible version = the as-of winner; NULL when none (or no key)
    winner = F.try_element_at(eligible, F.lit(-1))
    return joined.select(
        *[F.col(c) for c in fact_cols],
        *[winner[c].alias(c) for c in dim_payload],
    )


def period_lead(
    dim: DataFrame,
    period_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Next-period lookup over a period calendar dim: appends
    ``out_col`` = the following period per calendar order (NULL for the
    last one). Reference: ``obter_proximo_periodo`` resolves the period
    whose start follows the current period's end
    (comum/datas.py:94-128) — over a gapless calendar that is exactly the
    ordered successor, a ``lead`` window.

    The window is unpartitioned BY DESIGN: a period calendar is a
    control-plane dim (hundreds of rows — the reference caches 60 in an
    lru_cache), so the single-task sort is trivial; the enriched dim is
    then broadcast against facts. Never point this at a fact table."""
    out_col = out_col or f"next_{period_col}"
    w = Window.orderBy(F.col(period_col))
    return dim.withColumn(out_col, F.lead(period_col).over(w))


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
