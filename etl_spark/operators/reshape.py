"""Reshape operators: unpivot/melt, group-and-nest, parameter fan-out
(SURVEY.md §2.6).

Reference: pandas ``melt`` of wide SISAB report columns
(/root/reference/src/impulsoetl/sisab/producao.py:1016-1045), the
group-collect of weekday→hours pairs into a JSON column
(scnes/estabelecimentos_horarios/tratamento.py:41-70), and the
``itertools.product`` request fan-out
(sisab/utilitarios_sisab_relatorio_producao.py:133-158).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["melt", "group_nest_sorted", "param_fanout"]


def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long unpivot (pandas.melt semantics incl. NULL value rows kept).

    Uses Spark's native ``unpivot`` (a generator expression — one pass, no
    shuffle, stays in whole-stage codegen). Value columns are cast to a
    common type by Spark; pass homogeneous ``value_vars`` for exact typing.
    """
    if value_vars is None:
        value_vars = [c for c in df.columns if c not in id_vars]
    return df.unpivot(
        [F.col(c) for c in id_vars],
        [F.col(c) for c in value_vars],
        var_name,
        value_name,
    )


def group_nest_sorted(
    df: DataFrame,
    group_cols: list[str],
    pair_cols: tuple[str, str],
    out_col: str = "nested",
    pair_sep: str = ":",
    list_sep: str = ";",
) -> DataFrame:
    """Per group, collect (k, v) pairs into one deterministic sorted string
    (the reference serializes weekday→hours dicts to JSON per establishment;
    we emit a canonical sorted "k:v;k:v" string so distributed collection
    order cannot leak into the output — collect_list is otherwise
    nondeterministic)."""
    k, v = pair_cols
    pair = F.concat_ws(pair_sep, F.col(k).cast("string"), F.col(v).cast("string"))
    return (
        df.groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(pair)).alias("__pairs"))
        .select(*group_cols, F.array_join("__pairs", list_sep).alias(out_col))
    )


def param_fanout(spark: SparkSession, **axes: list) -> DataFrame:
    """Cartesian product of small parameter axes as a DataFrame — the
    driver-side request fan-out (competências × faixas etárias × filtros).
    Each axis is tiny; the product is a chain of broadcast cross joins."""
    dfs = [
        spark.createDataFrame([(x,) for x in values], f"{name} {_sql_type(values)}")
        for name, values in axes.items()
    ]
    return reduce(lambda a, b: a.crossJoin(F.broadcast(b)), dfs)


def _sql_type(values: list) -> str:
    x = values[0]
    if isinstance(x, bool):
        return "boolean"
    if isinstance(x, int):
        return "bigint"
    if isinstance(x, float):
        return "double"
    return "string"
