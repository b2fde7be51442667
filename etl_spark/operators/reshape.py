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

__all__ = ["chunk_documents", "melt", "group_nest_sorted", "param_fanout",
           "pack_budget"]


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


def pack_budget(
    df: DataFrame,
    key: str,
    size_col: str,
    budget: int,
    n_buckets: int,
) -> DataFrame:
    """Deterministic sequence packing: assign documents to fixed-budget
    shards (e.g. ~budget tokens of training data per shard file).

    Rows are hashed into ``n_buckets`` independent streams
    (engine-portable ``stable_bucket``), ordered by key within each, and
    cut greedily: a row joins shard ``floor(cum_size_before / budget)``
    of its bucket. The guarantee is CUMULATIVE: shards ``0..s`` together
    hold ≥ ``(s+1) * budget`` for every non-final shard ``s`` — an
    individual shard can undershoot when its predecessor overshot past a
    boundary (one oversized row can span several budgets), and the
    bucket's last shard may be short. This is the standard
    streaming-packing contract (see ``test_pack_budget_contract``).

    ``key`` must be unique (a doc id / content key): it is the only sort
    column inside a bucket, so duplicate key values would make the
    cumulative cut — and therefore ``pack_shard`` — nondeterministic
    across runs. Pack by a content-derived key, never by a grouping
    column like ``repo``.

    Scale shape: ONE shuffle into ``n_buckets`` sort partitions; there
    is no global order, so packing 100 TB is embarrassingly parallel
    across buckets — size ``n_buckets`` so a bucket's rows fit an
    executor's spill budget. Output adds ``pack_bucket``/``pack_shard``.
    """
    from pyspark.sql import Window

    from etl_spark.functions.hashing import stable_bucket

    out = df.withColumn("pack_bucket", stable_bucket(n_buckets, key))
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return out.withColumn(
        "pack_shard", F.floor(cum_before / F.lit(budget)).cast("long")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window token chunking — the sequence-prep step between
    curation and training/RAG indexing (the wide→long reshape for text:
    one row per chunk). Chunk i covers tokens ``[1 + i*step, … + size)``
    with ``step = size - overlap``; the last chunk may be shorter; docs
    with no tokens emit no chunks. A trailing window whose content is
    wholly contained in the previous chunk is NOT emitted (starts stop
    at ``n - overlap``), so no pure-duplicate chunk rows enter a
    training shard or index.

    Output: ``(id_col, chunk_id, n_tokens, chunk_text)``.

    Pure per-row expression work — no shuffle, embarrassingly parallel.
    The token array is materialized ONCE through a generator stage and
    the window slices reference that attribute: a bare alias would be
    inlined into the per-chunk lambda and re-tokenize the document per
    chunk (the ``element_at``-in-lambda quadratic trap)."""
    from etl_spark.functions.text import tokens

    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    step = size - overlap
    tok_col = "__ck_toks"
    while tok_col in df.columns:
        tok_col += "_"
    # only the id rides through the generator — packing the whole row
    # would defeat column pruning at the scan
    packed = df.select(
        F.inline(
            F.array(
                F.struct(
                    F.col(id_col).alias(id_col),
                    tokens(text_col).alias(tok_col),
                )
            )
        )
    )
    ts = F.col(tok_col)
    n = F.size(ts)
    # last useful start is n - overlap: a later window only re-covers the
    # previous chunk's tail (its whole content would be a duplicate)
    starts = F.when(
        n >= 1,
        F.sequence(F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)),
                   F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))

    def _chunk(start, i):
        return F.struct(
            i.cast("long").alias("chunk_id"),
            F.least(F.lit(size), n - start + 1).cast("long").alias("n_tokens"),
            F.array_join(F.slice(ts, start, size), " ").alias("chunk_text"),
        )

    return packed.select(
        F.col(id_col),
        F.explode(F.transform(starts, _chunk)).alias("__c"),
    ).select(
        id_col,
        F.col("__c.chunk_id").alias("chunk_id"),
        F.col("__c.n_tokens").alias("n_tokens"),
        F.col("__c.chunk_text").alias("chunk_text"),
    )
