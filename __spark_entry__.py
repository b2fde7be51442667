"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC replay (events-as-WAL → LakeTable MERGE →
final state) at sf0.001; ``queries``/``oracle_sql`` expose every implemented
operator from SURVEY.md §2 with DuckDB oracles (see etl_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_spark.queries import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same keys as queries())."""
    from etl_spark.queries import ORACLES

    return dict(ORACLES)
