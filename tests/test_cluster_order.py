"""Clustered background rewrites (`cluster_cols` prop → _sort_order).

Pins: compaction and rebucket write each bucket file ordered by the
cluster column (so pushed range predicates prune parquet row groups
inside the file), key order stays the default without the prop, results
are order-independent, and unknown cluster columns fail loudly.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.lake import LakeTable

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("ts", LongType()),
    StructField("body", StringType()),
])


def _mk(spark, root, name, props=None):
    t = LakeTable.create(
        spark, os.path.join(root, name), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=4, props=props,
    )
    rows = [("I", k, 1, (k * 37) % 100, f"b{k}") for k in range(60)]
    kind = "op string, k bigint, v bigint, ts bigint, body string"
    # two deltas per bucket => compaction actually rewrites
    t.merge(spark.createDataFrame(rows[:30], kind), manifest_key="seed0")
    t.merge(spark.createDataFrame(rows[30:], kind), manifest_key="seed1")
    assert t.compact() > 0
    return t


def _file_col(table, col):
    """Per compacted file: the column's values in file order."""
    snap = table.current_snapshot()
    out = {}
    for b, files in snap.buckets.items():
        for f in files:
            out[f] = pq.read_table(
                os.path.join(table.path, f), columns=[col]
            )[col].to_pylist()
    return out


def test_cluster_prop_orders_files_by_value_column(spark, tmp_root):
    t = _mk(spark, tmp_root, "clustered", props={"cluster_cols": "ts"})
    per_file = _file_col(t, "ts")
    assert per_file, "expected compacted files"
    for f, vals in per_file.items():
        assert vals == sorted(vals), f"{f} not ts-ordered"
    # rebucket keeps the clustering
    t.rebucket(2)
    for f, vals in _file_col(t, "ts").items():
        assert vals == sorted(vals), f"{f} not ts-ordered after rebucket"


def test_default_order_is_key_sorted_and_results_identical(spark, tmp_root):
    plain = _mk(spark, tmp_root, "plain")
    for f, vals in _file_col(plain, "k").items():
        assert vals == sorted(vals), f"{f} not key-ordered"
    clustered = _mk(spark, tmp_root, "clustered2",
                    props={"cluster_cols": "ts"})
    a = {tuple(r) for r in plain.read().collect()}
    b = {tuple(r) for r in clustered.read().collect()}
    assert a == b


def test_unknown_cluster_col_fails_loudly(spark, tmp_root):
    t = _mk(spark, tmp_root, "bad")
    t.alter_props({"cluster_cols": "nope"})
    t.merge(spark.createDataFrame([("I", 1, 2, 5, "x")],
                                  "op string, k bigint, v bigint, "
                                  "ts bigint, body string"),
            manifest_key="more")
    with pytest.raises(ValueError, match="cluster_cols"):
        t.compact()
