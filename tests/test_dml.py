"""Predicate DML (lake/dml.py): DELETE WHERE / UPDATE SET WHERE as
versioned, feed-visible, exactly-once change batches.

Pins: predicate targeting, LWW outranking (late lower-versioned events
still lose to the edit), change-feed visibility, dry-run pricing,
re-run idempotence, and the stamp/SET guard rails.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.lake import LakeTable
from etl_spark.lake.dml import delete_where, update_where

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("grp", StringType()),
    StructField("amt", LongType()),
])
ROWS = "op string, k bigint, v bigint, grp string, amt bigint"


def _mk(spark, root):
    t = LakeTable.create(
        spark, os.path.join(root, "t"), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=4,
    )
    rows = [("I", k, 1, "a" if k % 2 else "b", k * 10) for k in range(20)]
    t.merge(spark.createDataFrame(rows, ROWS), manifest_key="seed")
    return t


def test_delete_where_is_versioned_and_feed_visible(spark, tmp_root):
    t = _mk(spark, tmp_root)
    v0 = t.current_version()
    n, st = delete_where(t, [("grp", "=", "a"), ("amt", ">", 100)],
                         {"v": 5}, manifest_key="dml:1")
    assert n == 5 and st.applied  # odd k with k*10 > 100: 11,13,15,17,19
    left = {r["k"] for r in t.read().collect()}
    assert left == {k for k in range(20) if not (k % 2 and k * 10 > 100)}
    # feed carries the delete as ordinary D rows
    feed = t.changes(v0, t.current_version())
    assert {r["_op"] for r in feed.collect()} == {"D"}
    # a LATE event older than the edit still loses
    t.merge(spark.createDataFrame([("U", 13, 3, "a", 999)], ROWS),
            manifest_key="late")
    assert 13 not in {r["k"] for r in t.read().collect()}
    # re-run of the same manifest key: metadata no-op
    n2, st2 = delete_where(t, [("grp", "=", "a")], {"v": 6},
                           manifest_key="dml:1")
    assert not st2.applied


def test_update_where_rewrites_only_matches(spark, tmp_root):
    t = _mk(spark, tmp_root)
    n, st = update_where(
        t, [("grp", "=", "b")],
        {"amt": F.col("amt") * 2, "grp": F.concat(F.col("grp"), F.lit("!"))},
        {"v": 5}, manifest_key="dml:u1",
    )
    assert n == 10 and st.applied
    got = {r["k"]: (r["grp"], r["amt"]) for r in t.read().collect()}
    for k in range(20):
        if k % 2:
            assert got[k] == ("a", k * 10)          # untouched
        else:
            assert got[k] == ("b!", k * 20)         # rewritten
    # late lower-versioned update of a rewritten row loses
    t.merge(spark.createDataFrame([("U", 2, 3, "b", 7)], ROWS),
            manifest_key="late")
    assert {r["amt"] for r in t.read().filter(F.col("k") == 2).collect()} \
        == {40}


def test_dry_run_and_guards(spark, tmp_root):
    t = _mk(spark, tmp_root)
    n, st = delete_where(t, [("grp", "=", "a")], {"v": 5},
                         manifest_key="x", dry_run=True)
    assert n == 10 and st is None
    assert t.read().count() == 20  # nothing committed
    with pytest.raises(ValueError, match="does not outrank"):
        delete_where(t, [("grp", "=", "a")], {"v": 1}, manifest_key="x")
    with pytest.raises(ValueError, match="version stamp must cover"):
        delete_where(t, [("grp", "=", "a")], {"nope": 9}, manifest_key="x")
    with pytest.raises(ValueError, match="key/version"):
        update_where(t, [("grp", "=", "a")], {"k": F.lit(0)}, {"v": 5},
                     manifest_key="x")
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(t, [("grp", "=", "a")], {"zzz": F.lit(0)}, {"v": 5},
                     manifest_key="x")
