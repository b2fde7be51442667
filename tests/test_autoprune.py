"""Automatic bucket pruning for full-key predicates
(LakeTable._auto_bucket_subset): read(where=<every key column pinned>)
— and therefore predicate DML on a key — touches O(matched buckets),
not O(table). Zone maps cannot refute hash-distributed key values, so
without this the targeted-correction shape scanned every bucket."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable, delete_where

DDL = "repo string, path string, op_ts long, event_id long, body string"


def _mk(spark, tmp_root, name, n_buckets=16):
    t = LakeTable.create(
        spark, os.path.join(tmp_root, name), StructType.fromDDL(DDL),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=n_buckets, props={"stats_cols": "op_ts"},
    )
    rows = [(f"r{i % 11}", f"p{i}", 10 + i, i, f"b{i}", "I")
            for i in range(400)]
    t.merge(spark.createDataFrame(rows, DDL + ", op string"), "m:0")
    t.compact()
    return t


def test_full_key_equality_prunes_buckets(spark, tmp_root):
    t = _mk(spark, tmp_root, "eq")
    total = t.scan_counts()["files_total"]
    assert total >= 8
    c = t.scan_counts(where=[("repo", "=", "r3"), ("path", "=", "p3")])
    assert c["files_read"] <= 1 and c["files_total"] == total
    rows = t.read(where=[("repo", "=", "r3"), ("path", "=", "p3")]).collect()
    assert [(r["repo"], r["path"], r["body"]) for r in rows] == \
        [("r3", "p3", "b3")]


def test_in_lists_cartesian_and_cap(spark, tmp_root):
    t = _mk(spark, tmp_root, "inl")
    total = t.scan_counts()["files_total"]
    where = [("repo", "in", ["r1", "r4"]), ("path", "in", ["p1", "p4"])]
    c = t.scan_counts(where=where)
    assert c["files_read"] <= 4 < total
    got = {(r["repo"], r["path"]) for r in t.read(where=where).collect()}
    assert got == {("r1", "p1"), ("r4", "p4")}  # cartesian is a SUPERSET
    # above the 256-candidate cap: no pruning, still correct
    big = [("repo", "in", [f"r{i}" for i in range(20)]),
           ("path", "in", [f"p{i}" for i in range(20)])]
    assert t.scan_counts(where=big)["files_read"] == total
    assert t.read(where=big).count() == 20  # p_i pairs with r_{i%11}


def test_partial_key_does_not_prune_buckets(spark, tmp_root):
    t = _mk(spark, tmp_root, "partial")
    total = t.scan_counts()["files_total"]
    # only one of two key columns pinned -> every bucket may hold matches
    assert t.scan_counts(where=[("repo", "=", "r3")])["files_read"] == total
    assert t.read(where=[("repo", "=", "r3")]).count() == \
        t.read().filter(F.col("repo") == "r3").count()


def test_composite_tuple_predicate_prunes(spark, tmp_root):
    t = _mk(spark, tmp_root, "tup")
    total = t.scan_counts()["files_total"]
    pairs = [("r1", "p1"), ("r7", "p7")]
    c = t.scan_counts(where=[(("repo", "path"), "in", pairs)])
    assert c["files_read"] <= 2 < total
    got = {(r["repo"], r["path"]) for r in
           t.read(where=[(("repo", "path"), "in", pairs)]).collect()}
    assert got == set(pairs)


def test_dml_on_full_key_is_bucket_pruned_and_correct(spark, tmp_root):
    t = _mk(spark, tmp_root, "dml")
    total = t.scan_counts()["files_total"]
    where = [("repo", "=", "r5"), ("path", "=", "p5")]
    assert t.scan_counts(where=where)["files_read"] <= 1 < total
    n, stats = delete_where(
        t, where, version={"op_ts": 10_000, "event_id": 10_000},
        manifest_key="dml:1")
    assert n == 1 and stats.applied
    assert t.read(where=where).count() == 0
    assert t.read().count() == 399


def test_mid_rescale_pruning_follows_the_watermark(spark, tmp_root):
    t = _mk(spark, tmp_root, "mid", n_buckets=4)
    t.start_rescale(8)
    t.rescale_step(max_buckets=2)
    keys = [(r["repo"], r["path"]) for r in
            t.read().select("repo", "path").limit(12).collect()]
    for repo, path in keys:
        where = [("repo", "=", repo), ("path", "=", path)]
        c = t.scan_counts(where=where)
        assert c["files_read"] <= 1
        assert t.read(where=where).count() == 1


def test_coercible_value_types_still_read(spark, tmp_root):
    """A predicate value the strict planner typing rejects (string
    against a bigint key) must fall back to no-pruning, not crash —
    the ANSI-coerced residual filter matched it before the optimization
    existed and must keep matching."""
    from pyspark.sql.types import StructType

    t = LakeTable.create(
        spark, os.path.join(tmp_root, "coerce"),
        StructType.fromDDL("uid bigint, op_ts long, event_id long, v string"),
        key_cols=["uid"], version_cols=["op_ts", "event_id"], n_buckets=4)
    t.merge(spark.createDataFrame(
        [(i, 1, i, f"v{i}", "I") for i in range(50)],
        "uid bigint, op_ts long, event_id long, v string, op string"),
        "m:0")
    where = [("uid", "=", "42")]  # string literal against bigint key
    got = t.read(where=where).collect()
    assert [(r["uid"], r["v"]) for r in got] == [(42, "v42")]
    c = t.scan_counts(where=where)
    assert c["files_read"] == c["files_total"]  # planner declined, loudly not
