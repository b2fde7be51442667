"""Storage-partitioned join (lake/spj.cobucket_join): two co-bucketed
LakeTables joined with ZERO shuffle — one task per bucket reads both
sides' bucket files where they lie, resolves merge-on-read LWW, drops
tombstones, and Acero-joins. Semantics gate: every result must equal
the engine's own ``read().join(read())`` (whose read paths are
oracle-verified); plan gate: no Exchange anywhere, task count ==
n_buckets."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable, cobucket_join

LSCHEMA = ("event_id bigint, op_ts timestamp, repo string, path string, "
           "content string, size bigint")
RSCHEMA = ("event_id bigint, op_ts timestamp, repo string, path string, "
           "lang string, stars bigint")
T0 = dt.datetime(2024, 1, 1)


def _mk(spark, root, name, schema, props=None):
    base = {"compact_threshold": "100"}
    base.update(props or {})
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(schema),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=8, props=base,
    )


def _lrows(i, op="I"):
    return (i, T0 + dt.timedelta(hours=i), f"r{i % 7}", f"p{i % 13}",
            f"c{i}", i * 3, op)


def _rrows(i, op="I"):
    return (i, T0 + dt.timedelta(hours=i), f"r{i % 7}", f"p{i % 13}",
            f"l{i % 4}", i * 5, op)


def _seed(spark, left, right, n=40):
    left.merge(spark.createDataFrame([_lrows(i) for i in range(n)],
                                     LSCHEMA + ", op string"), "l:0")
    right.merge(spark.createDataFrame([_rrows(i) for i in range(0, n, 2)],
                                      RSCHEMA + ", op string"), "r:0")


def _expected(left, right, how="inner", lw=None, rw=None):
    l = left.read(where=lw)
    r = right.read(where=rw).withColumnsRenamed(
        {"event_id": "event_id_r", "op_ts": "op_ts_r"})
    return l.join(r, on=["repo", "path"], how=how)


def _sorted(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_inner_join_matches_engine_join(spark, tmp_root):
    left = _mk(spark, tmp_root, "l", LSCHEMA)
    right = _mk(spark, tmp_root, "r", RSCHEMA)
    _seed(spark, left, right)
    got = cobucket_join(left, right)
    cols = ["repo", "path", "event_id", "content", "size",
            "event_id_r", "lang", "stars"]
    assert set(got.columns) == {"event_id", "op_ts", "repo", "path",
                                "content", "size", "event_id_r",
                                "op_ts_r", "lang", "stars"}
    assert _sorted(got, cols) == _sorted(_expected(left, right), cols)


def test_left_join_fills_null_right(spark, tmp_root):
    left = _mk(spark, tmp_root, "l", LSCHEMA)
    right = _mk(spark, tmp_root, "r", RSCHEMA)
    _seed(spark, left, right)
    got = cobucket_join(left, right, how="left")
    cols = ["repo", "path", "event_id", "size", "event_id_r", "lang",
            "stars"]
    assert _sorted(got, cols) == \
        _sorted(_expected(left, right, how="left"), cols)
    assert got.filter(F.col("stars").isNull()).count() > 0


def test_zero_exchange_and_bucket_task_count(spark, tmp_root):
    left = _mk(spark, tmp_root, "l", LSCHEMA)
    right = _mk(spark, tmp_root, "r", RSCHEMA)
    _seed(spark, left, right)
    got = cobucket_join(left, right)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # the whole point
    assert got.rdd.getNumPartitions() == 8  # task i <-> bucket i


def test_mor_lww_and_tombstones_resolve_per_side(spark, tmp_root):
    left = _mk(spark, tmp_root, "l", LSCHEMA)
    right = _mk(spark, tmp_root, "r", RSCHEMA)
    _seed(spark, left, right)
    # second wave: updates + deletes land as un-compacted deltas (MoR)
    left.merge(spark.createDataFrame(
        [(100 + i, T0 + dt.timedelta(days=2, hours=i), f"r{i % 7}",
          f"p{i % 13}", f"c{i}v2", i * 7, "D" if i % 5 == 0 else "U")
         for i in range(0, 40, 3)], LSCHEMA + ", op string"), "l:1")
    right.merge(spark.createDataFrame(
        [(200 + i, T0 + dt.timedelta(days=3, hours=i), f"r{i % 7}",
          f"p{i % 13}", "rust", i * 11, "D" if i % 7 == 0 else "U")
         for i in range(0, 40, 4)], RSCHEMA + ", op string"), "r:1")
    assert any(len(fl) > 1
               for fl in left.current_snapshot().buckets.values())
    got = cobucket_join(left, right)
    cols = ["repo", "path", "event_id", "content", "size",
            "event_id_r", "lang", "stars"]
    assert _sorted(got, cols) == _sorted(_expected(left, right), cols)


def test_predicates_prune_files_and_filter_winners(spark, tmp_root):
    left = _mk(spark, tmp_root, "l", LSCHEMA,
               props={"compact_threshold": "100", "stats_cols": "size"})
    right = _mk(spark, tmp_root, "r", RSCHEMA)
    _seed(spark, left, right)
    lw = [("size", ">=", 30), ("repo", "in", ["r1", "r2", "r3"])]
    rw = [("stars", "<", 150)]
    got = cobucket_join(left, right, where_left=lw, where_right=rw)
    cols = ["repo", "path", "event_id", "size", "event_id_r", "stars"]
    assert _sorted(got, cols) == \
        _sorted(_expected(left, right, lw=lw, rw=rw), cols)
    # and the bucket subset surface composes
    sub = cobucket_join(left, right, buckets=[0, 1, 2])
    full = cobucket_join(left, right)
    assert 0 < sub.count() < full.count()


def test_join_across_rename_boundary(spark, tmp_root):
    left = _mk(spark, tmp_root, "l", LSCHEMA)
    right = _mk(spark, tmp_root, "r", RSCHEMA)
    _seed(spark, left, right)
    right.alter_rename_column("stars", "stargazers")
    got = cobucket_join(left, right)
    exp = _expected(left, right).withColumnRenamed("stars", "stargazers")
    cols = ["repo", "path", "event_id", "stargazers"]
    assert "stargazers" in got.columns
    assert _sorted(got, cols) == _sorted(exp, cols)


def test_time_travel_join(spark, tmp_root):
    left = _mk(spark, tmp_root, "l", LSCHEMA)
    right = _mk(spark, tmp_root, "r", RSCHEMA)
    _seed(spark, left, right)
    v_l, v_r = left.current_version(), right.current_version()
    left.merge(spark.createDataFrame(
        [(999, T0 + dt.timedelta(days=9), "r1", "p1", "late", 1, "U")],
        LSCHEMA + ", op string"), "l:late")
    got = cobucket_join(left, right, version=v_l, right_version=v_r)
    assert got.filter(F.col("content") == "late").count() == 0


def test_refusals(spark, tmp_root):
    left = _mk(spark, tmp_root, "l", LSCHEMA)
    _seed_one = spark.createDataFrame([_lrows(1)], LSCHEMA + ", op string")
    left.merge(_seed_one, "l:0")
    other = LakeTable.create(
        spark, os.path.join(tmp_root, "nb"), StructType.fromDDL(RSCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=3)  # 3 and 8 share no common modulus (4 would: SPJ
        # now joins compatible multiple-of layouts at the coarser one)
    with pytest.raises(ValueError, match="not co-bucketed"):
        cobucket_join(left, other)
    typed = LakeTable.create(
        spark, os.path.join(tmp_root, "ty"),
        StructType.fromDDL("event_id bigint, op_ts timestamp, repo string,"
                           " path int, lang string"),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=8)
    with pytest.raises(ValueError, match="type-sensitive"):
        cobucket_join(left, typed)
    patch = LakeTable.create(
        spark, os.path.join(tmp_root, "pa"), StructType.fromDDL(RSCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=8, props={"update_semantics": "patch"})
    with pytest.raises(ValueError, match="row update semantics"):
        cobucket_join(left, patch)
    with pytest.raises(ValueError, match="how"):
        cobucket_join(left, left, how="outer")


def test_compatible_multiple_of_layouts(spark, tmp_root):
    """A 16-bucket left joins an 8-bucket right with zero shuffle: task
    per COARSE bucket, fine children folded in (disjoint key spaces)."""
    left = LakeTable.create(
        spark, os.path.join(tmp_root, "l16"), StructType.fromDDL(LSCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=16, props={"compact_threshold": "100"},
    )
    right = _mk(spark, tmp_root, "r8", RSCHEMA)
    _seed(spark, left, right)
    # extra MoR generation on the fine side so folded children carry
    # both clean and delta files
    left.merge(spark.createDataFrame(
        [_lrows(i + 100) for i in range(10)], LSCHEMA + ", op string"),
        "l:1")
    cols = ["repo", "path", "event_id", "content", "size",
            "event_id_r", "lang", "stars"]
    got = cobucket_join(left, right)
    assert _sorted(got, cols) == _sorted(_expected(left, right), cols)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert got.rdd.getNumPartitions() == 8  # the coarser layout
    # left join + coarse-space bucket subset compose
    got_l = cobucket_join(left, right, how="left", buckets=[0, 3, 5])
    want = _expected(left, right, how="left").withColumn(
        "__b", F.pmod(F.xxhash64("repo", "path"), F.lit(8)).cast("int")
    ).filter(F.col("__b").isin([0, 3, 5])).drop("__b")
    assert _sorted(got_l, cols) == _sorted(want, cols)
    # arbitrary counts still refuse
    odd = LakeTable.create(
        spark, os.path.join(tmp_root, "r6"), StructType.fromDDL(RSCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=6,
    )
    with pytest.raises(ValueError, match="common modulus"):
        cobucket_join(left, odd)


def test_rescale_does_not_strand_spj_partners(spark, tmp_root):
    """The story the feature exists for: an SPJ pair keeps working after
    ONE side rescales 2x (refusing only while the rescale is in
    flight)."""
    left = _mk(spark, tmp_root, "lg", LSCHEMA)
    right = _mk(spark, tmp_root, "rg", RSCHEMA)
    _seed(spark, left, right)
    cols = ["repo", "path", "event_id", "size", "event_id_r", "stars"]
    before = _sorted(cobucket_join(left, right), cols)
    left.start_rescale(16)
    with pytest.raises(ValueError, match="mid-rescale"):
        cobucket_join(left, right)
    while left.rescale_status():
        left.rescale_step(max_buckets=99)
    after = cobucket_join(left, right)
    assert _sorted(after, cols) == before
    assert after.rdd.getNumPartitions() == 8
