"""ADD COLUMN with an initial DEFAULT (LakeTable.alter_add_column):
metadata-only commit; rows in pre-alter files read the default, rows in
post-alter files read their physical value (NULL included) — Iceberg
initial-default semantics. Exercises read, LWW across the alter
boundary, rewrite materialization, rename/drop interplay, fastagg
exactness, change feed, and the SPJ kernel."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable, cobucket_join, fast_min_max

DDL = "k bigint, op_ts long, event_id long, body string"


def _mk(spark, tmp_root, name, props=None, n_buckets=4):
    return LakeTable.create(
        spark, os.path.join(tmp_root, name), StructType.fromDDL(DDL),
        key_cols=["k"], version_cols=["op_ts", "event_id"],
        n_buckets=n_buckets,
        props={"compact_threshold": "100", **(props or {})},
    )


def _wave(spark, lo, hi, ts, extra_ddl="", rows_extra=None):
    rows = [(k, ts, k, f"b{k}")
            + tuple(rows_extra(k) if rows_extra else ())
            + ("I",)
            for k in range(lo, hi)]
    return spark.createDataFrame(rows, DDL + extra_ddl + ", op string")


def test_initial_default_read_and_lww_boundary(spark, tmp_root):
    t = _mk(spark, tmp_root, "basic")
    t.merge(_wave(spark, 0, 30, 10), "m:0")
    t.alter_add_column("tier", "string", default="bronze")
    # post-alter wave: keys 20..40 — overlap 20..29 UPDATES old keys
    t.merge(_wave(spark, 20, 40, 20, ", tier string",
                  lambda k: (f"t{k}" if k % 2 == 0 else None,)), "m:1")
    rows = {r["k"]: r["tier"] for r in t.read().collect()}
    assert len(rows) == 40
    for k in range(0, 20):
        assert rows[k] == "bronze"          # pre-alter file -> default
    for k in range(20, 40):
        # post-alter winner: physical value, NULL included — a NULL
        # written AFTER the alter is NOT re-defaulted
        assert rows[k] == (f"t{k}" if k % 2 == 0 else None)


def test_add_without_default_reads_null(spark, tmp_root):
    t = _mk(spark, tmp_root, "nodef")
    t.merge(_wave(spark, 0, 5, 10), "m:0")
    t.alter_add_column("note", "string")
    assert {r["note"] for r in t.read().collect()} == {None}


def test_refusals(spark, tmp_root):
    t = _mk(spark, tmp_root, "refuse")
    t.merge(_wave(spark, 0, 5, 10), "m:0")
    with pytest.raises(ValueError, match="already exists"):
        t.alter_add_column("body", "string")
    with pytest.raises(ValueError, match="does not cast"):
        t.alter_add_column("n", "bigint", default="not-a-number")
    t.alter_add_column("tmp", "string", default="x")
    t.alter_drop_column("tmp")
    with pytest.raises(ValueError, match="tombstoned"):
        t.alter_add_column("tmp", "string")


def test_rewrite_materializes_default(spark, tmp_root):
    import pyarrow.parquet as pq

    t = _mk(spark, tmp_root, "mat")
    t.merge(_wave(spark, 0, 20, 10), "m:0")
    t.alter_add_column("tier", "string", default="bronze")
    before = {r["k"]: r["tier"] for r in t.read().collect()}
    t.rebucket(4)  # full rewrite: compact() skips clean 1-file buckets
    snap = t.current_snapshot()
    for fl in snap.buckets.values():
        for f in fl:
            sch = pq.ParquetFile(os.path.join(t.path, f)).schema_arrow
            assert "tier" in sch.names  # bytes now physical
    assert {r["k"]: r["tier"] for r in t.read().collect()} == before


def test_rename_and_drop_follow_the_default(spark, tmp_root):
    t = _mk(spark, tmp_root, "rn")
    t.merge(_wave(spark, 0, 10, 10), "m:0")
    t.alter_add_column("tier", "string", default="bronze")
    t.alter_rename_column("tier", "grade")
    assert {r["grade"] for r in t.read().collect()} == {"bronze"}
    t.alter_drop_column("grade")
    assert t.current_snapshot().default_map() == {}


def test_fast_min_max_sees_defaults_and_renames(spark, tmp_root):
    t = _mk(spark, tmp_root, "agg")
    t.merge(_wave(spark, 0, 20, 10), "m:0")
    t.compact()
    t.alter_add_column("score", "bigint", default=7)
    # post-alter values 100..109 land beside pre-alter defaulted rows
    t.merge(_wave(spark, 100, 110, 20, ", score bigint",
                  lambda k: (k,)), "m:1")
    t.compact()
    (mm, breakdown) = fast_min_max(t, ["score"])
    assert mm["score"] == (7, 109), (mm, breakdown)
    # renamed column: old physical name must still contribute extremes
    t2 = _mk(spark, tmp_root, "agg2")
    t2.merge(_wave(spark, 0, 20, 10), "m:0")
    t2.compact()
    t2.alter_rename_column("body", "text")
    (mm2, _) = fast_min_max(t2, ["text"])
    assert mm2["text"] == ("b0", "b9")


def test_change_feed_carries_defaults(spark, tmp_root):
    t = _mk(spark, tmp_root, "feed")
    t.merge(_wave(spark, 0, 6, 10), "m:0")
    v0 = t.current_version()
    t.alter_add_column("tier", "string", default="bronze")
    t.merge(_wave(spark, 6, 8, 20, ", tier string",
                  lambda k: (f"t{k}",)), "m:1")
    feed = {r["k"]: r["tier"] for r in t.changes(0).collect()}
    assert all(feed[k] == "bronze" for k in range(0, 6))
    assert feed[6] == "t6" and feed[7] == "t7"
    assert v0 >= 1


def test_spj_kernel_applies_defaults(spark, tmp_root):
    l = _mk(spark, tmp_root, "jl")
    r = _mk(spark, tmp_root, "jr")
    l.merge(_wave(spark, 0, 20, 10), "m:0")
    r.merge(_wave(spark, 0, 20, 10), "m:0")
    l.alter_add_column("tier", "string", default="bronze")
    l.merge(_wave(spark, 10, 15, 20, ", tier string",
                  lambda k: (f"t{k}",)), "m:1")
    got = {r_["k"]: r_["tier"]
           for r_ in cobucket_join(l, r).select("k", "tier").collect()}
    assert len(got) == 20
    for k in range(0, 10):
        assert got[k] == "bronze"
    for k in range(10, 15):
        assert got[k] == f"t{k}"
    for k in range(15, 20):
        assert got[k] == "bronze"


def test_non_json_default_refused_typed(spark, tmp_root):
    import datetime as dt

    t = _mk(spark, tmp_root, "nonjson")
    t.merge(_wave(spark, 0, 3, 10), "m:0")
    with pytest.raises(ValueError, match="JSON-storable"):
        t.alter_add_column("since", "date", default=dt.date(2020, 1, 1))
    # the portable string form works and reads back as a date
    t.alter_add_column("since", "date", default="2020-01-01")
    got = {str(r["since"]) for r in t.read().collect()}
    assert got == {"2020-01-01"}
