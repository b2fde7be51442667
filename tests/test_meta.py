"""Metadata tables (lake/meta.py): snapshots / files / partitions /
ledger / refs / stats as DataFrames, consistent with the snapshot JSON
and the physical parquet footers they describe."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable

SCHEMA = "event_id bigint, op_ts timestamp, seq bigint, repo string, n bigint"
TS = dt.datetime(2024, 1, 1)


def _table(spark, tmp_root, **props):
    return LakeTable.create(
        spark, os.path.join(tmp_root, "t"), StructType.fromDDL(SCHEMA),
        key_cols=["repo"], version_cols=["op_ts", "seq"],
        n_buckets=4, props={"stats_cols": "n", **props},
    )


def _rows(spark, lo, hi, bump=0, op="I"):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.lit(TS) + F.make_interval(secs=F.col("id") + bump)).alias("op_ts"),
        (F.col("id") + bump).alias("seq"),
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.col("id").alias("n"),
        F.lit(op).alias("op"),
    )


def test_files_partitions_consistent_with_footers(spark, tmp_root):
    t = _table(spark, tmp_root)
    t.merge(_rows(spark, 0, 200), "e0")
    t.merge(_rows(spark, 100, 300, bump=1000), "e1")  # 100 keys overlap
    snap = t.current_snapshot()

    files = t.meta("files").collect()
    by_file = {r["file"]: r for r in files}
    assert set(by_file) == {f for fl in snap.buckets.values() for f in fl}
    # bucket attribution matches the snapshot map
    for b, fl in snap.buckets.items():
        for f in fl:
            assert by_file[f]["bucket"] == b
    # physical row counts sum to the stored rows: 200 + 200 delta rows
    # (the 100 overlapping keys hold two versions pre-compaction)
    assert sum(r["row_count"] for r in files) == 400
    assert all(r["size_bytes"] > 0 and r["row_groups"] >= 1 for r in files)

    parts = {r["bucket"]: r for r in t.meta("partitions").collect()}
    assert set(parts) == {b for b, fl in snap.buckets.items() if fl}
    for b, fl in snap.buckets.items():
        if fl:
            assert parts[b]["files"] == len(fl)
            assert parts[b]["rows"] == sum(by_file[f]["row_count"] for f in fl)

    # after compaction the footer sums collapse to exactly the live rows
    t.compact()
    live = t.read().count()
    assert live == 300
    assert sum(r["row_count"] for r in t.meta("files").collect()) == live

    # time travel: the files view of the OLD snapshot is unchanged
    old = t.meta("files", version=snap.version).collect()
    assert {r["file"] for r in old} == set(by_file)


def test_snapshots_ledger_refs_stats_views(spark, tmp_root):
    t = _table(spark, tmp_root)
    t.merge(_rows(spark, 0, 100), "wave:0")
    t.merge(_rows(spark, 100, 200), "wave:1")
    t.tag("seed", version=1)
    t.compact()  # maintenance commit: added == []

    snaps = {r["version"]: r for r in t.meta("snapshots").collect()}
    assert set(snaps) == set(t.versions())
    head = snaps[t.current_version()]
    assert head["is_maintenance"] and head["added_files"] == 0
    assert snaps[1]["parent"] == 0 and not snaps[1]["is_maintenance"]
    assert head["applied_count"] == 2  # compaction stays out of the ledger

    ledger = t.meta("ledger").collect()
    entries = {(r["entry"], r["kind"]) for r in ledger}
    # both wave keys are accounted for — in the window or folded
    window = {r["entry"] for r in ledger if r["kind"] == "window"}
    folded = {r["entry"]: (r["wm_lo"], r["wm_hi"])
              for r in ledger if r["kind"] in ("folded", "cursor")}
    for i in (0, 1):
        assert f"wave:{i}" in window or (
            "wave" in folded and folded["wave"][0] <= i <= folded["wave"][1]
        ), (window, folded, entries)

    refs = {r["name"]: r for r in t.meta("refs").collect()}
    assert refs["seed"]["kind"] == "tag" and refs["seed"]["version"] == 1

    stats = t.meta("stats").collect()
    assert stats, "stats_cols is set; zone maps must surface"
    assert {r["column"] for r in stats} == {"n"}
    assert all(not r["is_bloom"] for r in stats)
    # bounds are the JSON-encoded zone maps from the snapshot, verbatim
    import json
    snap = t.current_snapshot()
    for r in stats:
        assert json.loads(r["min_json"]) == snap.file_stats[r["file"]]["n"][0]


def test_meta_rejects_unknown_kind(spark, tmp_root):
    t = _table(spark, tmp_root)
    t.merge(_rows(spark, 0, 10), "e0")
    with pytest.raises(ValueError, match="unknown metadata kind"):
        t.meta("nope")
