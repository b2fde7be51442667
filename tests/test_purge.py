"""Right-to-erasure purge: tombstone → targeted compaction → snapshot
expiry → vacuum, with physical-file verification (no payload byte of the
purged subject survives anywhere under the table directory)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable, purge_keys

SCHEMA = "event_id bigint, op_ts timestamp, repo string, path string, content string"
T0 = dt.datetime(2024, 1, 1)


def _mk(spark, root, name="t", props=None):
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(SCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=4, props=props,
    )


def _merge(spark, t, key, rows):
    t.merge(spark.createDataFrame(rows, SCHEMA + ", op string"), key)


def _scan_files_for(spark, table, needle: str) -> int:
    """Rows containing ``needle`` across EVERY parquet file still on disk
    under the table — including files no snapshot references (the point of
    the vacuum step). Byte-grep is unreliable under parquet compression,
    so each file is decoded."""
    hits = 0
    for f in glob.glob(os.path.join(table.path, "**", "*.parquet"),
                       recursive=True):
        df = spark.read.parquet(f)
        if "content" in df.columns:
            hits += df.filter(df["content"].contains(needle)).count()
    return hits


def test_purge_erases_live_state_history_and_files(spark, tmp_root):
    src = _mk(spark, tmp_root, props={"compact_threshold": "999"})
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "SECRET-ALPHA", "I"),
                               (2, T0, "r", "b", "keep-1", "I")])
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "a", "SECRET-BETA", "U"),
            (4, T0 + dt.timedelta(minutes=1), "q", "c", "keep-2", "I")])
    assert _scan_files_for(spark, src, "SECRET") == 2  # both versions on disk
    pre_purge_version = src.current_version()

    keys = spark.createDataFrame([("r", "a")], "repo string, path string")
    report = purge_keys(src, keys, manifest_key="purge:req-1",
                        vacuum_grace_sec=0.0)

    assert report["tombstoned"] and report["residual_live"] == 0
    assert report["buckets_compacted"] >= 1 and report["files_vacuumed"] >= 1
    # live state: subject gone, bystanders intact
    got = {(r["repo"], r["path"]): r["content"] for r in src.read().collect()}
    assert got == {("r", "b"): "keep-1", ("q", "c"): "keep-2"}
    # physical erasure: no version of the subject's payload on disk
    assert _scan_files_for(spark, src, "SECRET") == 0
    # history erasure: the pre-purge snapshot is no longer readable
    with pytest.raises(Exception):
        src.read(version=pre_purge_version)

    # the tombstone outranks everything prior: a late duplicate of the
    # purged data is suppressed, not resurrected
    _merge(spark, src, "late:0",
           [(3, T0 + dt.timedelta(minutes=1), "r", "a", "SECRET-BETA", "U")])
    assert ("r", "a") not in {
        (r["repo"], r["path"]) for r in src.read().collect()
    }
    # ... while a genuinely NEWER event is new data and wins
    _merge(spark, src, "e:2",
           [(99, T0 + dt.timedelta(days=1), "r", "a", "fresh", "I")])
    got2 = {(r["repo"], r["path"]): r["content"] for r in src.read().collect()}
    assert got2[("r", "a")] == "fresh"


def test_purge_is_exactly_once_and_validates_inputs(spark, tmp_root):
    src = _mk(spark, tmp_root)
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "SECRET", "I")])
    keys = spark.createDataFrame([("r", "a")], "repo string, path string")

    r1 = purge_keys(src, keys, manifest_key="purge:req-2",
                    vacuum_grace_sec=0.0)
    assert r1["tombstoned"] and r1["residual_live"] == 0
    # crash-replay with the same manifest key: merge is a metadata no-op,
    # the maintenance tail is idempotent, nothing resurrects
    r2 = purge_keys(src, keys, manifest_key="purge:req-2",
                    vacuum_grace_sec=0.0)
    assert not r2["tombstoned"] and r2["residual_live"] == 0
    assert _scan_files_for(spark, src, "SECRET") == 0

    with pytest.raises(ValueError, match="key columns"):
        purge_keys(src, spark.createDataFrame([("r",)], "repo string"),
                   manifest_key="purge:bad")


def test_purge_accepts_keys_derived_from_the_table_itself(spark, tmp_root):
    """The natural call shape — ``purge_keys(t, t.read().filter(...))`` —
    must survive the purge's own vacuum: the key plan is materialized
    up-front, otherwise the report's re-evaluations would re-read files
    the purge just deleted (FAILED_READ_FILE)."""
    from pyspark.sql import functions as F

    src = _mk(spark, tmp_root)
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "SECRET", "I"),
                               (2, T0, "q", "b", "keep", "I")])
    keys = (src.read().filter(F.col("content").contains("SECRET"))
            .select("repo", "path"))
    report = purge_keys(src, keys, manifest_key="purge:selfref",
                        vacuum_grace_sec=0.0)
    assert report["keys"] == 1 and report["residual_live"] == 0
    assert _scan_files_for(spark, src, "SECRET") == 0
    assert {(r["repo"], r["path"]) for r in src.read().collect()} == {("q", "b")}


def test_purge_requires_integral_final_version_col(spark, tmp_root):
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "tv"),
        StructType.fromDDL("k string, op_ts timestamp, v string"),
        key_cols=["k"], version_cols=["op_ts"], n_buckets=2,
    )
    from pyspark.sql import functions as F
    t.merge(spark.createDataFrame([("a", T0, "x")], "k string, op_ts timestamp, v string")
            .withColumn("op", F.lit("I")), "e:0")
    with pytest.raises(ValueError, match="integral final version"):
        purge_keys(t, spark.createDataFrame([("a",)], "k string"),
                   manifest_key="purge:x")


def test_purge_propagates_through_the_change_feed(spark, tmp_root):
    """A downstream consumer syncing AFTER the purge merge receives the
    tombstones and erases its copy — the reason purge goes through MERGE
    instead of editing files out-of-band."""
    from etl_spark.cdc.sync import sync_changes

    src = _mk(spark, tmp_root, props={"compact_threshold": "999"})
    dst = _mk(spark, tmp_root, name="dst",
              props={"cursor_prefixes": "sync"})
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "SECRET", "I"),
                               (2, T0, "r", "b", "keep", "I")])
    assert sync_changes(src, dst).applied
    assert _scan_files_for(spark, dst, "SECRET") >= 1  # downstream copy

    keys = spark.createDataFrame([("r", "a")], "repo string, path string")
    # keep_last covers the purge-merge snapshot so the feed still spans it
    purge_keys(src, keys, manifest_key="purge:req-3", keep_last=3,
               vacuum_grace_sec=0.0)
    assert sync_changes(src, dst).applied
    assert {(r["repo"], r["path"]) for r in dst.read().collect()} == {("r", "b")}
    # downstream completes its own erasure with the same composition
    dst.compact()
    dst.expire_snapshots(keep_last=1)
    dst.vacuum(older_than_sec=0.0)
    assert _scan_files_for(spark, dst, "SECRET") == 0
