"""Metadata-only column DROP (LakeTable.alter_drop_column).

Iceberg ``DROP COLUMN`` parity with the format's honest name-vs-id
limitation made loud: nothing is rewritten (explicit-schema reads just
stop decoding the column), time travel still sees it, a later rewrite
sheds the bytes, and — because columns are tracked by NAME here, not by
ID — re-adding the dropped name is REFUSED instead of silently
resurrecting old files' values. Reference analogue: the DE-PARA drop
rules (unnamed-prune) applied at the table layer."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable

SCHEMA = "event_id bigint, op_ts timestamp, repo string, path string, content string, extra bigint"
T0 = dt.datetime(2024, 1, 1)


def _mk(spark, root, name, props=None):
    base = {"compact_threshold": "100"}
    base.update(props or {})
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(SCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=4, props=base,
    )


def _merge(spark, t, key, rows):
    t.merge(spark.createDataFrame(rows, SCHEMA + ", op string"), key)


def _seed(spark, t, n=12):
    _merge(spark, t, "w:0", [
        (i, T0 + dt.timedelta(hours=i), f"r{i}", f"p{i}", f"c{i}", i * 10, "I")
        for i in range(n)
    ])


def test_drop_is_metadata_only_and_time_travel_keeps_it(spark, tmp_root):
    t = _mk(spark, tmp_root, "drop")
    _seed(spark, t)
    v_pre = t.current_version()
    files_pre = dict(t.current_snapshot().buckets)
    t.alter_drop_column("extra")
    snap = t.current_snapshot()
    assert snap.buckets == files_pre            # nothing rewritten
    assert "extra" not in [f.name for f in snap.schema.fields]
    live = t.read()
    assert "extra" not in live.columns
    assert live.count() == 12                   # other columns intact
    assert {r["content"] for r in live.collect()} == {f"c{i}" for i in range(12)}
    # time travel to the pre-drop snapshot still decodes the column
    old = t.read(version=v_pre)
    assert "extra" in old.columns
    assert old.agg(F.sum("extra")).collect()[0][0] == sum(i * 10 for i in range(12))


def test_post_drop_merges_and_rewrite_sheds_bytes(spark, tmp_root):
    t = _mk(spark, tmp_root, "shed")
    _seed(spark, t)
    t.alter_drop_column("extra")
    # post-drop ingest: batches no longer carry the column
    t.merge(spark.createDataFrame(
        [(100, T0 + dt.timedelta(days=2), "r0", "p0", "c0v2", "U")],
        "event_id bigint, op_ts timestamp, repo string, path string, "
        "content string, op string"), "w:1")
    assert [r["content"] for r in
            t.read().filter(F.col("path") == "p0").collect()] == ["c0v2"]
    # a rewrite physically sheds the dropped column from its output files
    snap_pre = t.current_snapshot()
    pre_files = {f for fl in snap_pre.buckets.values() for f in fl}
    assert t.compact() >= 1
    import pyarrow.parquet as pq
    snap = t.current_snapshot()
    rewritten = [f for fl in snap.buckets.values() for f in fl
                 if f not in pre_files]
    assert rewritten
    for rel in rewritten:
        md = pq.ParquetFile(os.path.join(t.path, rel)).metadata
        rg0 = md.row_group(0)
        names = {rg0.column(i).path_in_schema for i in range(rg0.num_columns)}
        assert "extra" not in names
    # (older untouched files legitimately keep the bytes; reads never
    # decode them — the read-schema assertions above prove that)


def test_readd_of_dropped_name_is_refused(spark, tmp_root):
    t = _mk(spark, tmp_root, "readd")
    _seed(spark, t)
    t.alter_drop_column("extra")
    batch = spark.createDataFrame(
        [(200, T0 + dt.timedelta(days=3), "r1", "p1", "x", 999, "U")],
        SCHEMA + ", op string")
    with pytest.raises(ValueError, match="re-adds dropped"):
        t.merge(batch, "w:bad")
    # a DIFFERENT new column still evolves additively
    t.merge(spark.createDataFrame(
        [(201, T0 + dt.timedelta(days=3), "r1", "p1", "x", 7, "U")],
        "event_id bigint, op_ts timestamp, repo string, path string, "
        "content string, extra2 bigint, op string"), "w:ok")
    assert "extra2" in t.read().columns


def test_drop_refusals(spark, tmp_root):
    t = _mk(spark, tmp_root, "refuse",
            props={"compact_threshold": "100", "stats_cols": "content",
                   "cluster_cols": "extra"})
    _seed(spark, t)
    with pytest.raises(ValueError, match="no such column"):
        t.alter_drop_column("nope")
    with pytest.raises(ValueError, match="structural"):
        t.alter_drop_column("repo")
    with pytest.raises(ValueError, match="structural"):
        t.alter_drop_column("op_ts")
    with pytest.raises(ValueError, match="zone maps"):
        t.alter_drop_column("content")
    with pytest.raises(ValueError, match="cluster dimension"):
        t.alter_drop_column("extra")
    t.alter_props({"cluster_cols": None})
    from etl_spark.lake import add_constraint
    add_constraint(t, "extra_nonneg", "extra >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.alter_drop_column("extra")
    from etl_spark.lake import drop_constraint
    drop_constraint(t, "extra_nonneg")
    t.alter_drop_column("extra")
    assert "extra" not in t.read().columns


def test_drop_bloom_col_refused(spark, tmp_root):
    t = _mk(spark, tmp_root, "bloomref",
            props={"compact_threshold": "100", "bloom_cols": "content",
                   "stats_cols": "op_ts"})
    _seed(spark, t)
    with pytest.raises(ValueError, match="bloom entries"):
        t.alter_drop_column("content")
