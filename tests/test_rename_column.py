"""Metadata-only column RENAME (LakeTable.alter_rename_column).

Iceberg ``RENAME COLUMN`` parity with the format's honest name-vs-id
limitation made loud: nothing is rewritten — the prior physical name is
recorded in the ``renamed_cols`` prop, reads decode BOTH names and
coalesce newest-first (old-vintage files answer under the new name), a
later rewrite migrates the bytes, and the old name is tombstoned so a
wire batch still carrying it is refused with an error that names the
rename. Reference analogue: the DE-PARA rename rules
(etl/utilitarios/... DE-PARA maps) applied at the table layer instead
of per-batch."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable

SCHEMA = ("event_id bigint, op_ts timestamp, repo string, path string, "
          "content string, extra bigint")
T0 = dt.datetime(2024, 1, 1)


def _mk(spark, root, name, props=None):
    base = {"compact_threshold": "100"}
    base.update(props or {})
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(SCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=4, props=base,
    )


def _seed(spark, t, n=12):
    t.merge(spark.createDataFrame(
        [(i, T0 + dt.timedelta(hours=i), f"r{i}", f"p{i}", f"c{i}",
          i * 10, "I") for i in range(n)],
        SCHEMA + ", op string"), "w:0")


def test_rename_is_metadata_only_and_reads_old_vintage(spark, tmp_root):
    t = _mk(spark, tmp_root, "ren")
    _seed(spark, t)
    v_pre = t.current_version()
    files_pre = dict(t.current_snapshot().buckets)
    t.alter_rename_column("extra", "extra_v2")
    snap = t.current_snapshot()
    assert snap.buckets == files_pre            # nothing rewritten
    names = [f.name for f in snap.schema.fields]
    assert "extra" not in names and "extra_v2" in names
    # position + type preserved
    assert names.index("extra_v2") == 5
    live = t.read()
    assert live.agg(F.sum("extra_v2")).collect()[0][0] == \
        sum(i * 10 for i in range(12))
    # time travel to the pre-rename snapshot still uses the old name
    old = t.read(version=v_pre)
    assert "extra" in old.columns and "extra_v2" not in old.columns


def test_lww_resolves_across_rename_boundary(spark, tmp_root):
    t = _mk(spark, tmp_root, "lww")
    _seed(spark, t)
    t.alter_rename_column("extra", "extra_v2")
    # post-rename wire uses the new name; the update must beat the
    # old-vintage row under LWW even though the loser's value lives
    # under the old physical name
    t.merge(spark.createDataFrame(
        [(100, T0 + dt.timedelta(days=2), "r0", "p0", "c0v2", 777, "U")],
        "event_id bigint, op_ts timestamp, repo string, path string, "
        "content string, extra_v2 bigint, op string"), "w:1")
    rows = {r["path"]: r["extra_v2"] for r in t.read().collect()}
    assert rows["p0"] == 777                    # post-rename winner
    assert rows["p1"] == 10                     # old vintage via coalesce
    # predicate reads work on the new name (residual filter path)
    hit = t.read(where=[("extra_v2", "=", 777)]).collect()
    assert [r["path"] for r in hit] == ["p0"]


def test_chained_rename_decodes_all_vintages(spark, tmp_root):
    t = _mk(spark, tmp_root, "chain")
    _seed(spark, t, n=4)
    t.alter_rename_column("extra", "mid")
    # a mid-vintage file carrying the intermediate physical name
    t.merge(spark.createDataFrame(
        [(50, T0 + dt.timedelta(days=1), "r9", "p9", "c9", 900, "I")],
        "event_id bigint, op_ts timestamp, repo string, path string, "
        "content string, mid bigint, op string"), "w:mid")
    t.alter_rename_column("mid", "final")
    snap = t.current_snapshot()
    assert snap.renamed_map() == {"final": ["mid", "extra"]}
    vals = {r["path"]: r["final"] for r in t.read().collect()}
    assert vals["p0"] == 0 and vals["p3"] == 30   # oldest vintage
    assert vals["p9"] == 900                      # intermediate vintage


def test_rewrite_migrates_physical_name(spark, tmp_root):
    t = _mk(spark, tmp_root, "shed")
    _seed(spark, t)
    t.alter_rename_column("extra", "extra_v2")
    t.merge(spark.createDataFrame(
        [(100, T0 + dt.timedelta(days=2), "r0", "p0", "c0v2", 5, "U")],
        "event_id bigint, op_ts timestamp, repo string, path string, "
        "content string, extra_v2 bigint, op string"), "w:1")
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
        names = {rg0.column(i).path_in_schema
                 for i in range(rg0.num_columns)}
        assert "extra_v2" in names and "extra" not in names
    # values survived the migration
    assert t.read().agg(F.sum("extra_v2")).collect()[0][0] == \
        sum(i * 10 for i in range(12)) - 0 + 5


def test_old_wire_name_refused_with_rename_hint(spark, tmp_root):
    t = _mk(spark, tmp_root, "wire")
    _seed(spark, t)
    t.alter_rename_column("extra", "extra_v2")
    batch = spark.createDataFrame(
        [(200, T0 + dt.timedelta(days=3), "r1", "p1", "x", 999, "U")],
        SCHEMA + ", op string")
    with pytest.raises(ValueError, match="now calls 'extra' -> 'extra_v2'"):
        t.merge(batch, "w:bad")


def test_changes_feed_presents_new_name(spark, tmp_root):
    t = _mk(spark, tmp_root, "feed")
    _seed(spark, t, n=4)
    t.alter_rename_column("extra", "extra_v2")
    t.merge(spark.createDataFrame(
        [(100, T0 + dt.timedelta(days=2), "r0", "p0", "c0v2", 5, "U")],
        "event_id bigint, op_ts timestamp, repo string, path string, "
        "content string, extra_v2 bigint, op string"), "w:1")
    feed = t.changes(0, t.current_version())
    assert "extra_v2" in feed.columns and "extra" not in feed.columns
    # old-vintage change rows answer under the new name too
    vals = {(r["path"], r["event_id"]): r["extra_v2"]
            for r in feed.collect()}
    assert vals[("p1", 1)] == 10 and vals[("p0", 100)] == 5


def test_rename_refusals(spark, tmp_root):
    t = _mk(spark, tmp_root, "refuse",
            props={"compact_threshold": "100", "stats_cols": "content",
                   "cluster_cols": "extra"})
    _seed(spark, t)
    with pytest.raises(ValueError, match="no such column"):
        t.alter_rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.alter_rename_column("extra", "content")
    with pytest.raises(ValueError, match="invalid column name"):
        t.alter_rename_column("extra", "not a name")
    with pytest.raises(ValueError, match="structural"):
        t.alter_rename_column("repo", "repo2")
    with pytest.raises(ValueError, match="zone maps"):
        t.alter_rename_column("content", "content2")
    with pytest.raises(ValueError, match="cluster dimension"):
        t.alter_rename_column("extra", "extra2")
    t.alter_props({"cluster_cols": None})
    from etl_spark.lake import add_constraint, drop_constraint
    add_constraint(t, "extra_nonneg", "extra >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.alter_rename_column("extra", "extra2")
    drop_constraint(t, "extra_nonneg")
    t.alter_rename_column("extra", "extra2")
    t.alter_props({"stats_cols": None})
    # tombstoned targets refused: the old physical name...
    with pytest.raises(ValueError, match="tombstoned"):
        t.alter_rename_column("content", "extra")
    # ...and a dropped name
    t.alter_drop_column("extra2")
    with pytest.raises(ValueError, match="tombstoned"):
        t.alter_rename_column("content", "extra2")
