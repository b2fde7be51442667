"""Semantic snapshot diff (lake/diff.py): state-computed delta between two
snapshots, and its agreement with the commit-provenance change feed."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable, snapshot_diff

SCHEMA = ("event_id bigint, op_ts timestamp, repo string, path string, "
          "lang string, size bigint")
T = [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) for m in range(10)]


def _mk(spark, root, props=None):
    return LakeTable.create(
        spark, os.path.join(root, "t"), StructType.fromDDL(SCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=2, props=props,
    )


def _merge(spark, t, key, rows):
    t.merge(spark.createDataFrame(rows, SCHEMA + ", op string"), key)


def _got(table, v0, v1=None):
    return {
        (r["repo"], r["path"]): (r["change"], r["old_lang"], r["new_lang"])
        for r in snapshot_diff(table, v0, v1).collect()
    }


def test_diff_add_remove_change_and_silence(spark, tmp_root):
    t = _mk(spark, tmp_root, props={"compact_threshold": "2"})
    _merge(spark, t, "e:0", [(1, T[0], "r", "a", "py", 1, "I"),
                             (2, T[0], "r", "b", "c", 2, "I"),
                             (3, T[0], "r", "c", "go", 3, "I")])
    v0 = t.current_version()
    _merge(spark, t, "e:1", [(4, T[1], "r", "a", "rs", 9, "U"),   # changed
                             (5, T[1], "r", "b", None, None, "D"),  # removed
                             (6, T[1], "r", "d", "js", 4, "I")])    # added
    # 'r','c' untouched => silent; compaction (threshold 2) fired mid-range
    assert _got(t, v0) == {
        ("r", "a"): ("changed", "py", "rs"),
        ("r", "b"): ("removed", "c", None),
        ("r", "d"): ("added", None, "js"),
    }
    # identical endpoints => empty diff
    assert _got(t, t.current_version()) == {}


def test_diff_agrees_with_change_feed(spark, tmp_root):
    """The feed (commit provenance) and the diff (state) must describe the
    same net delta: applying the feed's LWW winners onto the old state is
    exactly the diff's add/remove/change set."""
    t = _mk(spark, tmp_root)
    _merge(spark, t, "e:0", [(1, T[0], "r", "a", "py", 1, "I"),
                             (2, T[0], "r", "b", "c", 2, "I")])
    v0 = t.current_version()
    _merge(spark, t, "e:1", [(3, T[1], "r", "a", "rs", 9, "U")])
    _merge(spark, t, "e:2", [(4, T[2], "r", "a", "go", 5, "U"),
                             (5, T[2], "r", "b", None, None, "D"),
                             (6, T[2], "r", "e", "js", 7, "I")])

    diff = {(r["repo"], r["path"]): (r["change"], r["new_lang"])
            for r in snapshot_diff(t, v0).collect()}

    from etl_spark.cdc.lww import lww_dedup
    feed = lww_dedup(t.changes(v0), ["repo", "path"],
                     ["op_ts", "event_id"])
    old = {(r["repo"], r["path"]): r["lang"]
           for r in t.read(version=v0).collect()}
    expect = {}
    for r in feed.collect():
        k = (r["repo"], r["path"])
        if r["_op"] == "D":
            if k in old:
                expect[k] = ("removed", None)
        elif k in old:
            if old[k] != r["lang"]:
                expect[k] = ("changed", r["lang"])
        else:
            expect[k] = ("added", r["lang"])
    assert diff == expect == {
        ("r", "a"): ("changed", "go"),
        ("r", "b"): ("removed", None),
        ("r", "e"): ("added", "js"),
    }


def test_diff_across_schema_evolution(spark, tmp_root):
    """The from-side predates an added column: it aligns as typed NULLs,
    and a row whose only difference is the new column still reports as
    changed with old_<new col> NULL."""
    t = _mk(spark, tmp_root)
    _merge(spark, t, "e:0", [(1, T[0], "r", "a", "py", 1, "I")])
    v0 = t.current_version()
    evolved = spark.createDataFrame(
        [(2, T[1], "r", "a", "py", 1, "stable", "U")],
        SCHEMA + ", channel string, op string",
    )
    t.merge(evolved, "e:1")
    rows = snapshot_diff(t, v0).collect()
    assert len(rows) == 1 and rows[0]["change"] == "changed"
    assert rows[0]["old_channel"] is None
    assert rows[0]["new_channel"] == "stable"
