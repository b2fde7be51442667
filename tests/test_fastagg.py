"""Metadata-accelerated aggregates (lake/fastagg.py).

The correctness stakes mirror the zone-map tests: under merge-on-read a
footer answers for a FILE, not the table — these tests pin that every
tier (footer / column-scan / resolve) contributes exactly its buckets'
resolved rows, that tombstones never pollute counts or bounds, and
that patch tables refuse the physical shortcut entirely.
Reference analogue: the per-load row-count bookkeeping queries,
scripts/geral.py:92-109."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable
from etl_spark.lake.fastagg import fast_count, fast_min_max

SCHEMA = "event_id bigint, op_ts timestamp, repo string, path string, content string"
T0 = dt.datetime(2024, 1, 1)
FAR = T0 + dt.timedelta(days=10_000)


def _mk(spark, root, name, n_buckets=4, props=None):
    base = {"compact_threshold": "100"}
    base.update(props or {})
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(SCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=n_buckets, props=base,
    )


def _merge(spark, t, key, rows):
    t.merge(spark.createDataFrame(rows, SCHEMA + ", op string"), key)


def _seed(spark, t, n=48, deletes=True):
    """Insert n keys, update a third, delete a third (spread over every
    bucket), leaving live = keys whose latest event is not a delete."""
    _merge(spark, t, "w:0", [
        (i, T0 + dt.timedelta(hours=i), f"r{i % 7}", f"p{i}", f"c{i}", "I")
        for i in range(n)
    ])
    _merge(spark, t, "w:1", [
        (1000 + i, T0 + dt.timedelta(days=1, hours=i),
         f"r{i % 7}", f"p{i}", f"upd{i}", "U")
        for i in range(0, n, 3)
    ])
    if deletes:
        _merge(spark, t, "w:2", [
            (2000 + i, T0 + dt.timedelta(days=2, hours=i),
             f"r{i % 7}", f"p{i}", None, "D")
            for i in range(1, n, 3)
        ])


def _truth(t):
    df = t.read()
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("op_ts").alias("mn_ts"), F.max("op_ts").alias("mx_ts"),
        F.min("content").alias("mn_c"), F.max("content").alias("mx_c"),
    ).collect()[0]
    return row["n"], (row["mn_ts"], row["mx_ts"]), (row["mn_c"], row["mx_c"])


def test_fast_count_three_tiers(spark, tmp_root):
    t = _mk(spark, tmp_root, "tiers")
    _seed(spark, t)
    buckets = sorted(t.current_snapshot().buckets)
    assert len(buckets) >= 3
    # tier 1: tombstone-expired compaction => provably all-live files
    t.compact(buckets=buckets[:1], expire_tombstones_before=FAR)
    # tier 2: compaction keeping tombstones => mixed files, column scan
    t.compact(buckets=buckets[1:2])
    # tier 3: the rest stays dirty (multi-file) => LWW resolve
    truth = t.read().count()
    n, brk = fast_count(t)
    assert n == truth
    assert brk["files_footer"] >= 1
    assert brk["files_scanned"] >= 1
    assert brk["buckets_resolved"] == len(buckets) - 2
    assert brk["patch_fallback"] == 0


def test_fast_count_fully_compacted_is_metadata_only(spark, tmp_root):
    t = _mk(spark, tmp_root, "clean")
    _seed(spark, t)
    t.compact(expire_tombstones_before=FAR)
    truth = t.read().count()
    n, brk = fast_count(t)
    assert (n, brk["files_scanned"], brk["buckets_resolved"]) == (truth, 0, 0)
    assert brk["files_footer"] >= 1


def test_fast_count_time_travel_and_empty(spark, tmp_root):
    t = _mk(spark, tmp_root, "tt")
    assert fast_count(t)[0] == 0
    _seed(spark, t, deletes=False)
    v = t.current_version()
    _merge(spark, t, "w:extra", [
        (9000, T0 + dt.timedelta(days=9), "rX", "pX", "late", "I")
    ])
    assert fast_count(t, version=v)[0] == t.read(version=v).count()
    assert fast_count(t)[0] == t.read().count()


def _pollute(spark, t):
    """30 live keys; the key carrying the extreme op_ts AND the extreme
    content string gets DELETED — a footer-only answer over a file still
    holding its tombstone would leak both extremes."""
    _merge(spark, t, "w:0", [
        (i, T0 + dt.timedelta(hours=i), f"r{i % 7}", f"p{i}", f"c{i:03d}", "I")
        for i in range(30)
    ])
    _merge(spark, t, "w:1", [
        (5000, T0 + dt.timedelta(days=50), "r0", "p0", "zzzz", "U")
    ])
    _merge(spark, t, "w:2", [
        (6000, T0 + dt.timedelta(days=60), "r0", "p0", None, "D")
    ])


def test_fast_min_max_tombstone_never_pollutes(spark, tmp_root):
    t = _mk(spark, tmp_root, "bounds")
    _pollute(spark, t)
    t.compact()  # tombstones retained => mixed files => scan tier
    truth_n, truth_ts, truth_c = _truth(t)
    vals, brk = fast_min_max(t, ["op_ts", "content"])
    assert vals["op_ts"] == truth_ts
    assert vals["content"] == truth_c
    assert fast_count(t)[0] == truth_n
    assert brk["files_scanned"] >= 1  # the tombstone file was scanned


def test_fast_min_max_expired_table_is_footer_only(spark, tmp_root):
    """Same polluted history, but compaction expires the tombstone on
    the way down: the whole answer then comes from footers alone."""
    t = _mk(spark, tmp_root, "bounds2")
    _pollute(spark, t)
    t.compact(expire_tombstones_before=FAR)
    truth_n, truth_ts, truth_c = _truth(t)
    vals, brk = fast_min_max(t, ["op_ts", "content"])
    assert vals["op_ts"] == truth_ts
    assert vals["content"] == truth_c
    assert fast_count(t)[0] == truth_n
    assert brk["files_scanned"] == 0 and brk["buckets_resolved"] == 0
    assert brk["files_footer"] >= 1


def test_fast_min_max_mixed_tiers_match_scan(spark, tmp_root):
    t = _mk(spark, tmp_root, "mm")
    _seed(spark, t)
    buckets = sorted(t.current_snapshot().buckets)
    t.compact(buckets=buckets[: len(buckets) // 2],
              expire_tombstones_before=FAR)
    _, truth_ts, truth_c = _truth(t)
    vals, brk = fast_min_max(t, ["op_ts", "content"])
    assert vals["op_ts"] == truth_ts
    assert vals["content"] == truth_c
    assert brk["files_footer"] >= 1 and brk["buckets_resolved"] >= 1


def test_fast_min_max_all_null_column(spark, tmp_root):
    t = _mk(spark, tmp_root, "nulls")
    _merge(spark, t, "w:0", [
        (i, T0 + dt.timedelta(hours=i), f"r{i}", f"p{i}", None, "I")
        for i in range(8)
    ])
    t.compact(expire_tombstones_before=FAR)
    vals, _ = fast_min_max(t, ["content"])
    assert vals["content"] == (None, None)
    assert fast_count(t)[0] == 8


def test_expiry_reaches_already_compacted_buckets(spark, tmp_root):
    """A tombstone in a bucket that never dirties again must still be
    expirable: a plain compact retains it (scan tier forever), then a
    second compact WITH the watermark selects the clean single-file
    bucket from its footer stats alone and rewrites it — after which the
    whole table answers from footers. Buckets with nothing expirable
    (footer min >= watermark, or no tombstones at all) are not
    re-rewritten."""
    t = _mk(spark, tmp_root, "cleanexp")
    _pollute(spark, t)
    t.compact()  # fold to single files, tombstone retained
    truth_n, truth_ts, truth_c = _truth(t)
    assert fast_count(t)[0] == truth_n
    assert fast_count(t)[1]["files_scanned"] >= 1
    v_before = t.current_version()
    assert t.compact(expire_tombstones_before=FAR) >= 1
    n, brk = fast_count(t)
    assert n == truth_n
    assert brk["files_scanned"] == 0 and brk["buckets_resolved"] == 0
    vals, _ = fast_min_max(t, ["op_ts", "content"])
    assert vals["op_ts"] == truth_ts and vals["content"] == truth_c
    # idempotent: nothing left to expire, the next pass is a no-op commit
    v_after = t.current_version()
    assert v_after == v_before + 1
    assert t.compact(expire_tombstones_before=FAR) == 0
    assert t.current_version() == v_after


def test_fast_agg_patch_fallback(spark, tmp_root):
    t = _mk(spark, tmp_root, "patch",
            props={"compact_threshold": "100",
                   "update_semantics": "patch"})
    _merge(spark, t, "w:0", [
        (i, T0 + dt.timedelta(hours=i), f"r{i}", f"p{i}", f"c{i}", "I")
        for i in range(10)
    ])
    # partial update: NULL content means KEEP under patch semantics
    _merge(spark, t, "w:1",
           [(100, T0 + dt.timedelta(days=1), "r1", "p1", None, "U")])
    _merge(spark, t, "w:2",
           [(200, T0 + dt.timedelta(days=2), "r2", "p2", None, "D")])
    t.compact()
    truth_n, truth_ts, truth_c = _truth(t)
    n, brk = fast_count(t)
    assert n == truth_n and brk["patch_fallback"] == 1
    vals, brk2 = fast_min_max(t, ["op_ts", "content"])
    assert vals["op_ts"] == truth_ts and vals["content"] == truth_c
    assert brk2["patch_fallback"] == 1


def test_fast_min_max_unknown_column_raises(spark, tmp_root):
    t = _mk(spark, tmp_root, "unk")
    with pytest.raises(ValueError, match="unknown columns"):
        fast_min_max(t, ["nope"])
