"""Timestamp travel (LakeTable.version_as_of + Snapshot.commit_ts).

Iceberg ``FOR SYSTEM_TIME AS OF`` parity: every snapshot is stamped at
PUBLISH time and a wall-clock instant resolves to the snapshot that was
current then. Metadata-only, like every other version surface.
Reference analogue: the savepoint-copy lookups by load date,
utilitarios/bd.py:224-257."""

from __future__ import annotations

import datetime as dt
import json
import os
import time

import pytest
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable

SCHEMA = "event_id bigint, op_ts timestamp, repo string, path string, content string"
T0 = dt.datetime(2024, 1, 1)


def _mk(spark, root, name):
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(SCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=4, props={"compact_threshold": "100"},
    )


def _merge(spark, t, key, i):
    t.merge(spark.createDataFrame(
        [(i, T0 + dt.timedelta(hours=i), f"r{i}", f"p{i}", f"c{i}", "I")],
        SCHEMA + ", op string"), key)


def test_version_as_of_resolves_each_commit(spark, tmp_root):
    t = _mk(spark, tmp_root, "asof")
    marks = [(t.current_version(), time.time())]
    for i in range(3):
        time.sleep(0.02)  # strictly separate the commit instants
        _merge(spark, t, f"w:{i}", i)
        marks.append((t.current_version(), time.time()))
    for v, ts in marks:
        assert t.version_as_of(ts) == v
        # the exact commit instant itself resolves to that commit (<=)
        assert t.version_as_of(t.snapshot(v).commit_ts) == v
    # a timestamp between two commits resolves to the EARLIER one
    mid = (t.snapshot(marks[1][0]).commit_ts
           + t.snapshot(marks[2][0]).commit_ts) / 2
    assert t.version_as_of(mid) == marks[1][0]
    # and the resolved version reads the state of that moment
    v1 = t.version_as_of(marks[1][1])
    assert t.read(version=v1).count() == 1


def test_version_as_of_before_first_raises(spark, tmp_root):
    t = _mk(spark, tmp_root, "early")
    born = t.current_snapshot().commit_ts
    with pytest.raises(ValueError, match="at or before"):
        t.version_as_of(born - 60.0)


def test_version_as_of_respects_expiry(spark, tmp_root):
    t = _mk(spark, tmp_root, "exp")
    for i in range(4):
        time.sleep(0.02)
        _merge(spark, t, f"w:{i}", i)
    early = t.snapshot(t.versions()[1]).commit_ts
    assert t.version_as_of(early) == t.versions()[1]
    t.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="at or before"):
        t.version_as_of(early)  # that history is gone, loudly


def test_version_as_of_skips_unstamped_legacy_snapshots(spark, tmp_root):
    t = _mk(spark, tmp_root, "legacy")
    _merge(spark, t, "w:0", 0)
    time.sleep(0.02)
    _merge(spark, t, "w:1", 1)
    # surgically strip the stamp from v1 (a pre-timestamp snapshot)
    v1 = t.versions()[1]
    p = t._snap_path(v1)
    d = json.loads(open(p).read())
    d.pop("commit_ts")
    os.unlink(p)
    with open(p, "w") as fh:
        json.dump(d, fh)
    assert t.snapshot(v1).commit_ts is None
    late = time.time()
    # unstamped snapshots are ineligible; the scan still resolves around them
    assert t.version_as_of(late) == t.versions()[-1]
    born = t.snapshot(t.versions()[0]).commit_ts
    assert t.version_as_of(born) == t.versions()[0]


def test_snapshots_meta_carries_committed_at(spark, tmp_root):
    t = _mk(spark, tmp_root, "meta")
    for i in range(2):
        _merge(spark, t, f"w:{i}", i)
    rows = sorted(t.meta("snapshots").collect(), key=lambda r: r["version"])
    stamps = [r["committed_at"] for r in rows]
    assert all(s is not None for s in stamps)
    assert stamps == sorted(stamps)
