"""Snapshot reconciliation: drifted lake state repaired to match a fresh
full snapshot via corrective I/U/D events through the normal MERGE.

Pins: per-op classification (missing/differing/extra keys), NULL-vs-set
payload drift, exactly-once re-run, dry-run, stamp validation, the
change feed carrying the repair downstream, and the patch-semantics
rejection.
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from etl_spark.cdc import reconcile_snapshot, snapshot_corrections
from etl_spark.lake import LakeTable

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("name", StringType()),
    StructField("score", DoubleType()),
])

ROWS = "k bigint, v bigint, name string, score double, op string"


def _mk(spark, root, rows, props=None):
    table = LakeTable.create(
        spark, os.path.join(root, "t"), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=2, props=props,
    )
    df = spark.createDataFrame(rows, ROWS)
    table.merge(df, manifest_key="seed")
    return table


def test_reconcile_repairs_all_three_drift_kinds(spark, tmp_root):
    # state: k=1 stale payload, k=2 correct, k=3 should not exist,
    # k=4 missing entirely, k=5 drifted to NULL where snapshot has a value
    table = _mk(spark, tmp_root, [
        (1, 1, "stale", 1.0, "I"),
        (2, 1, "ok", 2.0, "I"),
        (3, 1, "ghost", 3.0, "I"),
        (5, 1, None, 5.0, "I"),
    ])
    snapshot = spark.createDataFrame(
        [(1, "fresh", 1.5), (2, "ok", 2.0), (4, "new", 4.0),
         (5, "named", 5.0)],
        "k bigint, name string, score double")

    stats = reconcile_snapshot(table, snapshot, {"v": 2}, "reconcile:1")
    assert (stats.inserts, stats.updates, stats.deletes) == (1, 2, 1)
    assert stats.merge.applied

    state = {r["k"]: (r["name"], r["score"])
             for r in table.read().collect()}
    assert state == {1: ("fresh", 1.5), 2: ("ok", 2.0), 4: ("new", 4.0),
                     5: ("named", 5.0)}

    # exactly-once: same manifest key re-run is a metadata no-op
    stats2 = reconcile_snapshot(table, snapshot, {"v": 3}, "reconcile:1")
    assert not stats2.merge.applied

    # an in-sync table yields zero corrections
    stats3 = reconcile_snapshot(table, snapshot, {"v": 3}, "reconcile:2")
    assert stats3.corrections == 0


def test_reconcile_dry_run_counts_without_commit(spark, tmp_root):
    table = _mk(spark, tmp_root, [(1, 1, "stale", 1.0, "I")])
    snapshot = spark.createDataFrame([(1, "fresh", 1.0), (2, "new", 2.0)],
                                     "k bigint, name string, score double")
    v0 = table.current_snapshot().version
    stats = reconcile_snapshot(table, snapshot, {"v": 2}, "dry", dry_run=True)
    assert (stats.inserts, stats.updates, stats.deletes) == (1, 1, 0)
    assert stats.merge is None
    assert table.current_snapshot().version == v0
    assert {r["name"] for r in table.read().collect()} == {"stale"}


def test_reconcile_rejects_non_outranking_stamp(spark, tmp_root):
    table = _mk(spark, tmp_root, [(1, 5, "x", 1.0, "I")])
    snapshot = spark.createDataFrame([(1, "y", 1.0)],
                                     "k bigint, name string, score double")
    with pytest.raises(ValueError, match="outrank"):
        reconcile_snapshot(table, snapshot, {"v": 5}, "r:1")
    with pytest.raises(ValueError, match="version stamp must cover"):
        reconcile_snapshot(table, snapshot, {"wrong": 9}, "r:1")


def test_reconcile_rejects_patch_semantics(spark, tmp_root):
    table = _mk(spark, tmp_root, [(1, 1, "x", 1.0, "I")],
                props={"update_semantics": "patch"})
    snapshot = spark.createDataFrame([(1, "y", 1.0)],
                                     "k bigint, name string, score double")
    with pytest.raises(ValueError, match="patch"):
        snapshot_corrections(table, snapshot, {"v": 2})


def test_repair_flows_through_change_feed(spark, tmp_root):
    """Downstream consumers see the repair as an ordinary feed wave."""
    table = _mk(spark, tmp_root, [
        (1, 1, "stale", 1.0, "I"), (3, 1, "ghost", 3.0, "I")])
    v0 = table.current_snapshot().version
    snapshot = spark.createDataFrame([(1, "fresh", 1.0)],
                                     "k bigint, name string, score double")
    reconcile_snapshot(table, snapshot, {"v": 2}, "reconcile:1")

    feed = table.changes(v0).collect()
    by_k = {r["k"]: r for r in feed}
    assert set(by_k) == {1, 3}
    assert by_k[1]["name"] == "fresh" and by_k[1]["_op"] == "U"
    # the extra key leaves as a tombstone the feed exposes
    assert by_k[3]["_op"] == "D"


def test_type_aligned_snapshot_is_no_repair(spark, tmp_root):
    """A snapshot delivering ints where the table stores doubles (or any
    representational difference) must not re-'repair' equal rows."""
    table = _mk(spark, tmp_root, [(1, 1, "a", 2.0, "I")])
    snapshot = spark.createDataFrame([(1, "a", 2)],
                                     "k bigint, name string, score int")
    stats = reconcile_snapshot(table, snapshot, {"v": 2}, "r:1",
                               dry_run=True)
    assert stats.corrections == 0
