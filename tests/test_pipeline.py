"""M6: capture orchestration — gates abort before write, dry-run commits
nothing, ledger records outcomes, schedule minus history = pending."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable
from etl_spark.metrics import MetricsSink
from etl_spark.pipeline import (
    ValidationError,
    expect,
    expect_no_nulls,
    expect_nonempty,
    expect_unique_keys,
    pending_from_schedule,
    run_capture,
)

SCHEMA = "event_id bigint, op_ts timestamp, repo string, path string, content string"


@pytest.fixture()
def table(spark, tmp_root):
    return LakeTable.create(
        spark, os.path.join(tmp_root, "tbl"), StructType.fromDDL(SCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"], n_buckets=4,
    )


def _batch(spark, *rows):
    return spark.createDataFrame(list(rows), SCHEMA + ", op string")


TS = dt.datetime(2024, 1, 1)


def test_gates_and_ledger(spark, tmp_root, table):
    sink = MetricsSink(os.path.join(tmp_root, "m"))
    good = _batch(spark, (1, TS, "r", "a", "v1", "I"))
    bad = _batch(spark, (2, TS, "r", None, "v2", "I"))

    res = run_capture(table, good, "cap:1",
                      gates=[expect_nonempty, expect_no_nulls("repo", "path"),
                             expect("event_id > 0")],
                      metrics_sink=sink)
    assert res.status == "applied" and table.read().count() == 1

    res = run_capture(table, bad, "cap:2",
                      gates=[expect_no_nulls("repo", "path")], metrics_sink=sink)
    assert res.status == "rejected" and "NULL" in res.error
    assert table.read().count() == 1  # nothing written
    assert "cap:2" not in table.applied_manifests()

    rows = sink.rows()
    assert [r.get("status", "applied") for r in rows][:2] == ["applied", "rejected"]
    assert "error" in rows[1]


def test_dry_run_commits_nothing(spark, table):
    b = _batch(spark, (1, TS, "r", "a", "v1", "I"))
    res = run_capture(table, b, "cap:1", dry_run=True)
    assert res.status == "dry_run"
    assert table.read().count() == 0
    assert table.applied_manifests() == set()
    # a real run afterwards applies normally (dry-run left no trace)
    assert run_capture(table, b, "cap:1").status == "applied"


def test_unique_keys_gate(spark, table):
    dup = _batch(spark, (1, TS, "r", "a", "v1", "I"), (2, TS, "r", "a", "v2", "I"))
    res = run_capture(table, dup, "cap:1", gates=[expect_unique_keys("repo", "path")])
    assert res.status == "rejected"


def test_pending_from_schedule(spark, table):
    b = _batch(spark, (1, TS, "r", "a", "v1", "I"))
    run_capture(table, b, "cap:1")
    schedule = ["cap:1", "cap:2", "cap:3"]
    assert pending_from_schedule(schedule, table) == ["cap:2", "cap:3"]


def test_pending_scan_matches_driver_side(spark, tmp_root):
    """The distributed pending scan must agree with the driver-side
    has_applied() on every tricky key shape — window hits, folded
    watermark hits, a gap seq, zero-padded non-canonical seqs, keys with
    extra colons, and non-sequence keys."""
    import os

    from pyspark.sql.types import StructType

    from etl_spark.lake import LakeTable
    from etl_spark.pipeline import pending_from_schedule, pending_scan

    base = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), "r", "p", "c")],
        "event_id bigint, op_ts timestamp, repo string, path string, "
        "content string",
    )
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "pend"), StructType(base.schema.fields),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=2, props={"manifest_window": "2"},
    )
    snap = t.current_snapshot()
    for i in [0, 1, 2, 3, 5]:  # gap at 4 — must never fold
        t._publish(t._child(snap, snap.schema, snap.buckets,
                            f"epoch:{i}", added=[]))
        snap = t.current_snapshot()
    t._publish(t._child(snap, snap.schema, snap.buckets, "a:1:2", added=[]))

    schedule = [f"epoch:{i}" for i in range(8)] + [
        "epoch:04", "epoch:004", "a:1:2", "a:1:02", "a:12", "adhoc", "adhoc:x",
    ]
    want = sorted(pending_from_schedule(schedule, t))
    sched_df = spark.createDataFrame([(k,) for k in schedule],
                                     "manifest_key string")
    got = sorted(r["manifest_key"]
                 for r in pending_scan(sched_df, t).collect())
    assert got == want
    assert "epoch:4" in got and "epoch:04" in got and "a:1:02" in got
    assert "epoch:3" not in got and "a:1:2" not in got
