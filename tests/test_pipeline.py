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
