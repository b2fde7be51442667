"""Streaming metrics listener + optimistic-concurrency conflict paths."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import StructType

from etl_spark.cdc import synth_events, write_event_epochs
from etl_spark.lake import CommitConflict, LakeTable
from etl_spark.metrics import LedgerQueryListener, MetricsSink
from etl_spark.streaming import stream_replay


def test_listener_records_progress(spark, tmp_root):
    events_dir = os.path.join(tmp_root, "wal")
    write_event_epochs(
        synth_events(spark, 1000, n_repos=10, paths_per_repo=10, n_epochs=2),
        events_dir,
    )
    sample = spark.read.parquet(events_dir)
    user = StructType([f for f in sample.schema.fields if f.name not in ("op", "epoch")])
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "tbl"), user,
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"], n_buckets=4,
    )
    sink = MetricsSink(os.path.join(tmp_root, "m"))
    listener = LedgerQueryListener(sink)
    spark.streams.addListener(listener)
    try:
        q = stream_replay(spark, events_dir, table, os.path.join(tmp_root, "ckpt"))
        q.awaitTermination(120)
        # listener delivery is asynchronous — poll for the progress rows
        import time

        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            if any(r.get("stream_event") == "progress" for r in sink.rows()):
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    kinds = [r.get("stream_event") for r in sink.rows() if "stream_event" in r]
    assert "started" in kinds and "progress" in kinds
    prog = [r for r in sink.rows() if r.get("stream_event") == "progress"]
    assert sum(r["num_input_rows"] for r in prog) > 0


def test_commit_conflict_and_retry(spark, tmp_root):
    """Optimistic concurrency: a stale writer loses the snapshot race with
    CommitConflict; merge() retries against the fresh snapshot and wins."""
    import datetime as dt

    schema = StructType.fromDDL(
        "event_id bigint, op_ts timestamp, repo string, path string, content string"
    )
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "t"), schema,
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"], n_buckets=2,
    )
    ts = dt.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [(1, ts, "r", "p", "v1", "I")],
        "event_id bigint, op_ts timestamp, repo string, path string, content string, op string",
    )
    stale = t.current_snapshot()
    # another writer publishes version 1 first
    t._publish(t._child(stale, stale.schema, stale.buckets, "other:1"))

    # direct stale apply => conflict
    with pytest.raises(CommitConflict):
        t._merge_once(stale, batch, "mine:1", "op", "D")

    # public merge() retries from the current snapshot and succeeds
    st = t.merge(batch, "mine:1")
    assert st.applied and t.current_version() == 2
    assert t.read().count() == 1
