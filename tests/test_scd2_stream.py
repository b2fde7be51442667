"""Streaming SCD2 maintenance (streaming/scd2_stream.py): micro-batched
interval closes with exactly-once dual commits and restart resume."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import tempfile
import time

from pyspark.sql.types import StructType

from etl_spark.cdc import create_scd2_tables, scd2_view
from etl_spark.streaming import stream_scd2

SCHEMA = "event_id bigint, op_ts timestamp, repo string, path string, lang string, op string"
T = [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) for m in range(10)]


def _mk(spark, root):
    return create_scd2_tables(
        spark, os.path.join(root, "scd2"),
        StructType.fromDDL(SCHEMA.rsplit(", op string", 1)[0]),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=2,
    )


def _land(spark, events_dir, fname, rows):
    """One micro-batch = one flat parquet file; sequential mtimes keep the
    file source's discovery order equal to landing order."""
    df = spark.createDataFrame(rows, SCHEMA)
    stage = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    os.makedirs(events_dir, exist_ok=True)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(events_dir, f"{fname}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)
    time.sleep(0.05)


def _view(cur, hist):
    return {
        (r["repo"], r["path"], r["op_ts"]):
            (r["lang"], r["valid_to"], r["is_current"])
        for r in scd2_view(cur, hist).collect()
    }


def test_stream_scd2_builds_interval_chain(spark, tmp_path):
    root = str(tmp_path)
    events_dir = os.path.join(root, "in")
    _land(spark, events_dir, "b1", [(1, T[0], "r", "a", "py", "I"),
                                    (2, T[0], "r", "b", "c", "I")])
    _land(spark, events_dir, "b2", [(3, T[1], "r", "a", "rs", "U")])
    _land(spark, events_dir, "b3", [(4, T[2], "r", "b", None, "D")])
    cur, hist = _mk(spark, root)

    stats = []
    q = stream_scd2(spark, events_dir, cur, hist,
                    os.path.join(root, "ckpt"),
                    max_files_per_trigger=1, stats_sink=stats)
    q.awaitTermination(120)
    assert not q.isActive
    assert len(stats) == 3 and all(h.applied and c.applied
                                   for h, c in stats)
    assert _view(cur, hist) == {
        ("r", "a", T[0]): ("py", T[1], False),
        ("r", "a", T[1]): ("rs", None, True),
        ("r", "b", T[0]): ("c", T[2], False),  # closed by the delete
    }


def test_stream_scd2_restart_is_exactly_once(spark, tmp_path):
    root = str(tmp_path)
    events_dir = os.path.join(root, "in")
    _land(spark, events_dir, "b1", [(1, T[0], "r", "a", "py", "I")])
    _land(spark, events_dir, "b2", [(2, T[1], "r", "a", "rs", "U")])
    cur, hist = _mk(spark, root)
    ckpt = os.path.join(root, "ckpt")

    q = stream_scd2(spark, events_dir, cur, hist, ckpt,
                    max_files_per_trigger=1)
    while not q.recentProgress:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)

    q2 = stream_scd2(spark, events_dir, cur, hist, ckpt,
                     max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert not q2.isActive

    assert _view(cur, hist) == {
        ("r", "a", T[0]): ("py", T[1], False),
        ("r", "a", T[1]): ("rs", None, True),
    }
    # the replayed micro-batch hit the manifests, it did not double-apply:
    # every manifest key unique on both ledgers
    for t in (cur, hist):
        keys = list(t.current_snapshot().applied)
        assert len(keys) == len(set(keys))
