"""M3: Structured Streaming replay — bounded drain equals the oracle;
crash/restart from checkpoint converges with exactly-once manifests."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql.types import StructType

from etl_spark.cdc import synth_events, write_event_epochs
from etl_spark.cdc.oracle import oracle_final_state
from etl_spark.lake import LakeTable
from etl_spark.metrics import MetricsSink
from etl_spark.streaming import stream_replay


def _mk_table(spark, events_dir, path, n_buckets=8):
    sample = spark.read.parquet(events_dir)
    user = StructType(
        [f for f in sample.schema.fields if f.name not in ("op", "epoch")]
    )
    return LakeTable.create(
        spark, path, user, key_cols=["repo", "path"],
        version_cols=["op_ts", "event_id"], n_buckets=n_buckets,
    )


def _state(table) -> pd.DataFrame:
    return (
        table.read()
        .select("event_id", "op_ts", "repo", "path", "commit", "lang", "content")
        .orderBy("repo", "path")
        .toPandas()
        .reset_index(drop=True)
    )


def test_stream_drain_matches_oracle(spark, tmp_root):
    events_dir = os.path.join(tmp_root, "wal")
    ev = synth_events(spark, 2500, n_repos=20, paths_per_repo=20, n_epochs=5)
    write_event_epochs(ev, events_dir)
    table = _mk_table(spark, events_dir, os.path.join(tmp_root, "tbl"))
    sink = MetricsSink(os.path.join(tmp_root, "metrics"))

    q = stream_replay(
        spark, events_dir, table, os.path.join(tmp_root, "ckpt"),
        max_files_per_trigger=2, metrics_sink=sink,
    )
    q.awaitTermination(120)
    assert not q.isActive

    want = oracle_final_state(events_dir).reset_index(drop=True)
    pd.testing.assert_frame_equal(_state(table), want, check_dtype=False)
    assert len(sink.rows()) >= 2  # several micro-batches were applied
    assert all(r["applied"] for r in sink.rows())


def test_stream_restart_resumes_and_is_exactly_once(spark, tmp_root):
    events_dir = os.path.join(tmp_root, "wal")
    ev = synth_events(spark, 2000, n_repos=15, paths_per_repo=15, n_epochs=4)
    write_event_epochs(ev, events_dir)
    table = _mk_table(spark, events_dir, os.path.join(tmp_root, "tbl"))
    ckpt = os.path.join(tmp_root, "ckpt")

    # First run: drain only part of the WAL (stop after the first batch).
    q = stream_replay(spark, events_dir, table, ckpt, max_files_per_trigger=1)
    while not q.recentProgress:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)
    applied_before = set(table.applied_manifests())
    assert applied_before  # at least one micro-batch landed

    # Restart from the checkpoint: drains the rest; already-applied batch
    # ids (replayed by the source after an unclean stop) hit the manifest.
    q2 = stream_replay(spark, events_dir, table, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert not q2.isActive

    want = oracle_final_state(events_dir).reset_index(drop=True)
    pd.testing.assert_frame_equal(_state(table), want, check_dtype=False)

    # Exactly-once ledger: every manifest key is unique.
    keys = list(table.current_snapshot().applied)
    assert len(keys) == len(set(keys))


def test_windowed_agg_with_watermark(spark, tmp_root):
    """Streaming tumbling-window aggregation with an event-time watermark
    drains to the same result as the batch windowed aggregate."""
    import pandas as pd
    from pyspark.sql import functions as F

    events_dir = os.path.join(tmp_root, "wal")
    write_event_epochs(
        synth_events(spark, 2000, n_repos=10, paths_per_repo=10, n_epochs=3),
        events_dir,
    )
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("op_ts", "10 minutes")
        .groupBy(F.window("op_ts", "5 minutes"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "op", "n")
    )
    out_dir = os.path.join(tmp_root, "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp_root, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    got = spark.read.parquet(out_dir)
    want = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("op_ts", "5 minutes"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "op", "n")
    )
    # The synthetic stream is heavily out-of-order (op_ts decoupled from
    # arrival), so rows later than the 10-minute watermark are *correctly*
    # dropped: every finalized window exists in the batch result with a
    # count <= the batch count (equality iff no late drops in that window).
    g = {(r["ws"], r["op"]): r["n"] for r in got.collect()}
    w = {(r["ws"], r["op"]): r["n"] for r in want.collect()}
    assert g
    assert all(k in w and v <= w[k] for k, v in g.items())
    assert len(g) >= len(w) * 0.5


def test_wiped_checkpoint_does_not_collide_with_old_manifests(spark, tmp_root):
    """Regression: manifest keys are namespaced per stream identity. A
    restart with a NEW checkpoint dir restarts batch ids at 0 with
    different file groupings; under un-namespaced 'stream:<n>' keys those
    batches hit the old manifest entries and their rows were silently
    dropped. Namespaced keys re-apply them (LWW-idempotent), so the final
    state still matches the oracle."""
    events_dir = os.path.join(tmp_root, "wal")
    ev = synth_events(spark, 1500, n_repos=12, paths_per_repo=12, n_epochs=3)
    write_event_epochs(ev, events_dir)
    table = _mk_table(spark, events_dir, os.path.join(tmp_root, "tbl"))

    # first run: drain PART of the WAL under checkpoint A (coarse batches)
    q = stream_replay(spark, events_dir, table, os.path.join(tmp_root, "ckptA"),
                      max_files_per_trigger=1)
    while not q.recentProgress:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)
    assert table.applied_manifests()

    # "operator wiped the checkpoint": same WAL, fresh checkpoint dir,
    # different batch sizing => batch ids restart with new groupings
    q2 = stream_replay(spark, events_dir, table, os.path.join(tmp_root, "ckptB"),
                       max_files_per_trigger=4)
    q2.awaitTermination(120)
    assert not q2.isActive

    want = oracle_final_state(events_dir).reset_index(drop=True)
    pd.testing.assert_frame_equal(_state(table), want, check_dtype=False)


def test_follow_changes_tails_commits(spark, tmp_root):
    """CDC-out tail: follow_changes yields each commit range's added rows
    (tombstones tagged 'D'), surviving interleaved auto-compaction."""
    import datetime as dt

    from etl_spark.streaming import follow_changes

    schema = StructType.fromDDL(
        "event_id bigint, op_ts timestamp, repo string, path string, content string"
    )
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "cfeed"), schema,
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=1, props={"compact_threshold": "2"},
    )
    ts = dt.datetime(2024, 1, 1)

    def b(i, op="I", content="v"):
        return spark.createDataFrame(
            [(i, ts + dt.timedelta(seconds=i), "r", f"p{i % 3}",
              None if op == "D" else f"{content}{i}", op)],
            "event_id bigint, op_ts timestamp, repo string, path string, "
            "content string, op string")

    feed = follow_changes(t, from_version=0, poll_interval=0.01)

    t.merge(b(0), "e:0")   # committed before each next() => yields at once
    v, df = next(feed)
    assert v == t.current_version()
    assert {(r["path"], r["_op"]) for r in df.collect()} == {("p0", "U")}

    # several commits (incl. auto-compaction) land before the next poll:
    # they arrive as one batch, delete visible as 'D'
    t.merge(b(1), "e:1")
    t.merge(b(2), "e:2")               # threshold crossed => compaction too
    t.merge(b(3, op="D"), "e:3")
    v, df = next(feed)
    assert v == t.current_version()
    got = {(r["event_id"], r["_op"]) for r in df.collect()}
    assert got == {(1, "U"), (2, "U"), (3, "D")}


def test_stream_checkpoint_rebuilt_at_same_path_does_not_skip_batches(
    spark, tmp_root
):
    """Regression (round-4 ADVICE): stream_id used to be a hash of the
    checkpoint PATH, so deleting and recreating the checkpoint restarted
    batch ids at 0 under the SAME manifest prefix — the old per-prefix
    watermark silently swallowed every new micro-batch numbered below it.
    The id is now salted with a marker persisted inside the checkpoint:
    a rebuilt checkpoint gets a fresh prefix and its batches apply."""
    import shutil

    from pyspark.sql import functions as F

    from etl_spark.streaming.identity import stream_identity

    events_dir = os.path.join(tmp_root, "wal")
    ev = synth_events(spark, 1200, n_repos=10, paths_per_repo=10, n_epochs=3)
    write_event_epochs(ev, events_dir)
    table = _mk_table(spark, events_dir, os.path.join(tmp_root, "tbl"))
    ckpt = os.path.join(tmp_root, "ckpt")

    q = stream_replay(spark, events_dir, table, ckpt, max_files_per_trigger=1)
    q.awaitTermination(120)
    assert not q.isActive
    id_before = stream_identity(ckpt)

    # checkpoint lost and rebuilt at the same path; meanwhile the WAL
    # grew a revision wave the first incarnation never saw
    shutil.rmtree(ckpt)
    late_dir = os.path.join(tmp_root, "wal_late")
    late = (
        spark.read.parquet(events_dir)
        .where(F.col("op") != "D")
        .groupBy("repo", "path")
        .agg(F.max(F.struct("op_ts", "event_id")).alias("w"))
        .select(
            (F.col("w.event_id") + 1_000_000).alias("event_id"),
            F.lit("U").alias("op"),
            F.timestamp_add("HOUR", F.lit(1), F.col("w.op_ts")).alias("op_ts"),
            "repo", "path",
            F.lit("late-commit").alias("commit"),
            F.lit("late").alias("lang"),
            F.lit("late-content").alias("content"),
        )
        .limit(5)
        .localCheckpoint(eager=True)
    )
    late_rows = late.count()
    assert late_rows > 0
    # the WAL is hive-partitioned by epoch: the new wave lands as a new
    # epoch directory, exactly like write_event_epochs would
    late.write.mode("append").parquet(os.path.join(events_dir, "epoch=99"))

    q2 = stream_replay(spark, events_dir, table, ckpt, max_files_per_trigger=8)
    q2.awaitTermination(120)
    assert not q2.isActive
    assert stream_identity(ckpt) != id_before  # fresh incarnation id

    got_late = table.read().where(F.col("lang") == "late").count()
    assert got_late == late_rows, (
        f"rebuilt checkpoint skipped micro-batches: expected {late_rows} "
        f"late rows, got {got_late}"
    )
    # and the full state still equals the LWW oracle over the grown WAL
    want = oracle_final_state(events_dir).reset_index(drop=True)
    pd.testing.assert_frame_equal(_state(table), want, check_dtype=False)
