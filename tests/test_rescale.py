"""Incremental bucket rescale (LakeTable.start_rescale / rescale_step):
layout growth without an O(table) rewrite, correct under concurrent
merges, lookups, change feeds and staged commits mid-flight.

Reference analogue: the reference re-partitions a loader's target by
re-creating the table and re-capturing (impulsoetl's periodicity tables
are static); Iceberg's partition-spec evolution is the lake-native model
this follows — old data stays under the old layout while maintenance
migrates it bucket by bucket."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.cdc import synth_events, write_event_epochs
from etl_spark.cdc.oracle import oracle_final_state
from etl_spark.lake import LakeTable
from etl_spark.lake.table import CommitConflict


def _user_schema(spark, events_dir) -> StructType:
    sample = spark.read.parquet(events_dir)
    return StructType(
        [f for f in sample.schema.fields if f.name not in ("op", "epoch")])


def _state(table) -> pd.DataFrame:
    return (
        table.read()
        .select("event_id", "op_ts", "repo", "path", "commit", "lang",
                "content")
        .orderBy("repo", "path")
        .toPandas()
        .reset_index(drop=True)
    )


def _mk(spark, tmp_root, name, events_dir, n_buckets=4, props=None):
    return LakeTable.create(
        spark, os.path.join(tmp_root, name), _user_schema(spark, events_dir),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=n_buckets, props=props or {},
    )


@pytest.fixture()
def wal(spark, tmp_root):
    events_dir = os.path.join(tmp_root, "wal")
    ev = synth_events(spark, 2400, n_repos=20, paths_per_repo=20, n_epochs=6)
    write_event_epochs(ev, events_dir)
    return events_dir


def _epoch(spark, events_dir, e):
    return spark.read.parquet(os.path.join(events_dir, f"epoch={e}"))


def test_grow_with_interleaved_merges_matches_oracle(spark, tmp_root, wal):
    t = _mk(spark, tmp_root, "grow", wal, n_buckets=4)
    t.merge(_epoch(spark, wal, 0), "epoch:0")
    t.merge(_epoch(spark, wal, 1), "epoch:1")

    t.start_rescale(8)
    assert t.rescale_status() == {
        "from_buckets": 4, "to_buckets": 8, "watermark": 0, "remaining": 4}

    # merges interleave with migration steps: routing must agree at
    # every watermark position
    t.merge(_epoch(spark, wal, 2), "epoch:2")
    assert t.rescale_step()["watermark"] == 1
    t.merge(_epoch(spark, wal, 3), "epoch:3")
    assert t.rescale_step(max_buckets=2)["watermark"] == 3
    t.merge(_epoch(spark, wal, 4), "epoch:4")
    last = t.rescale_step(max_buckets=99)
    assert last["done"] and t.rescale_status() is None
    t.merge(_epoch(spark, wal, 5), "epoch:5")

    snap = t.current_snapshot()
    assert snap.n_buckets == 8 and snap.rescale_to is None
    want = oracle_final_state(wal).reset_index(drop=True)
    pd.testing.assert_frame_equal(_state(t), want, check_dtype=False)

    # every row physically sits in the bucket the new layout routes to
    stored = t.read(with_meta=True)
    mis = (
        t.spark.read.schema(t._full_schema(snap))
        .parquet(*[os.path.join(t.path, f)
                   for fl in snap.buckets.values() for f in fl])
    )
    # (re-derive per-file bucket from path and compare with the hash)
    for b, fl in snap.buckets.items():
        got = t._read_files(snap, fl).select(
            F.pmod(F.xxhash64("repo", "path"), F.lit(8)).cast("int")
            .alias("h")).distinct().collect()
        assert {r["h"] for r in got} <= {b}
    assert stored.count() == len(want)
    assert mis.count() >= len(want)


def test_tombstone_suppression_across_split(spark, tmp_root, wal):
    t = _mk(spark, tmp_root, "tomb", wal, n_buckets=2)
    ins = spark.createDataFrame(
        [("r", "p", 10, 1, "c0", "x", "body", "I")],
        "repo string, path string, op_ts long, event_id long, "
        "commit string, lang string, content string, op string")
    t.merge(ins, "m:0")
    t.merge(ins.withColumn("op_ts", F.lit(20)).withColumn("op", F.lit("D")),
            "m:1")
    t.start_rescale(4)
    while t.rescale_status():
        t.rescale_step()
    # late event older than the applied delete must still lose AFTER the
    # key migrated to its child bucket
    t.merge(ins.withColumn("op_ts", F.lit(15)), "m:2")
    assert t.read().count() == 0
    assert t.lookup([("r", "p")]).count() == 0


def test_lookup_routes_mid_flight(spark, tmp_root, wal):
    t = _mk(spark, tmp_root, "route", wal, n_buckets=4)
    t.merge(_epoch(spark, wal, 0), "epoch:0")
    t.start_rescale(16)
    t.rescale_step(max_buckets=2)

    snap = t.current_snapshot()
    assert snap.rescale_watermark == 2
    keys = [(r["repo"], r["path"])
            for r in t.read().select("repo", "path").limit(20).collect()]
    looked = {(r["repo"], r["path"]) for r in
              t.lookup(keys).select("repo", "path").collect()}
    assert looked == set(keys)
    # routing agreement: reading exactly the routed bucket finds the key
    for repo, path in keys[:5]:
        b = (spark.createDataFrame([(repo, path)], "repo string, path string")
             .select(t.bucket_expr(snap).alias("b")).collect()[0]["b"])
        hit = (t.read(buckets=[b])
               .filter((F.col("repo") == repo) & (F.col("path") == path)))
        assert hit.count() == 1


def test_budget_progress_and_free_empty_buckets(spark, tmp_root):
    schema = StructType.fromDDL(
        "repo string, path string, op_ts long, event_id long, v string")
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "budget"), schema,
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=8)
    # one key only => 7 of 8 buckets empty
    t.merge(spark.createDataFrame(
        [("r", "p", 1, 1, "x", "I")],
        "repo string, path string, op_ts long, event_id long, v string, "
        "op string"), "m:0")
    t.start_rescale(16)
    nonempty = sorted(t.current_snapshot().buckets)
    assert len(nonempty) == 1
    # a 1-byte budget still takes the first pending bucket (progress
    # guarantee) and empty buckets advance the watermark for free
    steps = 0
    while t.rescale_status():
        r = t.rescale_step(max_buckets=1, budget_bytes=1)
        steps += 1
        assert len(r["split"]) <= 1
    assert steps <= 2  # empties are free: at most one data step + finalize
    assert t.current_snapshot().n_buckets == 16
    assert t.read().count() == 1


def test_shrink_is_metadata_only(spark, tmp_root, wal):
    t = _mk(spark, tmp_root, "shrink", wal, n_buckets=8,
            props={"compact_threshold": "999"})
    for e in range(6):
        t.merge(_epoch(spark, wal, e), f"epoch:{e}")
    before = sorted(f for fl in t.current_snapshot().buckets.values()
                    for f in fl)
    want = _state(t)
    t.start_rescale(2)
    snap = t.current_snapshot()
    assert snap.n_buckets == 2 and snap.rescale_to is None
    after = sorted(f for fl in snap.buckets.values() for f in fl)
    assert after == before          # zero data I/O: same files, re-listed
    assert sorted(snap.buckets) == [0, 1]
    pd.testing.assert_frame_equal(_state(t), want, check_dtype=False)
    # compaction folds the merged file lists under the new layout
    t.compact()
    snap2 = t.current_snapshot()
    assert max(len(fl) for fl in snap2.buckets.values()) == 1
    pd.testing.assert_frame_equal(_state(t), want, check_dtype=False)


def test_refusals(spark, tmp_root, wal):
    t = _mk(spark, tmp_root, "refuse", wal, n_buckets=4)
    t.merge(_epoch(spark, wal, 0), "epoch:0")
    with pytest.raises(ValueError, match="integer multiple"):
        t.start_rescale(6)
    with pytest.raises(ValueError, match="divisor"):
        t.start_rescale(3)
    with pytest.raises(ValueError, match="already has"):
        t.start_rescale(4)
    with pytest.raises(ValueError, match="no rescale in flight"):
        t.rescale_step()
    t.start_rescale(8)
    with pytest.raises(ValueError, match="already in flight"):
        t.start_rescale(16)
    with pytest.raises(ValueError, match="in\\s+flight"):
        t.rebucket(16)
    # co-bucketed join refuses a mid-rescale side
    from etl_spark.lake.spj import cobucket_join

    t2 = _mk(spark, tmp_root, "refuse2", wal, n_buckets=4)
    t2.merge(_epoch(spark, wal, 0), "epoch:0")
    with pytest.raises(ValueError, match="mid-rescale"):
        cobucket_join(t, t2)
    # bootstrap refuses mid-rescale
    from etl_spark.cdc.bootstrap import bootstrap_snapshot

    with pytest.raises(ValueError, match="rescale"):
        bootstrap_snapshot(t, t2.read())
    while t.rescale_status():
        t.rescale_step(max_buckets=99)
    # ... and start_rescale refuses while a bootstrap floor is set
    t.alter_props({"bootstrap_floor": "bs1"})
    with pytest.raises(ValueError, match="bootstrap"):
        t.start_rescale(16)
    t.alter_props({"bootstrap_floor": None})


def test_staged_commit_refuses_rebase_across_step(spark, tmp_root, wal):
    t = _mk(spark, tmp_root, "wap", wal, n_buckets=4)
    t.merge(_epoch(spark, wal, 0), "epoch:0")
    t.start_rescale(8)
    staged = t.merge_staged(_epoch(spark, wal, 1), "epoch:1")
    t.rescale_step()  # layout changed under the staged commit
    with pytest.raises(CommitConflict, match="layout changed"):
        staged.publish()
    staged.abort()
    # re-staging against the stepped layout publishes fine
    staged2 = t.merge_staged(_epoch(spark, wal, 1), "epoch:1")
    assert staged2.publish().applied
    while t.rescale_status():
        t.rescale_step(max_buckets=99)
    got = _state(t)
    ref = _mk(spark, tmp_root, "wap_ref", wal, n_buckets=8)
    ref.merge(_epoch(spark, wal, 0), "epoch:0")
    ref.merge(_epoch(spark, wal, 1), "epoch:1")
    pd.testing.assert_frame_equal(got, _state(ref), check_dtype=False)


def test_patch_table_children_stay_resolving(spark, tmp_root):
    schema = StructType.fromDDL(
        "k string, op_ts long, event_id long, a string, b string")
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "patch"), schema, key_cols=["k"],
        version_cols=["op_ts", "event_id"], n_buckets=2,
        props={"update_semantics": "patch"})
    ddl = ("k string, op_ts long, event_id long, a string, b string, "
           "op string")
    t.merge(spark.createDataFrame(
        [("k1", 1, 1, "a1", "b1", "I"), ("k2", 1, 2, "a2", "b2", "I")],
        ddl), "m:0")
    # partial update: only column a; b must survive the rescale fold
    t.merge(spark.createDataFrame(
        [("k1", 2, 3, "a1x", None, "I")], ddl), "m:1")
    t.start_rescale(4)
    while t.rescale_status():
        t.rescale_step(max_buckets=99)
    snap = t.current_snapshot()
    files = {f for fl in snap.buckets.values() for f in fl}
    assert files and files <= set(snap.nonunique)  # partial rows resolve
    rows = {(r["k"], r["a"], r["b"]) for r in t.read().collect()}
    assert rows == {("k1", "a1x", "b1"), ("k2", "a2", "b2")}
    # a LATE partial older than the fold still loses per column
    t.merge(spark.createDataFrame([("k1", 0, 9, "stale", "bz", "I")], ddl),
            "m:2")
    rows = {(r["k"], r["a"], r["b"]) for r in t.read().collect()}
    assert rows == {("k1", "a1x", "b1"), ("k2", "a2", "b2")}


def test_change_feed_skips_migration_commits(spark, tmp_root, wal):
    t = _mk(spark, tmp_root, "feed", wal, n_buckets=4)
    t.merge(_epoch(spark, wal, 0), "epoch:0")
    v0 = t.current_version()
    t.start_rescale(8)
    while t.rescale_status():
        t.rescale_step()
    v1 = t.current_version()
    # migration rewrites rows, it does not change them: nothing to emit
    assert t.changes(v0, v1).count() == 0
    t.merge(_epoch(spark, wal, 1), "epoch:1")
    assert t.changes(v1).count() > 0


def test_rescale_state_survives_reload(spark, tmp_root, wal):
    t = _mk(spark, tmp_root, "reload", wal, n_buckets=4)
    t.merge(_epoch(spark, wal, 0), "epoch:0")
    t.start_rescale(8)
    t.rescale_step()
    t2 = LakeTable.load(spark, t.path)
    assert t2.rescale_status() == {
        "from_buckets": 4, "to_buckets": 8, "watermark": 1, "remaining": 3}
    # ops surface: the in-flight state shows in the snapshots meta table
    cur = [r for r in t2.meta("snapshots").collect()
           if r["version"] == t2.current_version()][0]
    assert (cur["rescale_to"], cur["rescale_watermark"]) == (8, 1)
    while t2.rescale_status():
        t2.rescale_step(max_buckets=99)
    ref = _mk(spark, tmp_root, "reload_ref", wal, n_buckets=8)
    ref.merge(_epoch(spark, wal, 0), "epoch:0")
    pd.testing.assert_frame_equal(_state(t2), _state(ref),
                                  check_dtype=False)


def test_auto_compaction_skips_pending_buckets(spark, tmp_root, wal):
    """Merge's threshold follow-up must not fold a bucket its migration
    step is about to fold anyway (explicit compact(buckets=...) still
    may — purge cannot wait for the watermark)."""
    t = _mk(spark, tmp_root, "autoskip", wal, n_buckets=4,
            props={"compact_threshold": "2"})
    t.merge(_epoch(spark, wal, 0), "epoch:0")
    t.start_rescale(8)
    for e in range(1, 5):
        t.merge(_epoch(spark, wal, e), f"epoch:{e}")
    snap = t.current_snapshot()
    gens = {b: len({f.split("/", 2)[1] for f in fl})
            for b, fl in snap.buckets.items() if fl}
    assert max(gens.values()) > 2  # past threshold, yet NOT auto-folded
    # the step folds them, and post-rescale auto-compaction resumes
    while t.rescale_status():
        t.rescale_step(max_buckets=99)
    snap2 = t.current_snapshot()
    assert max(len({f.split("/", 2)[1] for f in fl})
               for fl in snap2.buckets.values() if fl) == 1
