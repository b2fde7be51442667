"""Budget-bounded compaction planning (lake/planner.py): ranking by
read amplification, byte budgets, progress guarantee, execution."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import LakeTable, plan_compaction

SCHEMA = "event_id bigint, op_ts timestamp, seq bigint, repo string, body string"
TS = dt.datetime(2024, 1, 1)


def _table(spark, tmp_root, **props):
    return LakeTable.create(
        spark, os.path.join(tmp_root, "t"), StructType.fromDDL(SCHEMA),
        key_cols=["repo"], version_cols=["op_ts", "seq"],
        n_buckets=4, props={"compact_threshold": "100", **props},
    )


def _wave(spark, lo, hi, bump, body="x"):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.lit(TS) + F.make_interval(secs=F.col("id") + bump)).alias("op_ts"),
        (F.col("id") + bump).alias("seq"),
        F.concat(F.lit("r"), F.col("id")).alias("repo"),
        F.lit(body).alias("body"),
        F.lit("I").alias("op"),
    )


def _gens(snap, b):
    return len({f.split("/", 2)[1] for f in snap.buckets[b]})


def test_ranking_budget_and_progress(spark, tmp_root):
    t = _table(spark, tmp_root)
    # 3 generations everywhere...
    for i in range(3):
        t.merge(_wave(spark, 0, 400, bump=i * 10_000), f"e{i}")
    snap = t.current_snapshot()
    # ...then make some buckets dirtier: two more generations restricted
    # to the keys of the two lowest bucket ids
    for i in range(3, 5):
        extra = (
            _wave(spark, 0, 400, bump=i * 10_000)
            .withColumn("__b", t.bucket_expr(snap))
            .filter(F.col("__b") <= 1).drop("__b")
        )
        t.merge(extra, f"e{i}")
    snap = t.current_snapshot()
    hot = [b for b in snap.buckets if _gens(snap, b) == 5]
    cold = [b for b in snap.buckets if _gens(snap, b) == 3]
    assert hot and cold, {b: _gens(snap, b) for b in snap.buckets}

    # unbounded: every dirty bucket, hottest first
    full = plan_compaction(t)
    assert full.total_dirty == 4 and full.skipped == 0
    assert set(full.buckets[:len(hot)]) == set(hot)

    # tight budget: progress guarantee plans at least the hottest bucket
    one = plan_compaction(t, budget_bytes=1)
    assert len(one.buckets) == 1 and one.buckets[0] in hot
    assert one.skipped == 3

    # generous budget: everything fits; planned_bytes tracks real sizes
    sizes = {r["bucket"]: r["bytes"]
             for r in t.meta("partitions").collect()}
    lots = plan_compaction(t, budget_bytes=sum(sizes.values()))
    assert set(lots.buckets) == set(snap.buckets)
    assert lots.planned_bytes == sum(sizes.values())

    # executing the tight plan compacts exactly that bucket
    assert t.compact(buckets=one.buckets) == 1
    snap2 = t.current_snapshot()
    assert len(snap2.buckets[one.buckets[0]]) == 1
    # and the planner no longer proposes it
    assert one.buckets[0] not in plan_compaction(t).buckets
    # incremental loop drains the dirty set to empty
    while (p := plan_compaction(t, budget_bytes=1)):
        t.compact(buckets=p.buckets)
    assert not plan_compaction(t)
    assert all(len(fl) == 1 for fl in t.current_snapshot().buckets.values())
    # data survived the whole loop
    assert t.read().count() == 400


def test_min_generations_floor(spark, tmp_root):
    t = _table(spark, tmp_root)
    t.merge(_wave(spark, 0, 100, 0), "e0")
    t.merge(_wave(spark, 0, 100, 10_000), "e1")
    assert plan_compaction(t).total_dirty == 4          # 2 gens everywhere
    assert plan_compaction(t, min_generations=3).total_dirty == 0


def test_nonunique_always_dirty(spark, tmp_root):
    t = _table(spark, tmp_root, batch_dedup="false")
    t.merge(_wave(spark, 0, 50, 0), "e0")
    snap = t.current_snapshot()
    assert snap.nonunique, "write-optimized merge must flag raw files"
    # single generation, but raw files force the resolving aggregate —
    # the planner must still propose them
    plan = plan_compaction(t, min_generations=99)
    assert plan.total_dirty > 0
    t.compact(buckets=plan.buckets)
    assert not t.current_snapshot().nonunique or \
        plan_compaction(t, min_generations=99).total_dirty == 0


def test_pending_rescale_buckets_left_for_their_step(spark, tmp_root):
    """Mid-rescale, a dirty bucket the watermark has not reached is NOT
    planned: its migration step LWW-folds it anyway, so compacting it
    first is the same rewrite paid twice. Migrated children still plan."""
    t = _table(spark, tmp_root)
    t.merge(_wave(spark, 0, 400, 0), "w:0")
    t.merge(_wave(spark, 0, 400, 1000), "w:1")   # every bucket dirty
    assert sorted(plan_compaction(t).buckets) == [0, 1, 2, 3]
    t.start_rescale(8)
    t.rescale_step()  # watermark 1: bucket 0 split into children {0, 4}
    t.merge(_wave(spark, 0, 400, 2000), "w:2")   # dirties children too
    planned = set(plan_compaction(t).buckets)
    assert not planned & {1, 2, 3}, planned       # pending: left alone
    assert planned and planned <= {0, 4}          # children plan normally
    while t.rescale_status():
        t.rescale_step(max_buckets=9)
    # steady state again: everything dirty is plannable
    t.merge(_wave(spark, 0, 400, 3000), "w:3")
    assert len(plan_compaction(t).buckets) > 0
