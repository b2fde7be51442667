"""HLL sketch-maintained approx distinct rollups (cdc/sketch_sync.py).

Pins: bootstrap + incremental rounds matching exact distinct-ever counts
at small cardinality (HLL sparse mode is exact there), distinct-ever
semantics under deletes and group moves, maintained-vs-one-shot estimate
parity plus a relative-error bound at 5k cardinality, round idempotence,
NULL values never counting, and the cursor-prefix guard.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.cdc.sketch_sync import create_sketch_table, \
    sync_aggregate_sketch
from etl_spark.lake import LakeTable

SRC_SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("g", StringType()),
    StructField("u", LongType()),
])
ROWS = "op string, k bigint, v bigint, g string, u bigint"


def _mk(spark, root):
    src = LakeTable.create(
        spark, os.path.join(root, "src"), SRC_SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=4,
    )
    dst = create_sketch_table(
        spark, os.path.join(root, "dst"),
        [StructField("g", StringType())], ["users"], n_buckets=2,
    )
    return src, dst


def _merge(spark, src, key, rows):
    src.merge(spark.createDataFrame(rows, ROWS), manifest_key=key)


def _sync(spark, src, dst):
    return sync_aggregate_sketch(
        src, dst, ["g"], {"users": F.col("u")},
    )


def _est(dst):
    return {r["g"]: r["users"] for r in dst.read().collect()}


def test_bootstrap_then_rounds_match_exact_distinct_ever(spark, tmp_root):
    src, dst = _mk(spark, tmp_root)
    _merge(spark, src, "e:0", [("I", k, 1, "a" if k % 2 else "b", k % 5)
                               for k in range(20)])
    _sync(spark, src, dst)  # bootstrap
    assert _est(dst) == {"a": 5, "b": 5}

    # round 2: new keys add users 5..7 to group a only
    _merge(spark, src, "e:1", [("I", 100 + i, 2, "a", 5 + i)
                               for i in range(3)])
    _sync(spark, src, dst)
    assert _est(dst) == {"a": 8, "b": 5}

    # caught up => no-op round
    assert _sync(spark, src, dst) is None


def test_distinct_ever_under_deletes_and_group_moves(spark, tmp_root):
    src, dst = _mk(spark, tmp_root)
    _merge(spark, src, "e:0", [("I", 1, 1, "a", 10), ("I", 2, 1, "a", 11),
                               ("I", 3, 1, "b", 12)])
    _sync(spark, src, dst)
    assert _est(dst) == {"a": 2, "b": 1}
    # delete one key; move another's row to group b with a new user
    _merge(spark, src, "e:1", [("D", 1, 2, None, None),
                               ("U", 2, 2, "b", 13)])
    _sync(spark, src, dst)
    # lifetime semantics: a keeps both users ever seen; b gains user 13;
    # no group ever tombstones
    assert _est(dst) == {"a": 2, "b": 2}


def test_null_values_never_count(spark, tmp_root):
    src, dst = _mk(spark, tmp_root)
    _merge(spark, src, "e:0", [("I", 1, 1, "a", None), ("I", 2, 1, "a", 7)])
    _sync(spark, src, dst)
    assert _est(dst) == {"a": 1}


def test_maintained_equals_one_shot_and_error_bound(spark, tmp_root):
    src, dst = _mk(spark, tmp_root)
    n = 5000
    # 3 rounds of inserts, distinct users 0..n-1 split across rounds
    for r in range(3):
        df = (
            spark.range(r * n // 3, (r + 1) * n // 3)
            .select(
                F.lit("I").alias("op"), F.col("id").alias("k"),
                F.lit(r).cast("long").alias("v"), F.lit("g").alias("g"),
                F.col("id").alias("u"),
            )
        )
        src.merge(df, manifest_key=f"e:{r}")
        _sync(spark, src, dst)
    maintained = _est(dst)["g"]
    one_shot = (
        src.read().groupBy("g")
        .agg(F.hll_sketch_estimate(
            F.hll_sketch_agg("u", F.lit(12))).alias("e"))
        .collect()[0]["e"]
    )
    # DataSketches HLL estimates are union-history-dependent (the HIP
    # accumulator), so maintained and one-shot need not be bit-equal —
    # but both must sit within the sketch's documented error envelope
    assert abs(maintained - one_shot) / n < 0.03
    assert abs(maintained - n) / n < 0.05
    assert abs(one_shot - n) / n < 0.05


def test_round_replay_is_idempotent(spark, tmp_root):
    src, dst = _mk(spark, tmp_root)
    _merge(spark, src, "e:0", [("I", 1, 1, "a", 1), ("I", 2, 1, "a", 2)])
    end = src.current_version()
    st = sync_aggregate_sketch(src, dst, ["g"], {"users": F.col("u")},
                               end_version=end)
    assert st.applied
    # crash-replay of the same round: manifest no-op, state unchanged
    st2 = sync_aggregate_sketch(src, dst, ["g"], {"users": F.col("u")},
                                end_version=end)
    assert st2 is None or not st2.applied
    assert _est(dst) == {"a": 2}


def test_guards(spark, tmp_root):
    src, _ = _mk(spark, tmp_root)
    plain = LakeTable.create(
        spark, os.path.join(tmp_root, "plain"),
        StructType([StructField("g", StringType()),
                    StructField("users", LongType()),
                    StructField("_src_version", LongType())]),
        key_cols=["g"], version_cols=["_src_version"], n_buckets=2,
    )
    with pytest.raises(ValueError, match="cursor prefix"):
        sync_aggregate_sketch(src, plain, ["g"], {"users": F.col("u")})
    dst = create_sketch_table(
        spark, os.path.join(tmp_root, "dst2"),
        [StructField("g", StringType())], ["users"], n_buckets=2,
    )
    with pytest.raises(ValueError, match="at least one"):
        sync_aggregate_sketch(src, dst, ["g"], {})


def test_stream_sketch_sync_follows_commits_and_resumes(spark, tmp_root):
    """Streaming face: stream_agg_sync(distinct_exprs=...) drives the
    sketch tier with the same no-checkpoint manifest-cursor resume."""
    from etl_spark.streaming import stream_agg_sync

    src, dst = _mk(spark, tmp_root)
    _merge(spark, src, "e:0", [("I", 1, 1, "a", 10), ("I", 2, 1, "b", 20)])
    it = stream_agg_sync(src, dst, ["g"],
                         distinct_exprs={"users": F.col("u")},
                         prefix="sketchsync", poll_interval=0.05)
    assert next(it).applied
    it.close()  # "kill" the consumer
    assert _est(dst) == {"a": 1, "b": 1}

    # two waves while down; restart folds them into one round
    _merge(spark, src, "e:1", [("I", 3, 2, "a", 11)])
    _merge(spark, src, "e:2", [("I", 4, 3, "a", 12), ("U", 2, 3, "b", 21)])
    it2 = stream_agg_sync(src, dst, ["g"],
                          distinct_exprs={"users": F.col("u")},
                          prefix="sketchsync", poll_interval=0.05)
    assert next(it2).applied
    it2.close()
    assert _est(dst) == {"a": 3, "b": 2}

    with pytest.raises(ValueError, match="exactly one"):
        next(stream_agg_sync(src, dst, ["g"],
                             sum_exprs={}, distinct_exprs={}))
