"""Incremental aggregate maintenance: change feed → materialized rollup
kept exactly equal to GROUP BY over upstream state (reference: aggregated
QA/summary tables re-derived per capture slice,
scripts/geral.py:92-109 + sisab/relatorio_validacao_producao/verificacao.py)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.cdc.agg_sync import create_aggregate_table, sync_aggregate
from etl_spark.lake import LakeTable

SCHEMA = ("event_id bigint, op_ts timestamp, repo string, path string, "
          "lang string, size bigint")
T0 = dt.datetime(2024, 1, 1)
def _sums():
    # Column construction needs an active SparkContext — build per test
    return {"sum_size": F.col("size")}


def _mk_src(spark, root, name="src", props=None):
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(SCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=4, props=props,
    )


def _merge(spark, t, key, rows):
    t.merge(spark.createDataFrame(rows, SCHEMA + ", op string"), key)


def _expected(src):
    return {
        r["lang"]: (r["n"], r["s"])
        for r in src.read().groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("size").alias("s")).collect()
    }


def _got(dst):
    return {
        r["lang"]: (r["n_rows"], r["sum_size"])
        for r in dst.read().collect()
    }


def test_agg_sync_bootstrap_incremental_moves_and_deletes(spark, tmp_root):
    src = _mk_src(spark, tmp_root, props={"compact_threshold": "2"})
    dst = create_aggregate_table(
        spark, os.path.join(tmp_root, "dst"), src,
        group_cols=["lang"], sum_names=["sum_size"], n_buckets=2,
    )

    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 10, "I"),
                               (2, T0, "r", "b", "py", 20, "I"),
                               (3, T0, "r", "c", "go", 5, "I")])
    st = sync_aggregate(src, dst, ["lang"], _sums())
    assert st.applied
    assert _got(dst) == _expected(src) == {"py": (2, 30), "go": (1, 5)}

    # caught up: no-op
    assert sync_aggregate(src, dst, ["lang"], _sums()) is None

    # update moves a key BETWEEN groups (py→rs) and resizes another;
    # a delete empties the 'go' group entirely
    _merge(spark, src, "e:1",
           [(4, T0 + dt.timedelta(minutes=1), "r", "a", "rs", 11, "U"),
            (5, T0 + dt.timedelta(minutes=1), "r", "b", "py", 25, "U"),
            (6, T0 + dt.timedelta(minutes=1), "r", "c", None, None, "D")])
    st2 = sync_aggregate(src, dst, ["lang"], _sums())
    assert st2.applied
    assert _got(dst) == _expected(src) == {"py": (1, 25), "rs": (1, 11)}
    # the emptied group is GONE (tombstoned), not a zero row
    assert "go" not in _got(dst)

    # crash-replay: re-merging the same round is a metadata no-op
    assert not dst.merge(
        spark.createDataFrame([], "lang string, n_rows bigint, "
                              "sum_size bigint, _src_version bigint, op string"),
        manifest_key=f"aggsync:{src.current_version()}").applied


def test_agg_sync_late_lww_loser_is_a_net_zero(spark, tmp_root):
    """A late event that LOSES the LWW race lands in the change feed but
    must not change the rollup: old and new snapshot reads see the same
    winner, so the contribution cancels exactly — while the cursor still
    advances (otherwise it would stall behind no-op commits forever)."""
    src = _mk_src(spark, tmp_root)
    dst = create_aggregate_table(
        spark, os.path.join(tmp_root, "dst"), src,
        group_cols=["lang"], sum_names=["sum_size"], n_buckets=2,
    )
    _merge(spark, src, "e:0",
           [(10, T0 + dt.timedelta(hours=1), "r", "a", "py", 10, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied

    _merge(spark, src, "e:1", [(1, T0, "r", "a", "go", 99, "U")])  # stale
    st = sync_aggregate(src, dst, ["lang"], _sums())
    assert st.applied                       # cursor advanced
    assert _got(dst) == {"py": (1, 10)}     # value untouched
    assert sync_aggregate(src, dst, ["lang"], _sums()) is None


def test_agg_sync_full_refresh_recovers_and_retracts_stale_groups(
        spark, tmp_root):
    src = _mk_src(spark, tmp_root, props={"compact_threshold": "999"})
    dst = create_aggregate_table(
        spark, os.path.join(tmp_root, "dst"), src,
        group_cols=["lang"], sum_names=["sum_size"], n_buckets=2,
    )
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 10, "I"),
                               (2, T0, "r", "b", "go", 5, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied

    # upstream deletes 'go' and inserts 'rs'; retention then drops the
    # cursor snapshot → incremental raises, full_refresh repairs — and
    # must RETRACT the now-empty 'go' group, not just upsert fresh ones
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "b", None, None, "D"),
            (4, T0 + dt.timedelta(minutes=2), "r", "d", "rs", 7, "I")])
    src.expire_snapshots(keep_last=1)
    with pytest.raises(RuntimeError, match="retention horizon"):
        sync_aggregate(src, dst, ["lang"], _sums())
    st = sync_aggregate(src, dst, ["lang"], _sums(), full_refresh=True)
    assert st.applied
    assert _got(dst) == _expected(src) == {"py": (1, 10), "rs": (1, 7)}


def test_agg_sync_negative_count_guard_fires(spark, tmp_root):
    """Out-of-band destination edits break the maintenance invariant; the
    next round that would drive a count negative must fail loudly, not
    publish a corrupt rollup."""
    src = _mk_src(spark, tmp_root)
    dst = create_aggregate_table(
        spark, os.path.join(tmp_root, "dst"), src,
        group_cols=["lang"], sum_names=["sum_size"], n_buckets=2,
    )
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 10, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied

    # out-of-band edit: zero out the maintained count behind sync's back
    dst.merge(spark.createDataFrame(
        [("py", 0, 0, 10_000)],
        "lang string, n_rows bigint, sum_size bigint, _src_version bigint")
        .withColumn("op", F.lit("U")), "oob:1")

    _merge(spark, src, "e:1",
           [(2, T0 + dt.timedelta(minutes=1), "r", "a", None, None, "D")])
    with pytest.raises(Exception, match="negative|ASSERT"):
        sync_aggregate(src, dst, ["lang"], _sums())


# ---- recompute variant: non-subtractable aggregates -------------------

def _aggs():
    return {"n": F.count("*"), "max_size": F.max("size"),
            "min_size": F.min("size")}


def _got_r(dst):
    return {r["lang"]: (r["n"], r["max_size"], r["min_size"])
            for r in dst.read().collect()}


def _expected_r(src):
    return {r["lang"]: (r["n"], r["max_size"], r["min_size"])
            for r in src.read().groupBy("lang").agg(
                F.count("*").alias("n"), F.max("size").alias("max_size"),
                F.min("size").alias("min_size")).collect()}


def test_recompute_tracks_minmax_when_extremum_leaves(spark, tmp_root):
    """The case the delta path refuses: the group's MAX row departs and
    the maintained value must FALL — only a recompute can know to what."""
    from etl_spark.cdc.agg_sync import create_rollup_table, sync_aggregate_recompute

    src = _mk_src(spark, tmp_root, props={"compact_threshold": "2"})
    dst = create_rollup_table(spark, os.path.join(tmp_root, "dst"), src,
                              group_cols=["lang"], agg_exprs=_aggs(),
                              n_buckets=2)
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 100, "I"),
                               (2, T0, "r", "b", "py", 20, "I"),
                               (3, T0, "r", "c", "go", 5, "I")])
    assert sync_aggregate_recompute(src, dst, ["lang"], _aggs()).applied
    assert _got_r(dst) == _expected_r(src) == {"py": (2, 100, 20),
                                               "go": (1, 5, 5)}
    assert sync_aggregate_recompute(src, dst, ["lang"], _aggs()) is None

    # the max row leaves py (moves to rs); go is emptied entirely
    _merge(spark, src, "e:1",
           [(4, T0 + dt.timedelta(minutes=1), "r", "a", "rs", 100, "U"),
            (5, T0 + dt.timedelta(minutes=1), "r", "c", None, None, "D")])
    assert sync_aggregate_recompute(src, dst, ["lang"], _aggs()).applied
    assert _got_r(dst) == _expected_r(src) == {"py": (1, 20, 20),
                                               "rs": (1, 100, 100)}
    assert "go" not in _got_r(dst)

    # exactly-once: replaying the same round is a metadata no-op
    assert not dst.merge(
        spark.createDataFrame([], "lang string, n bigint, max_size bigint, "
                              "min_size bigint, _src_version bigint, op string"),
        manifest_key=f"aggsync:{src.current_version()}").applied


def test_recompute_semijoin_fallback_matches_inlist_path(spark, tmp_root):
    """in_list_max=0 forces the null-safe semi-join fallback; the result
    must be identical to the IN-list (zone-map) path."""
    from etl_spark.cdc.agg_sync import create_rollup_table, sync_aggregate_recompute

    src = _mk_src(spark, tmp_root)
    paths = [os.path.join(tmp_root, d) for d in ("d1", "d2")]
    dsts = [create_rollup_table(spark, p, src, ["lang"], _aggs(),
                                n_buckets=2) for p in paths]
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 9, "I"),
                               (2, T0, "r", "b", "go", 4, "I")])
    for d in dsts:
        assert sync_aggregate_recompute(src, d, ["lang"], _aggs()).applied
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "a", "py", 1, "U")])
    assert sync_aggregate_recompute(src, dsts[0], ["lang"], _aggs()).applied
    assert sync_aggregate_recompute(src, dsts[1], ["lang"], _aggs(),
                                    in_list_max=0).applied
    assert _got_r(dsts[0]) == _got_r(dsts[1]) == _expected_r(src)


def test_recompute_null_group_is_an_ordinary_group(spark, tmp_root):
    """GROUP BY groups NULLs together; the IN-list path can't express
    IS NULL, so a null affected group must route through the null-safe
    semi join — and retraction of a vanished NULL group must not
    double-publish it."""
    from etl_spark.cdc.agg_sync import create_rollup_table, sync_aggregate_recompute

    src = _mk_src(spark, tmp_root)
    dst = create_rollup_table(spark, os.path.join(tmp_root, "dst"), src,
                              group_cols=["lang"], agg_exprs=_aggs(),
                              n_buckets=2)
    _merge(spark, src, "e:0", [(1, T0, "r", "a", None, 7, "I"),
                               (2, T0, "r", "b", "py", 3, "I")])
    assert sync_aggregate_recompute(src, dst, ["lang"], _aggs()).applied
    assert _got_r(dst) == _expected_r(src) == {None: (1, 7, 7),
                                               "py": (1, 3, 3)}
    # the null group's only row departs → the NULL group is retracted
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "a", "py", 7, "U")])
    assert sync_aggregate_recompute(src, dst, ["lang"], _aggs()).applied
    assert _got_r(dst) == _expected_r(src) == {"py": (2, 7, 3)}


def test_delta_agg_sync_null_group_read_modify_write(spark, tmp_root):
    """The delta path's read-modify-write must align a NULL group with its
    existing destination row (null-safe join), not insert a parallel row
    that LWW-collides with it."""
    src = _mk_src(spark, tmp_root)
    dst = create_aggregate_table(spark, os.path.join(tmp_root, "dst"), src,
                                 group_cols=["lang"],
                                 sum_names=["sum_size"], n_buckets=2)
    _merge(spark, src, "e:0", [(1, T0, "r", "a", None, 10, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied
    _merge(spark, src, "e:1",
           [(2, T0 + dt.timedelta(minutes=1), "r", "b", None, 5, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied
    assert _got(dst) == _expected(src) == {None: (2, 15)}


def test_recompute_retention_and_full_refresh(spark, tmp_root):
    from etl_spark.cdc.agg_sync import create_rollup_table, sync_aggregate_recompute

    src = _mk_src(spark, tmp_root, props={"compact_threshold": "999"})
    dst = create_rollup_table(spark, os.path.join(tmp_root, "dst"), src,
                              group_cols=["lang"], agg_exprs=_aggs(),
                              n_buckets=2)
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 10, "I"),
                               (2, T0, "r", "b", "go", 5, "I")])
    assert sync_aggregate_recompute(src, dst, ["lang"], _aggs()).applied
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "b", None, None, "D"),
            (4, T0 + dt.timedelta(minutes=2), "r", "d", "rs", 7, "I")])
    src.expire_snapshots(keep_last=1)
    with pytest.raises(RuntimeError, match="retention horizon"):
        sync_aggregate_recompute(src, dst, ["lang"], _aggs())
    st = sync_aggregate_recompute(src, dst, ["lang"], _aggs(),
                                  full_refresh=True)
    assert st.applied
    assert _got_r(dst) == _expected_r(src) == {"py": (1, 10, 10),
                                               "rs": (1, 7, 7)}
    assert "go" not in _got_r(dst)


def test_delta_agg_sync_all_null_measures_do_not_wipe_sum(spark, tmp_root):
    """Regression (round-4 ADVICE): a delta round whose changed rows all
    carry NULL measures used to sum to NULL and publish NULL over the
    maintained value, permanently wiping it. Semantics are documented as
    SUM(COALESCE(x, 0)): NULL contributes 0, all-NULL groups hold 0."""
    src = _mk_src(spark, tmp_root)
    dst = create_aggregate_table(
        spark, os.path.join(tmp_root, "dst"), src,
        group_cols=["lang"], sum_names=["sum_size"], n_buckets=2,
    )
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 10, "I"),
                               (2, T0, "r", "b", "py", None, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied
    assert _got(dst) == {"py": (2, 10)}

    # every changed row in this round has a NULL measure: the group's
    # maintained sum must survive unchanged (count grows by 1)
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "c", "py", None, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied
    assert _got(dst) == {"py": (3, 10)}

    # an all-NULL group bootstraps to 0 (not NULL) and stays maintainable
    _merge(spark, src, "e:2",
           [(4, T0 + dt.timedelta(minutes=2), "r", "d", "go", None, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied
    assert _got(dst) == {"py": (3, 10), "go": (1, 0)}
    _merge(spark, src, "e:3",
           [(5, T0 + dt.timedelta(minutes=3), "r", "e", "go", 4, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied
    assert _got(dst) == {"py": (3, 10), "go": (2, 4)}


def test_stream_agg_sync_follows_commits_and_resumes_after_kill(spark, tmp_root):
    """Streaming face of aggregate maintenance: same no-checkpoint resume
    contract as stream_sync — the cursor IS the destination's manifest."""
    from etl_spark.streaming import stream_agg_sync

    src = _mk_src(spark, tmp_root)
    dst = create_aggregate_table(
        spark, os.path.join(tmp_root, "dst"), src,
        group_cols=["lang"], sum_names=["sum_size"], n_buckets=2,
    )
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 10, "I"),
                               (2, T0, "r", "b", "go", 5, "I")])

    it = stream_agg_sync(src, dst, ["lang"], sum_exprs=_sums(),
                         poll_interval=0.05)
    assert next(it).applied
    it.close()  # "kill" the consumer
    assert _got(dst) == {"py": (1, 10), "go": (1, 5)}

    # two upstream waves while down; restart folds them into one round
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "a", "rs", 11, "U")])
    _merge(spark, src, "e:2",
           [(4, T0 + dt.timedelta(minutes=2), "r", "b", None, None, "D"),
            (5, T0 + dt.timedelta(minutes=3), "r", "c", "py", 7, "I")])
    it2 = stream_agg_sync(src, dst, ["lang"], sum_exprs=_sums(),
                          poll_interval=0.05)
    assert next(it2).applied
    it2.close()
    assert _got(dst) == _expected(src) == {"rs": (1, 11), "py": (1, 7)}

    # caught up: a stop-gated loop exits without yielding
    done = {"n": 0}

    def stop():
        done["n"] += 1
        return done["n"] > 2

    assert list(stream_agg_sync(src, dst, ["lang"], sum_exprs=_sums(),
                                poll_interval=0.01, stop=stop)) == []


def test_stream_agg_sync_recompute_tier_and_arg_validation(spark, tmp_root):
    from etl_spark.cdc.agg_sync import create_rollup_table
    from etl_spark.streaming import stream_agg_sync

    src = _mk_src(spark, tmp_root)
    aggs = {"max_size": F.max("size")}
    dst = create_rollup_table(
        spark, os.path.join(tmp_root, "dst"), src,
        group_cols=["lang"], agg_exprs=aggs, n_buckets=2,
    )
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 10, "I"),
                               (2, T0, "r", "b", "py", 4, "I")])
    it = stream_agg_sync(src, dst, ["lang"], agg_exprs=aggs,
                         poll_interval=0.05)
    assert next(it).applied
    it.close()
    assert {r["lang"]: r["max_size"] for r in dst.read().collect()} == \
        {"py": 10}
    # MAX shrinks when the extremum leaves — the recompute tier must see it
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "a", None, None, "D")])
    it2 = stream_agg_sync(src, dst, ["lang"], agg_exprs=aggs,
                          poll_interval=0.05)
    assert next(it2).applied
    it2.close()
    assert {r["lang"]: r["max_size"] for r in dst.read().collect()} == \
        {"py": 4}

    with pytest.raises(ValueError, match="exactly one"):
        next(stream_agg_sync(src, dst, ["lang"]))
    with pytest.raises(ValueError, match="exactly one"):
        next(stream_agg_sync(src, dst, ["lang"], sum_exprs=_sums(),
                             agg_exprs=aggs))


def test_agg_sync_survives_upstream_rebucket_mid_feed(spark, tmp_root):
    """The delta path prunes OLD-snapshot reads with the old layout's
    bucket hash and NEW-snapshot reads with the new one (_changed_buckets
    hashes per snapshot); an upstream rebucket between rounds must not
    corrupt the maintained rollup."""
    src = _mk_src(spark, tmp_root)
    dst = create_aggregate_table(
        spark, os.path.join(tmp_root, "dst"), src,
        group_cols=["lang"], sum_names=["sum_size"], n_buckets=2,
    )
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "py", 10, "I"),
                               (2, T0, "r", "b", "go", 5, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied
    assert _got(dst) == _expected(src) == {"py": (1, 10), "go": (1, 5)}

    src.rebucket(16)
    # a move between groups + fresh rows under the new layout: the delta
    # needs old rows (old layout, 4 buckets) AND new rows (16 buckets)
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "a", "rs", 11, "U"),
            (4, T0 + dt.timedelta(minutes=2), "r", "c", "py", 7, "I")])
    assert sync_aggregate(src, dst, ["lang"], _sums()).applied
    assert _got(dst) == _expected(src) == \
        {"rs": (1, 11), "py": (1, 7), "go": (1, 5)}
