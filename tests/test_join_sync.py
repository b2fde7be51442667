"""Incremental join-view maintenance (cdc/join_sync.py): a denormalized
fact⋈dim destination kept exactly equal to the LEFT join of both
upstreams' current states as either side changes (reference: dimension
enrichment at capture time, comum/geografias.py + comum/datas.py, re-run
per slice — here maintained incrementally from two change feeds)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql.types import StructType

from etl_spark.cdc.join_sync import create_join_table, sync_join
from etl_spark.lake import LakeTable

FACT = ("event_id bigint, op_ts timestamp, repo string, path string, "
        "content string")
DIM = "d_ts timestamp, repo string, owner string, tier string"
T0 = dt.datetime(2024, 1, 1)


def _fact(spark, root, name="fact", props=None):
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(FACT),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=4, props=props,
    )


def _dim(spark, root, name="dim"):
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(DIM),
        key_cols=["repo"], version_cols=["d_ts"], n_buckets=2,
    )


def _mf(spark, t, key, rows):
    t.merge(spark.createDataFrame(rows, FACT + ", op string"), key)


def _md(spark, t, key, rows):
    t.merge(spark.createDataFrame(rows, DIM + ", op string"), key)


def _expected(fact, dim):
    """Ground truth: naive LEFT join of both live states."""
    d = {r["repo"]: r for r in dim.read().collect()}
    out = {}
    for r in fact.read().collect():
        m = d.get(r["repo"])
        out[(r["repo"], r["path"])] = (
            r["content"],
            m["owner"] if m else None,
            m["tier"] if m else None,
        )
    return out


def _got(dst):
    return {
        (r["repo"], r["path"]): (r["content"], r["owner"], r["tier"])
        for r in dst.read().collect()
    }


def test_sync_join_tracks_both_feeds(spark, tmp_root):
    fact, dim = _fact(spark, tmp_root), _dim(spark, tmp_root)
    _md(spark, dim, "d:0", [(T0, "r1", "alice", "gold", "I"),
                            (T0, "r2", "bob", "silver", "I")])
    _mf(spark, fact, "e:0", [
        (1, T0, "r1", "a", "v1", "I"),
        (2, T0, "r1", "b", "v1", "I"),
        (3, T0, "r2", "a", "v1", "I"),
        (4, T0, "r3", "a", "v1", "I"),  # dangling ref → NULL dim attrs
    ])
    dst = create_join_table(spark, os.path.join(tmp_root, "view"),
                            fact, dim, dim_on=["repo"])

    # bootstrap
    st = sync_join(fact, dim, dst, dim_on=["repo"])
    assert [s.applied for s in st] == [True, True]
    assert _got(dst) == _expected(fact, dim)
    assert _got(dst)[("r3", "a")] == ("v1", None, None)

    # caught up → no legs run
    assert sync_join(fact, dim, dst, dim_on=["repo"]) == []

    # fact-only round: update + delete + insert
    _mf(spark, fact, "e:1", [
        (5, T0 + dt.timedelta(minutes=1), "r1", "a", "v2", "U"),
        (6, T0 + dt.timedelta(minutes=1), "r2", "a", None, "D"),
        (7, T0 + dt.timedelta(minutes=1), "r2", "b", "v1", "I"),
    ])
    st = sync_join(fact, dim, dst, dim_on=["repo"])
    assert len(st) == 1 and st[0].applied
    assert _got(dst) == _expected(fact, dim)
    assert ("r2", "a") not in _got(dst)

    # dim-only round: attribute update + dim delete (LEFT → NULLs)
    _md(spark, dim, "d:1", [(T0 + dt.timedelta(minutes=2), "r1", "alice",
                             "platinum", "U"),
                            (T0 + dt.timedelta(minutes=2), "r2", None, None,
                             "D")])
    st = sync_join(fact, dim, dst, dim_on=["repo"])
    assert len(st) == 1 and st[0].applied
    assert _got(dst) == _expected(fact, dim)
    assert _got(dst)[("r1", "b")] == ("v1", "alice", "platinum")
    assert _got(dst)[("r2", "b")] == ("v1", None, None)

    # mixed round: the SAME fact key changes while its dim key changes too
    _mf(spark, fact, "e:2", [
        (8, T0 + dt.timedelta(minutes=3), "r1", "a", "v3", "U"),
    ])
    _md(spark, dim, "d:2", [(T0 + dt.timedelta(minutes=3), "r1", "ada",
                             "gold", "U")])
    st = sync_join(fact, dim, dst, dim_on=["repo"])
    assert [s.applied for s in st] == [True, True]
    assert _got(dst) == _expected(fact, dim)
    assert _got(dst)[("r1", "a")] == ("v3", "ada", "gold")


def test_sync_join_replay_is_noop_and_late_events_lose(spark, tmp_root):
    fact, dim = _fact(spark, tmp_root, "f2"), _dim(spark, tmp_root, "d2")
    _md(spark, dim, "d:0", [(T0, "r1", "alice", "gold", "I")])
    _mf(spark, fact, "e:0", [(1, T0 + dt.timedelta(hours=1), "r1", "a",
                              "new", "I")])
    dst = create_join_table(spark, os.path.join(tmp_root, "view2"),
                            fact, dim, dim_on=["repo"])
    sync_join(fact, dim, dst, dim_on=["repo"])
    endF, endD = fact.current_version(), dim.current_version()

    # crash-replay: same round again with pinned ends → manifest no-ops
    st = sync_join(fact, dim, dst, dim_on=["repo"],
                   end_fact=endF, end_dim=endD)
    assert st == []

    # a LATE fact event (older op_ts) arrives; the view must keep 'new'
    # because sync reads the fact STATE (LWW winner), never feed images
    _mf(spark, fact, "e:late", [(0, T0, "r1", "a", "stale", "U")])
    sync_join(fact, dim, dst, dim_on=["repo"])
    assert _got(dst)[("r1", "a")] == ("new", "alice", "gold")


def test_sync_join_dim_select_and_collisions(spark, tmp_root):
    fact, dim = _fact(spark, tmp_root, "f3"), _dim(spark, tmp_root, "d3")
    _md(spark, dim, "d:0", [(T0, "r1", "alice", "gold", "I")])
    _mf(spark, fact, "e:0", [(1, T0, "r1", "a", "v1", "I")])

    with pytest.raises(ValueError, match="collide"):
        create_join_table(spark, os.path.join(tmp_root, "bad"), fact, dim,
                          dim_on=["repo"], dim_select={"owner": "content"})
    with pytest.raises(ValueError, match="not dim payload"):
        create_join_table(spark, os.path.join(tmp_root, "bad2"), fact, dim,
                          dim_on=["repo"], dim_select={"repo": "r"})
    with pytest.raises(ValueError, match="pair positionally"):
        create_join_table(spark, os.path.join(tmp_root, "bad3"), fact, dim,
                          dim_on=["repo", "path"])

    dst = create_join_table(spark, os.path.join(tmp_root, "view3"),
                            fact, dim, dim_on=["repo"],
                            dim_select={"owner": "repo_owner"})
    sync_join(fact, dim, dst, dim_on=["repo"],
              dim_select={"owner": "repo_owner"})
    rows = dst.read().collect()
    assert rows[0]["repo_owner"] == "alice"
    assert "tier" not in dst.read().columns


def test_sync_join_propagates_fact_schema_evolution(spark, tmp_root):
    fact, dim = _fact(spark, tmp_root, "f4"), _dim(spark, tmp_root, "d4")
    _md(spark, dim, "d:0", [(T0, "r1", "alice", "gold", "I")])
    _mf(spark, fact, "e:0", [(1, T0, "r1", "a", "v1", "I")])
    dst = create_join_table(spark, os.path.join(tmp_root, "view4"),
                            fact, dim, dim_on=["repo"])
    sync_join(fact, dim, dst, dim_on=["repo"])

    # additive fact column arrives mid-feed
    evolved = spark.createDataFrame(
        [(2, T0 + dt.timedelta(minutes=1), "r1", "b", "v1", "py", "I")],
        FACT + ", lang string, op string")
    fact.merge(evolved, "e:1")
    sync_join(fact, dim, dst, dim_on=["repo"])
    got = {(r["repo"], r["path"]): r.asDict() for r in dst.read().collect()}
    assert got[("r1", "b")]["lang"] == "py"
    assert got[("r1", "a")]["lang"] is None  # null-backfilled old row
    assert got[("r1", "b")]["owner"] == "alice"


def test_sync_join_requires_declared_cursors(spark, tmp_root):
    fact, dim = _fact(spark, tmp_root, "f5"), _dim(spark, tmp_root, "d5")
    _mf(spark, fact, "e:0", [(1, T0, "r1", "a", "v1", "I")])
    _md(spark, dim, "d:0", [(T0, "r1", "alice", "gold", "I")])
    bare = LakeTable.create(
        spark, os.path.join(tmp_root, "bare"),
        StructType.fromDDL(FACT + ", owner string, tier string, "
                           "_jsync_seq bigint"),
        key_cols=["repo", "path"], version_cols=["_jsync_seq"],
    )
    with pytest.raises(ValueError, match="cursor prefix"):
        sync_join(fact, dim, bare, dim_on=["repo"])


def test_stream_join_sync_follows_both_feeds_and_resumes(spark, tmp_root):
    """Continuous join-view face (streaming/change_feed.py::
    stream_join_sync): one round per detected wave on EITHER upstream;
    killing the loop and starting a fresh one resumes from the
    destination's two cursors — no checkpoint beyond the manifests the
    batch face already writes."""
    from etl_spark.streaming import stream_join_sync

    fact, dim = _fact(spark, tmp_root, "f6"), _dim(spark, tmp_root, "d6")
    _md(spark, dim, "d:0", [(T0, "r1", "alice", "gold", "I")])
    _mf(spark, fact, "e:0", [(1, T0, "r1", "a", "v1", "I")])
    dst = create_join_table(spark, os.path.join(tmp_root, "view6"),
                            fact, dim, dim_on=["repo"])

    it = stream_join_sync(fact, dim, dst, dim_on=["repo"],
                          poll_interval=0.05)
    st = next(it)            # bootstrap round (both legs)
    assert [s.applied for s in st] == [True, True]
    it.close()               # "kill" the loop
    assert _got(dst) == _expected(fact, dim)

    # both upstreams keep committing while the consumer is down; the
    # restarted loop picks everything up as one round
    _mf(spark, fact, "e:1", [(2, T0 + dt.timedelta(minutes=1), "r1", "b",
                              "v1", "I")])
    _md(spark, dim, "d:1", [(T0 + dt.timedelta(minutes=1), "r1", "ada",
                             "gold", "U")])
    it2 = stream_join_sync(fact, dim, dst, dim_on=["repo"],
                           poll_interval=0.05)
    st2 = next(it2)
    assert [s.applied for s in st2] == [True, True]
    it2.close()
    assert _got(dst) == _expected(fact, dim)
    assert _got(dst)[("r1", "a")] == ("v1", "ada", "gold")

    # caught up: a stop-gated loop exits without yielding
    calls = {"n": 0}

    def stop():
        calls["n"] += 1
        return calls["n"] > 2

    assert list(stream_join_sync(fact, dim, dst, dim_on=["repo"],
                                 poll_interval=0.01, stop=stop)) == []


def test_sync_join_survives_upstream_rebucket_mid_feed(spark, tmp_root):
    """Layout evolution between rounds on EITHER upstream: rebuckets are
    maintenance commits (added=[], feed-invisible) and later epochs land
    under the new layout; _changed_buckets hashes per snapshot version,
    so the pruned state reads stay correct across the layout change."""
    fact, dim = _fact(spark, tmp_root, "f7"), _dim(spark, tmp_root, "d7")
    _md(spark, dim, "d:0", [(T0, "r1", "alice", "gold", "I"),
                            (T0, "r2", "bob", "silver", "I")])
    _mf(spark, fact, "e:0", [(1, T0, "r1", "a", "v1", "I"),
                             (2, T0, "r2", "a", "v1", "I")])
    dst = create_join_table(spark, os.path.join(tmp_root, "view7"),
                            fact, dim, dim_on=["repo"])
    sync_join(fact, dim, dst, dim_on=["repo"])

    fact.rebucket(8)
    dim.rebucket(4)
    _mf(spark, fact, "e:1", [(3, T0 + dt.timedelta(minutes=1), "r1", "a",
                              "v2", "U")])
    _md(spark, dim, "d:1", [(T0 + dt.timedelta(minutes=1), "r2", "bo",
                             "gold", "U")])
    st = sync_join(fact, dim, dst, dim_on=["repo"])
    assert [s.applied for s in st] == [True, True]
    assert _got(dst) == _expected(fact, dim)
    assert _got(dst)[("r1", "a")] == ("v2", "alice", "gold")
    assert _got(dst)[("r2", "a")] == ("v1", "bo", "gold")
    assert sync_join(fact, dim, dst, dim_on=["repo"]) == []


def test_sync_join_lapsed_cursor_raises_and_refresh_recovers(spark,
                                                             tmp_root):
    """A consumer that falls past either upstream's snapshot-retention
    horizon must get a loud error naming the recovery, and full_refresh
    must actually recover (fresh destination)."""
    fact, dim = _fact(spark, tmp_root, "f8"), _dim(spark, tmp_root, "d8")
    _md(spark, dim, "d:0", [(T0, "r1", "alice", "gold", "I")])
    _mf(spark, fact, "e:0", [(1, T0, "r1", "a", "v1", "I")])
    dst = create_join_table(spark, os.path.join(tmp_root, "view8"),
                            fact, dim, dim_on=["repo"])
    sync_join(fact, dim, dst, dim_on=["repo"])

    for i in range(4):
        _mf(spark, fact, f"e:{i+1}",
            [(10 + i, T0 + dt.timedelta(minutes=i + 1), "r1", f"p{i}",
              "v1", "I")])
    fact.expire_snapshots(keep_last=2)
    with pytest.raises(RuntimeError, match="retention horizon"):
        sync_join(fact, dim, dst, dim_on=["repo"])

    dst2 = create_join_table(spark, os.path.join(tmp_root, "view8b"),
                             fact, dim, dim_on=["repo"])
    st = sync_join(fact, dim, dst2, dim_on=["repo"], full_refresh=True)
    assert [s.applied for s in st] == [True, True]
    assert _got(dst2) == _expected(fact, dim)
