"""Incremental downstream sync: change feed → second LakeTable with a
crash-safe cursor (reference: consumers re-deriving tables from
capturas_historico, scripts/geral.py:92-109)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql.types import StructType

from etl_spark.cdc.sync import last_synced_version, sync_changes
from etl_spark.lake import LakeTable

SCHEMA = "event_id bigint, op_ts timestamp, repo string, path string, content string"
T0 = dt.datetime(2024, 1, 1)


def _mk(spark, root, name, n_buckets=2, props=None):
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(SCHEMA),
        key_cols=["repo", "path"], version_cols=["op_ts", "event_id"],
        n_buckets=n_buckets, props=props,
    )


def _merge(spark, t, key, rows):
    t.merge(spark.createDataFrame(rows, SCHEMA + ", op string"), key)


def test_sync_is_incremental_idempotent_and_cursor_correct(spark, tmp_root):
    src = _mk(spark, tmp_root, "src", props={"compact_threshold": "2"})
    dst = _mk(spark, tmp_root, "dst", n_buckets=4,
              props={"cursor_prefixes": "sync"})

    assert last_synced_version(dst) is None
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "v1", "I"),
                               (2, T0, "r", "b", "v1", "I")])
    _merge(spark, src, "e:1", [(3, T0 + dt.timedelta(minutes=1), "r", "a", "v2", "U")])
    st = sync_changes(src, dst)
    assert st.applied
    v1 = src.current_version()
    assert last_synced_version(dst) == v1
    assert {r["path"]: r["content"] for r in dst.read().collect()} == \
        {"a": "v2", "b": "v1"}

    # caught up: no-op, cursor unmoved
    assert sync_changes(src, dst) is None
    assert last_synced_version(dst) == v1

    # new upstream work incl. a delete; compaction may fire upstream
    _merge(spark, src, "e:2", [(4, T0 + dt.timedelta(minutes=2), "r", "b", None, "D"),
                               (5, T0 + dt.timedelta(minutes=3), "r", "c", "v1", "I")])
    st2 = sync_changes(src, dst)
    assert st2.applied
    assert last_synced_version(dst) == src.current_version() > v1
    assert {r["path"]: r["content"] for r in dst.read().collect()} == \
        {"a": "v2", "c": "v1"}

    # re-running the same round is a metadata no-op (crash-replay safety)
    again = dst.merge(
        src.changes(v1).withColumnRenamed("_op", "op"),
        manifest_key=f"sync:{src.current_version()}")
    assert not again.applied


def test_sync_cursor_metadata_stays_bounded(spark, tmp_root):
    """Many sync rounds against a tiny manifest window: sync seqs are
    sparse upstream versions, so without cursor folding they would pile
    up in `applied` forever; with cursor_prefixes they fold to [min, max]
    and every historical round still answers has_applied=True."""
    src = _mk(spark, tmp_root, "src2", props={"compact_threshold": "999"})
    dst = _mk(spark, tmp_root, "dst2",
              props={"cursor_prefixes": "sync", "manifest_window": "2"})

    synced_versions = []
    for i in range(6):
        _merge(spark, src, f"e:{i}",
               [(i + 1, T0 + dt.timedelta(minutes=i), "r", f"p{i}", f"v{i}", "I")])
        assert sync_changes(src, dst).applied
        synced_versions.append(src.current_version())

    snap = dst.current_snapshot()
    assert len(snap.applied) <= 2
    # the newest keys stay verbatim in the window; everything older folded
    # into the cursor watermark despite the seqs being non-contiguous
    assert snap.applied_watermarks["sync"][1] == synced_versions[-3]
    for v in synced_versions:
        assert snap.has_applied(f"sync:{v}"), v
    assert last_synced_version(dst) == synced_versions[-1]
    assert dst.read().count() == 6


def test_sync_full_refresh_bootstraps(spark, tmp_root):
    src = _mk(spark, tmp_root, "src3")
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "v1", "I")])
    dst = _mk(spark, tmp_root, "dst3", props={"cursor_prefixes": "sync"})
    assert sync_changes(src, dst, full_refresh=True).applied
    assert dst.read().count() == 1


def test_sync_propagates_schema_evolution(spark, tmp_root):
    """A late upstream batch adds a column; the next sync round must evolve
    the destination schema additively and null-fill old rows — the
    reference's *_ADICIONAIS contract riding the change feed."""
    src = _mk(spark, tmp_root, "src4")
    dst = _mk(spark, tmp_root, "dst4", props={"cursor_prefixes": "sync"})
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "v1", "I")])
    assert sync_changes(src, dst).applied

    src.merge(spark.createDataFrame(
        [(2, T0 + dt.timedelta(minutes=1), "r", "b", "v1", "py", "I")],
        SCHEMA + ", lang string, op string"), "e:1")
    assert sync_changes(src, dst).applied

    assert "lang" in dst.current_snapshot().schema.fieldNames()
    got = {r["path"]: r["lang"] for r in dst.read().collect()}
    assert got == {"a": None, "b": "py"}


def test_sync_raises_past_retention_horizon_and_recovers(spark, tmp_root):
    """A consumer that lapsed past the upstream snapshot-retention horizon
    must get a loud error (its incremental range is gone), and
    full_refresh must recover it — including tombstones, so later late
    events stay suppressed downstream."""
    import pytest

    src = _mk(spark, tmp_root, "src5", props={"compact_threshold": "999"})
    dst = _mk(spark, tmp_root, "dst5", props={"cursor_prefixes": "sync"})
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "v1", "I"),
                               (2, T0, "r", "b", "v1", "I")])
    assert sync_changes(src, dst).applied

    _merge(spark, src, "e:1", [(3, T0 + dt.timedelta(minutes=1), "r", "b", None, "D")])
    _merge(spark, src, "e:2", [(4, T0 + dt.timedelta(minutes=2), "r", "c", "v1", "I")])
    src.expire_snapshots(keep_last=1)          # cursor version is gone

    with pytest.raises(RuntimeError, match="retention horizon"):
        sync_changes(src, dst)

    st = sync_changes(src, dst, full_refresh=True)
    assert st.applied
    assert {r["path"] for r in dst.read().collect()} == {"a", "c"}
    # the bootstrap carried b's tombstone: a LATE event older than the
    # delete must stay suppressed downstream
    dst.merge(spark.createDataFrame(
        [(0, T0 - dt.timedelta(minutes=1), "r", "b", "stale", "U")],
        SCHEMA + ", op string"), "late:0")
    assert {r["path"] for r in dst.read().collect()} == {"a", "c"}


def test_sync_refuses_to_cross_an_upstream_rollback(spark, tmp_root):
    import pytest

    src = _mk(spark, tmp_root, "src_rb")
    dst = _mk(spark, tmp_root, "dst_rb", props={"cursor_prefixes": "sync"})
    _merge(spark, src, "e:1", [(1, T0, "r", "a", "good", "I")])
    v_good = src.current_version()
    sync_changes(src, dst)                       # cursor at v_good
    _merge(spark, src, "e:2",
           [(2, T0.replace(day=2), "r", "a", "BAD", "U")])
    sync_changes(src, dst)                       # bad rows now downstream
    src.rollback(v_good)

    # neither the incremental feed nor full_refresh may silently absorb
    # the divergence — both must fail loudly
    with pytest.raises(RuntimeError, match="rolled back"):
        sync_changes(src, dst)
    with pytest.raises(RuntimeError, match="rolled back"):
        sync_changes(src, dst, full_refresh=True)

    # a FRESH destination bootstraps the restored state cleanly
    dst2 = _mk(spark, tmp_root, "dst_rb2", props={"cursor_prefixes": "sync"})
    sync_changes(src, dst2)
    assert [(r["path"], r["content"]) for r in dst2.read().collect()] \
        == [("a", "good")]


def test_sync_requires_cursor_prefix_declaration(spark, tmp_root):
    import pytest

    src = _mk(spark, tmp_root, "src_np")
    _merge(spark, src, "e:1", [(1, T0, "r", "a", "x", "I")])
    dst = _mk(spark, tmp_root, "dst_np")         # prop missing
    with pytest.raises(ValueError, match="cursor prefix"):
        sync_changes(src, dst)


def test_stream_sync_follows_commits_and_resumes_after_kill(spark, tmp_root):
    """Continuous-sync face (streaming/change_feed.py::stream_sync): the
    tail loop applies one sync round per detected commit wave; killing the
    loop and starting a fresh one resumes from the destination's own
    cursor — no checkpoint beyond the manifest the batch face already
    writes."""
    from etl_spark.streaming import stream_sync

    src = _mk(spark, tmp_root, "src")
    dst = _mk(spark, tmp_root, "dst", n_buckets=4,
              props={"cursor_prefixes": "sync"})
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "v1", "I"),
                               (2, T0, "r", "b", "v1", "I")])

    # drain exactly one round, then "kill" the loop (drop the generator)
    it = stream_sync(src, dst, poll_interval=0.05)
    st = next(it)
    assert st.applied
    it.close()
    assert {r["path"]: r["content"] for r in dst.read().collect()} == \
        {"a": "v1", "b": "v1"}
    cursor_after_kill = last_synced_version(dst)

    # upstream keeps committing while the consumer is down; the restarted
    # loop picks BOTH waves up as one round from the persisted cursor
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "a", "v2", "U")])
    _merge(spark, src, "e:2",
           [(4, T0 + dt.timedelta(minutes=2), "r", "b", None, "D"),
            (5, T0 + dt.timedelta(minutes=3), "r", "c", "v1", "I")])
    it2 = stream_sync(src, dst, poll_interval=0.05)
    st2 = next(it2)
    assert st2.applied
    assert last_synced_version(dst) == src.current_version() > cursor_after_kill
    assert {r["path"]: r["content"] for r in dst.read().collect()} == \
        {"a": "v2", "c": "v1"}

    # caught up: a stop-gated loop exits without yielding (no busy apply)
    done = {"n": 0}

    def stop():
        done["n"] += 1
        return done["n"] > 2

    assert list(stream_sync(src, dst, poll_interval=0.01, stop=stop)) == []
    it2.close()

    # exactly-once ledger across both incarnations: every key unique
    keys = list(dst.current_snapshot().applied)
    assert len(keys) == len(set(keys))


def test_sync_survives_upstream_rebucket_mid_feed(spark, tmp_root):
    """Layout evolution between sync rounds: the upstream rebuckets (a
    maintenance commit — added=[], nothing re-enters the feed) and later
    epochs land under the NEW layout; the consumer's next round must
    carry exactly the post-cursor data changes and converge to upstream
    state."""
    src = _mk(spark, tmp_root, "src", n_buckets=2)
    dst = _mk(spark, tmp_root, "dst", n_buckets=4,
              props={"cursor_prefixes": "sync"})
    _merge(spark, src, "e:0", [(1, T0, "r", "a", "v1", "I"),
                               (2, T0, "r", "b", "v1", "I")])
    assert sync_changes(src, dst).applied

    src.rebucket(8)
    _merge(spark, src, "e:1",
           [(3, T0 + dt.timedelta(minutes=1), "r", "a", "v2", "U"),
            (4, T0 + dt.timedelta(minutes=2), "q", "c", "v1", "I")])
    st = sync_changes(src, dst)
    assert st.applied
    assert {r["path"]: r["content"] for r in dst.read().collect()} == \
        {r["path"]: r["content"] for r in src.read().collect()} == \
        {"a": "v2", "b": "v1", "c": "v1"}
    # caught up afterwards — the rebucket commit itself is feed-invisible
    assert sync_changes(src, dst) is None


PATCH_SCHEMA = "id bigint, ts bigint, seq bigint, a string, b bigint"


def _mk_patch(spark, root, name, props=None):
    p = {"update_semantics": "patch"}
    p.update(props or {})
    return LakeTable.create(
        spark, os.path.join(root, name), StructType.fromDDL(PATCH_SCHEMA),
        key_cols=["id"], version_cols=["ts", "seq"], n_buckets=2, props=p,
    )


def _mp(spark, t, key, rows):
    t.merge(spark.createDataFrame(rows, PATCH_SCHEMA + ", op string"), key)


def _pstate(t):
    return {r["id"]: (r["ts"], r["seq"], r["a"], r["b"])
            for r in t.read().collect()}


def test_sync_semantics_mismatch_raises(spark, tmp_root):
    import pytest

    src = _mk_patch(spark, tmp_root, "sp1")
    dst = _mk(spark, tmp_root, "sd1", props={"cursor_prefixes": "sync"})
    with pytest.raises(ValueError, match="update_semantics mismatch"):
        sync_changes(src, dst)
    src2 = _mk(spark, tmp_root, "sp1b")
    dst2 = _mk_patch(spark, tmp_root, "sd1b",
                     props={"cursor_prefixes": "sync"})
    with pytest.raises(ValueError, match="update_semantics mismatch"):
        sync_changes(src2, dst2)


def test_sync_patch_to_patch_incremental(spark, tmp_root):
    """Partial rows replay through the feed into a patch replica: NULL
    keeps the previous value END TO END (src resolution == dst
    resolution), including a tombstone reset mid-feed."""
    src = _mk_patch(spark, tmp_root, "sp2", {"compact_threshold": "2"})
    dst = _mk_patch(spark, tmp_root, "sd2", {"cursor_prefixes": "sync"})
    _mp(spark, src, "m0", [(1, 10, 1, "alice", 5, "I"),
                           (2, 10, 2, "bob", 7, "I")])
    assert sync_changes(src, dst).applied
    _mp(spark, src, "m1", [(1, 20, 3, None, 6, "U")])       # patch b only
    _mp(spark, src, "m2", [(2, 20, 4, None, None, "D"),      # reset key 2
                           (2, 30, 5, None, 9, "U")])        # partial revive
    assert sync_changes(src, dst).applied
    assert _pstate(dst) == _pstate(src) == {
        1: (20, 3, "alice", 6), 2: (30, 5, None, 9)}
    assert sync_changes(src, dst) is None


def test_sync_patch_bootstrap_preserves_column_provenance(spark, tmp_root):
    """THE reason bootstrap copies folded_state, not the resolved image:
    key 1 has a@2 and b@8; a replica bootstrapped from the resolved image
    would stamp BOTH columns at version 8, so a late delete at version 5
    (arriving only after the bootstrap, via the feed) would kill nothing —
    but a (set @2, before the delete) must die. The folded bootstrap keeps
    a's true winner version, so src and replica agree."""
    src = _mk_patch(spark, tmp_root, "sp3")
    dst = _mk_patch(spark, tmp_root, "sd3", {"cursor_prefixes": "sync"})
    _mp(spark, src, "m0", [(1, 2, 1, "keepme", None, "U"),
                           (1, 8, 2, None, 42, "U")])
    assert sync_changes(src, dst, full_refresh=True).applied  # bootstrap
    _mp(spark, src, "m1", [(1, 5, 3, None, None, "D")])       # late delete
    assert sync_changes(src, dst).applied
    assert _pstate(src) == {1: (8, 2, None, 42)}
    assert _pstate(dst) == _pstate(src)
