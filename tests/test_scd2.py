"""SCD Type-2 history maintenance (cdc/scd2.py): batch derivation and the
incrementally maintained current+history pair (reference: per-row
change-tracking intent of the ``%s_versoes`` tables, bd.py:77-84)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql.types import StructType

from etl_spark.cdc.scd2 import (
    apply_scd2,
    create_scd2_tables,
    scd2_history,
    scd2_view,
)

SCHEMA = ("event_id bigint, op_ts timestamp, repo string, path string, "
          "lang string, size bigint")
T = [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) for m in range(10)]
KEY, VER = ["repo", "path"], ["op_ts", "event_id"]


def _pair(spark, root, **kw):
    return create_scd2_tables(
        spark, os.path.join(root, "scd2"), StructType.fromDDL(SCHEMA),
        key_cols=KEY, version_cols=VER, n_buckets=2, **kw,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA + ", op string")


def _intervals(cur, hist):
    return {
        (r["repo"], r["path"], r["op_ts"]):
            (r["lang"], r["valid_to"], r["is_current"])
        for r in scd2_view(cur, hist).collect()
    }


def test_batch_scd2_chain_and_delete(spark):
    events = _batch(spark, [
        (1, T[0], "r", "a", "py", 1, "I"),
        (2, T[1], "r", "a", "rs", 2, "U"),
        (3, T[2], "r", "a", None, None, "D"),   # closes, no successor
        (4, T[3], "r", "a", "go", 3, "I"),      # reincarnation
        (5, T[0], "r", "b", "c", 4, "I"),       # never revised
    ])
    got = {
        (r["repo"], r["path"], r["op_ts"]): (r["valid_to"], r["is_current"])
        for r in scd2_history(events, KEY, VER).collect()
    }
    assert got == {
        ("r", "a", T[0]): (T[1], False),
        ("r", "a", T[1]): (T[2], False),   # closed by the delete
        ("r", "a", T[3]): (None, True),    # reincarnated, open
        ("r", "b", T[0]): (None, True),
    }


def test_incremental_lifecycle_matches_batch_semantics(spark, tmp_root):
    cur, hist = _pair(spark, tmp_root)
    assert all(s.applied for s in apply_scd2(cur, hist, _batch(spark, [
        (1, T[0], "r", "a", "py", 1, "I"),
        (2, T[0], "r", "b", "c", 4, "I"),
    ]), epoch=0))
    assert all(s.applied for s in apply_scd2(cur, hist, _batch(spark, [
        (3, T[1], "r", "a", "rs", 2, "U"),
    ]), epoch=1))
    assert all(s.applied for s in apply_scd2(cur, hist, _batch(spark, [
        (4, T[2], "r", "a", None, None, "D"),
    ]), epoch=2))
    assert _intervals(cur, hist) == {
        ("r", "a", T[0]): ("py", T[1], False),
        ("r", "a", T[1]): ("rs", T[2], False),  # closed by the delete
        ("r", "b", T[0]): ("c", None, True),
    }
    # replaying any epoch is a metadata no-op on both tables
    h, c = apply_scd2(cur, hist, _batch(spark, [
        (3, T[1], "r", "a", "rs", 2, "U"),
    ]), epoch=1)
    assert not h.applied and not c.applied


def test_within_epoch_churn_collapses_to_winner(spark, tmp_root):
    """Interval granularity is one state per key per epoch: an I+U inside
    one epoch records a single interval opening at the winner's version,
    and an I+D lifecycle entirely inside one epoch records nothing."""
    cur, hist = _pair(spark, tmp_root)
    apply_scd2(cur, hist, _batch(spark, [
        (1, T[0], "r", "a", "py", 1, "I"),
        (2, T[1], "r", "a", "rs", 2, "U"),   # same-epoch revision wins
        (3, T[0], "r", "b", "c", 1, "I"),
        (4, T[1], "r", "b", None, None, "D"),  # born and deleted unseen
    ]), epoch=0)
    assert _intervals(cur, hist) == {
        ("r", "a", T[1]): ("rs", None, True),
    }


def test_stale_winner_closes_nothing(spark, tmp_root):
    """A late epoch whose winner is OLDER than the open interval loses LWW
    in current and must not write a backwards (valid_to < valid_from)
    interval into history."""
    cur, hist = _pair(spark, tmp_root)
    apply_scd2(cur, hist, _batch(spark, [
        (5, T[5], "r", "a", "py", 1, "I"),
    ]), epoch=0)
    apply_scd2(cur, hist, _batch(spark, [
        (1, T[1], "r", "a", "old", 9, "U"),   # stale revision
    ]), epoch=1)
    assert hist.read().isEmpty()
    assert _intervals(cur, hist) == {
        ("r", "a", T[5]): ("py", None, True),
    }


def test_delete_without_open_interval_is_noop(spark, tmp_root):
    cur, hist = _pair(spark, tmp_root)
    h, c = apply_scd2(cur, hist, _batch(spark, [
        (1, T[0], "r", "ghost", None, None, "D"),
    ]), epoch=0)
    assert h.applied and c.applied  # manifests recorded, no rows
    assert hist.read().isEmpty() and cur.read().isEmpty()


def test_scd2_downstream_of_change_feed(spark, tmp_root):
    """Composition with CDC-out: an upstream LakeTable's change-feed
    slices drive the SCD2 pair on a downstream 'cluster' — each slice is
    one apply_scd2 round keyed by the upstream version, so the downstream
    interval product tracks upstream history without ever reading the
    upstream's full state."""
    from etl_spark.lake import LakeTable

    up = LakeTable.create(
        spark, os.path.join(tmp_root, "up"), StructType.fromDDL(SCHEMA),
        key_cols=KEY, version_cols=VER, n_buckets=2,
    )
    cur, hist = _pair(spark, tmp_root)
    cursor = up.current_version()
    for key, rows in [
        ("e:0", [(1, T[0], "r", "a", "py", 1, "I")]),
        ("e:1", [(2, T[1], "r", "a", "rs", 2, "U"),
                 (3, T[1], "r", "b", "c", 4, "I")]),
        ("e:2", [(4, T[2], "r", "b", None, None, "D")]),
    ]:
        up.merge(spark.createDataFrame(rows, SCHEMA + ", op string"), key)
        v = up.current_version()
        feed = up.changes(cursor, v)
        assert all(s.applied for s in
                   apply_scd2(cur, hist, feed, epoch=v, op_col="_op"))
        cursor = v
    assert _intervals(cur, hist) == {
        ("r", "a", T[0]): ("py", T[1], False),
        ("r", "a", T[1]): ("rs", None, True),
        ("r", "b", T[1]): ("c", T[2], False),
    }


def test_crash_between_history_and_current_replays_cleanly(spark, tmp_root):
    """Docs-before-state ordering: history commits first; a crash before
    the current merge leaves a replayable epoch — the retry re-derives the
    same closed rows (current is unchanged), no-ops on the history
    manifest, then applies the current merge. No duplicate intervals."""
    cur, hist = _pair(spark, tmp_root)
    apply_scd2(cur, hist, _batch(spark, [
        (1, T[0], "r", "a", "py", 1, "I"),
    ]), epoch=0)

    batch = _batch(spark, [(2, T[1], "r", "a", "rs", 2, "U")])
    real_merge, calls = cur.merge, []

    def dying_merge(*a, **kw):
        calls.append(1)
        raise RuntimeError("simulated crash before current merge")

    cur.merge = dying_merge
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_scd2(cur, hist, batch, epoch=1)
    cur.merge = real_merge
    assert calls and hist.current_snapshot().has_applied("scd2:hist:1")

    h, c = apply_scd2(cur, hist, batch, epoch=1)  # the retry
    assert not h.applied and c.applied
    assert _intervals(cur, hist) == {
        ("r", "a", T[0]): ("py", T[1], False),
        ("r", "a", T[1]): ("rs", None, True),
    }
