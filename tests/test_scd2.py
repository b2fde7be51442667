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


def _scan_scd2_files_for(spark, table, needle: str) -> int:
    """Decoded-parquet grep over EVERY file under the table dir (vacuumed
    or not) — same physical-erasure check as test_purge."""
    import glob

    hits = 0
    for f in glob.glob(os.path.join(table.path, "**", "*.parquet"),
                       recursive=True):
        df = spark.read.parquet(f)
        if "lang" in df.columns:
            hits += df.filter(df["lang"].contains(needle)).count()
    return hits


def test_purge_scd2_erases_subject_from_both_tables_and_files(spark, tmp_root):
    from etl_spark.cdc.scd2 import purge_scd2

    cur, hist = _pair(spark, tmp_root,
                      props={"compact_threshold": "999"})
    # subject churns across three epochs: two CLOSED intervals land in
    # history, one open in current; a bystander shares the buckets
    assert all(s.applied for s in apply_scd2(cur, hist, _batch(spark, [
        (1, T[0], "r", "a", "SECRET-v1", 1, "I"),
        (2, T[0], "r", "b", "keep", 4, "I"),
    ]), epoch=0))
    assert all(s.applied for s in apply_scd2(cur, hist, _batch(spark, [
        (3, T[1], "r", "a", "SECRET-v2", 2, "U"),
    ]), epoch=1))
    assert all(s.applied for s in apply_scd2(cur, hist, _batch(spark, [
        (4, T[2], "r", "a", "SECRET-v3", 3, "U"),
    ]), epoch=2))
    assert _scan_scd2_files_for(spark, hist, "SECRET") >= 2
    assert _scan_scd2_files_for(spark, cur, "SECRET") >= 1

    keys = spark.createDataFrame([("r", "a")], "repo string, path string")
    report = purge_scd2(cur, hist, keys, "purge:req-1", vacuum_grace_sec=0.0)

    assert report["keys"] == 1 and report["history_intervals"] == 2
    assert report["history_tombstoned"] and report["current_tombstoned"]
    assert report["history_residual_live"] == 0
    assert report["current_residual_live"] == 0
    # no payload byte of the subject survives in EITHER table's files
    assert _scan_scd2_files_for(spark, hist, "SECRET") == 0
    assert _scan_scd2_files_for(spark, cur, "SECRET") == 0
    # the view keeps the bystander, loses every subject interval
    assert _intervals(cur, hist) == {("r", "b", T[0]): ("keep", None, True)}

    # crash-replay with the same manifest key: merges are metadata no-ops,
    # the maintenance tail is idempotent, nothing resurrects
    again = purge_scd2(cur, hist, keys, "purge:req-1", vacuum_grace_sec=0.0)
    assert not again["history_tombstoned"] and not again["current_tombstoned"]
    assert again["history_residual_live"] == 0
    assert again["current_residual_live"] == 0


def test_purge_scd2_rerun_after_crash_between_merge_and_compaction(
    spark, tmp_root
):
    """The history lookup reads include_deleted=True precisely so a re-run
    after a crash between the tombstone merge and the compaction still
    finds the already-tombstoned intervals' buckets and finishes the
    file-level scrub — a live-rows read would see nothing and leave the
    subject's payload bytes on disk forever."""
    from pyspark.sql import functions as F

    from etl_spark.cdc.scd2 import SEQ_COL, purge_scd2

    cur, hist = _pair(spark, tmp_root, props={"compact_threshold": "999"})
    assert all(s.applied for s in apply_scd2(cur, hist, _batch(spark, [
        (1, T[0], "r", "a", "SECRET-v1", 1, "I"),
    ]), epoch=0))
    assert all(s.applied for s in apply_scd2(cur, hist, _batch(spark, [
        (2, T[1], "r", "a", "SECRET-v2", 2, "U"),
    ]), epoch=1))

    # simulate the crash: the purge's history merge landed (same manifest
    # key purge_scd2 will use), but nothing after it ran
    keys = spark.createDataFrame([("r", "a")], "repo string, path string")
    hsnap = hist.current_snapshot()
    tomb = (
        hist.read().join(keys, KEY, "left_semi")
        .select(*hsnap.key_cols,
                (F.col(SEQ_COL) + F.lit(1)).cast("long").alias(SEQ_COL),
                F.lit("D").alias("op"))
    )
    assert hist.merge(tomb, manifest_key="purge:req-2:hist").applied
    assert _scan_scd2_files_for(spark, hist, "SECRET") >= 1  # bytes remain

    report = purge_scd2(cur, hist, keys, "purge:req-2", vacuum_grace_sec=0.0)
    assert not report["history_tombstoned"]  # merge was the crashed run's
    assert report["history_buckets_compacted"] >= 1
    assert report["history_residual_live"] == 0
    assert report["current_residual_live"] == 0
    assert _scan_scd2_files_for(spark, hist, "SECRET") == 0
    assert _scan_scd2_files_for(spark, cur, "SECRET") == 0


def test_scd2_schema_evolution_mid_stream(spark, tmp_root):
    """An additive column arriving mid-WAL: current evolves at the epoch
    that delivers it, history evolves one close later (closed rows are
    snapshots of the OLD state), and scd2_view aligns the vintages with
    NULL backfill throughout — same additive contract sync and diff
    already test (test_sync.py, test_diff.py)."""
    cur, hist = _pair(spark, tmp_root)
    assert all(s.applied for s in apply_scd2(cur, hist, _batch(spark, [
        (1, T[0], "r", "a", "py", 1, "I"),
    ]), epoch=0))

    # epoch 1 brings a NEW payload column; the view must already carry it
    evolved = spark.createDataFrame(
        [(2, T[1], "r", "a", "rs", 2, "team-x", "U")],
        SCHEMA + ", team string, op string",
    )
    assert all(s.applied for s in apply_scd2(cur, hist, evolved, epoch=1))
    got = {
        (r["repo"], r["path"], r["op_ts"]): (r["lang"], r["team"],
                                             r["is_current"])
        for r in scd2_view(cur, hist).collect()
    }
    # the closed pre-evolution interval reads NULL for the new column;
    # the open interval carries the delivered value
    assert got == {
        ("r", "a", T[0]): ("py", None, False),
        ("r", "a", T[1]): ("rs", "team-x", True),
    }

    # epoch 2 closes the evolved interval: history evolves additively and
    # the closed row KEEPS its team value
    evolved2 = spark.createDataFrame(
        [(3, T[2], "r", "a", "go", 3, "team-y", "U")],
        SCHEMA + ", team string, op string",
    )
    assert all(s.applied for s in apply_scd2(cur, hist, evolved2, epoch=2))
    got2 = {
        (r["repo"], r["path"], r["op_ts"]): (r["lang"], r["team"],
                                             r["is_current"])
        for r in scd2_view(cur, hist).collect()
    }
    assert got2 == {
        ("r", "a", T[0]): ("py", None, False),
        ("r", "a", T[1]): ("rs", "team-x", False),
        ("r", "a", T[2]): ("go", "team-y", True),
    }
    assert "team" in [f.name for f in hist.current_snapshot().schema.fields]

    # replaying an evolved epoch stays a metadata no-op
    again = apply_scd2(cur, hist, evolved2, epoch=2)
    assert not any(s.applied for s in again)
