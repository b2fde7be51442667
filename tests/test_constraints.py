"""CHECK constraints (lake/constraints.py): merge-time enforcement,
SQL FALSE-only semantics (NULL passes), tombstone exemption, add/drop
lifecycle, manifest-key recapture after refusal."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.lake import (
    ConstraintViolation,
    LakeTable,
    add_constraint,
    drop_constraint,
    violation_counts,
)

SCHEMA = "event_id bigint, op_ts timestamp, seq bigint, repo string, n bigint"
TS = dt.datetime(2024, 1, 1)


def _table(spark, tmp_root, **props):
    return LakeTable.create(
        spark, os.path.join(tmp_root, "t"), StructType.fromDDL(SCHEMA),
        key_cols=["repo"], version_cols=["op_ts", "seq"],
        n_buckets=2, props=props or None,
    )


def _batch(spark, *rows):
    return spark.createDataFrame(list(rows), SCHEMA + ", op string")


def _row(i, repo, n, op="I"):
    return (i, TS + dt.timedelta(seconds=i), i, repo, n, op)


CONS = '{"nonneg": "n >= 0", "named": "repo IS NOT NULL AND length(repo) <= 8"}'


def test_merge_refuses_and_recaptures(spark, tmp_root):
    t = _table(spark, tmp_root, check_constraints=CONS)
    t.merge(_batch(spark, _row(0, "a", 5), _row(1, "b", 0)), "e0")
    v0 = t.current_version()

    with pytest.raises(ConstraintViolation, match="nonneg"):
        t.merge(_batch(spark, _row(2, "c", 7), _row(3, "d", -1)), "e1")
    # nothing published, key unclaimed, state untouched
    assert t.current_version() == v0
    assert not t.current_snapshot().has_applied("e1")
    assert t.read().count() == 2

    # the repaired batch re-ingests under the SAME key
    st = t.merge(_batch(spark, _row(2, "c", 7), _row(3, "d", 1)), "e1")
    assert st.applied
    assert t.read().count() == 4


def test_null_passes_and_tombstones_exempt(spark, tmp_root):
    t = _table(spark, tmp_root, check_constraints=CONS)
    # NULL n: constraint evaluates NULL, not FALSE — standard SQL CHECK
    t.merge(_batch(spark, (0, TS, 0, "a", None, "I")), "e0")
    assert t.read().collect()[0]["n"] is None
    # a delete row with garbage payload is exempt (payload is meaningless)
    t.merge(_batch(spark, (1, TS + dt.timedelta(1), 1, "a", -99, "D")), "e1")
    assert t.read().count() == 0


def test_violating_loser_still_refused(spark, tmp_root):
    # enforcement is batch-wide, pre-LWW: a violating row refuses the
    # merge even when a newer row in the same batch would out-version it
    t = _table(spark, tmp_root, check_constraints=CONS)
    with pytest.raises(ConstraintViolation):
        t.merge(_batch(spark, _row(0, "a", -1), _row(10, "a", 5)), "e0")


def test_add_drop_lifecycle(spark, tmp_root):
    t = _table(spark, tmp_root)
    t.merge(_batch(spark, _row(0, "a", 5), _row(1, "b", -2)), "e0")
    # existing data violates: add refuses (validate=True default)
    with pytest.raises(ConstraintViolation, match="1 existing live"):
        add_constraint(t, "nonneg", "n >= 0")
    # repair, then add validates clean
    t.merge(_batch(spark, _row(11, "b", 2)), "e1")
    cons = add_constraint(t, "nonneg", "n >= 0")
    assert cons == {"nonneg": "n >= 0"}
    with pytest.raises(ConstraintViolation):
        t.merge(_batch(spark, _row(20, "z", -5)), "e2")
    # duplicate name refused; unknown drop refused
    with pytest.raises(ValueError, match="already declared"):
        add_constraint(t, "nonneg", "n >= 1")
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(t, "ghost")
    # dropping releases enforcement
    assert drop_constraint(t, "nonneg") == {}
    assert t.merge(_batch(spark, _row(20, "z", -5)), "e2").applied


def test_add_unanalyzable_expression_refused(spark, tmp_root):
    t = _table(spark, tmp_root)
    t.merge(_batch(spark, _row(0, "a", 5)), "e0")
    with pytest.raises(Exception):
        add_constraint(t, "bad", "no_such_column > 0")
    # nothing committed
    from etl_spark.lake.constraints import parse_constraints

    assert parse_constraints(t.current_snapshot().props) == {}


def test_violation_counts_audit_face(spark, tmp_root):
    df = _batch(spark, _row(0, "a", 5), _row(1, "b", -1),
                (2, TS, 2, "c", None, "I"), _row(3, "dddddddddd", -3))
    got = violation_counts(df, {"nonneg": "n >= 0",
                                "short": "length(repo) <= 8"})
    assert got == {"nonneg": 2, "short": 1}


def test_wap_staging_enforces_too(spark, tmp_root):
    # merge_staged shares the write path, so the guard fires at staging
    t = _table(spark, tmp_root, check_constraints=CONS)
    with pytest.raises(ConstraintViolation):
        t.merge_staged(_batch(spark, _row(0, "a", -1)), "e0")
    assert not t.current_snapshot().has_applied("e0")


def test_merge_quarantine_splits(spark, tmp_root):
    """Dead-letter posture: violating rows land in the DLQ with the
    failing constraint's name, clean rows (and NULL-evaluating rows,
    which PASS) merge under the same key; re-run is a table no-op."""
    from etl_spark.lake import merge_quarantine

    t = _table(spark, tmp_root, check_constraints=CONS)
    dlq = os.path.join(tmp_root, "dlq")
    batch = _batch(
        spark,
        _row(0, "a", 5),                 # clean
        _row(1, "b", -1),                # violates nonneg
        (2, TS, 2, "c", None, "I"),      # NULL: passes (SQL CHECK)
        _row(3, "dddddddddd", 4),        # violates named (len > 8)
        (4, TS + dt.timedelta(1), 4, "b", -9, "D"),  # delete: exempt
    )
    stats, n_bad = merge_quarantine(t, batch, "e0", dlq)
    assert stats.applied and n_bad == 2
    got = {r["repo"] for r in t.read().collect()}
    assert got == {"a", "c"}  # b tombstoned by the exempt delete
    dl = spark.read.parquet(os.path.join(dlq, "e0")).collect()
    assert {(r["repo"], r["_violation"]) for r in dl} == \
        {("b", "nonneg"), ("dddddddddd", "named")}
    # exactly-once on the table: re-run is a no-op, DLQ stays
    stats2, n2 = merge_quarantine(t, batch, "e0", dlq)
    assert not stats2.applied and n2 == 0
    assert spark.read.parquet(os.path.join(dlq, "e0")).count() == 2
    # a constraint-free table degrades to plain merge (one pass)
    t2 = _table(spark, os.path.join(tmp_root, "t2x"))
    st, n = merge_quarantine(t2, _batch(spark, _row(0, "a", -5)), "e0",
                             dlq)
    assert st.applied and n == 0 and t2.read().count() == 1


def test_streaming_fails_batch_and_resumes(spark, tmp_root):
    """Crash shape under Structured Streaming: a poisoned micro-batch
    fails the query LOUDLY (constraint marker in the error), the
    checkpoint keeps its offsets, and after the operator releases the
    constraint a restart on the same checkpoint drains to completion —
    exactly-once preserved (no rows doubled, none lost)."""
    from etl_spark.lake.constraints import MARKER
    from etl_spark.streaming import stream_replay

    t = _table(spark, tmp_root, check_constraints='{"nonneg": "n >= 0"}')
    wal = os.path.join(tmp_root, "wal")
    os.makedirs(wal)
    _batch(spark, _row(0, "a", 1), _row(1, "b", 2)).coalesce(1) \
        .write.parquet(os.path.join(wal, "w0"))
    # single flat files per wave (file source needs a directory of files)
    for f in os.listdir(os.path.join(wal, "w0")):
        if f.endswith(".parquet"):
            os.rename(os.path.join(wal, "w0", f), os.path.join(wal, "0.parquet"))
    import shutil

    shutil.rmtree(os.path.join(wal, "w0"))
    _batch(spark, _row(2, "c", -7)).coalesce(1) \
        .write.parquet(os.path.join(wal, "w1"))
    for f in os.listdir(os.path.join(wal, "w1")):
        if f.endswith(".parquet"):
            os.rename(os.path.join(wal, "w1", f), os.path.join(wal, "1.parquet"))
    shutil.rmtree(os.path.join(wal, "w1"))

    # pin file-source ordering (oldest mtime first): clean wave, then poison
    os.utime(os.path.join(wal, "0.parquet"), (1_000_000, 1_000_000))
    os.utime(os.path.join(wal, "1.parquet"), (2_000_000, 2_000_000))

    ckpt = os.path.join(tmp_root, "ckpt")
    q = stream_replay(spark, wal, t, ckpt, max_files_per_trigger=1,
                      drop_cols=())
    with pytest.raises(Exception, match="nonneg"):
        q.awaitTermination()
    assert MARKER.split("[")[1] in str(q.exception() or "")
    done_after_fail = t.read().count()
    assert done_after_fail >= 2  # clean first wave landed

    # operator releases the rule; same checkpoint resumes and drains
    from etl_spark.lake import drop_constraint

    drop_constraint(t, "nonneg")
    q2 = stream_replay(spark, wal, t, ckpt, max_files_per_trigger=1,
                       drop_cols=())
    q2.awaitTermination()
    assert t.read().count() == 3  # exactly-once: 2 + 1, nothing doubled
