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
