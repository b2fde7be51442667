"""Outranking-stamp validation (lake/stamp.py): metadata-only when zone
maps cover the version columns, tombstone versions ALWAYS participate.

Pins: (1) zero data-file I/O on a stats-covered table — the validator
never calls read(); (2) a key deleted at a high version still forces
the stamp past the tombstone (the silent-non-repair bug: an 'I'
correction stamped between live-max and the tombstone's version used to
"apply" while the row stayed dead) on BOTH the metadata path and the
scan fallback; (3) composite version tuples pass fast above the
componentwise bound and fall back to the exact scan in the ambiguous
band; (4) reconcile and DML share the validator.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.lake import LakeTable
from etl_spark.lake.dml import delete_where
from etl_spark.lake.stamp import meta_version_bound, validate_outranking_stamp

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("name", StringType()),
])
ROWS = "op string, k bigint, v bigint, name string"


def _mk(spark, root, stats=True, version_cols=("v",), extra_props=None):
    props = dict(extra_props or {})
    if stats:
        props["stats_cols"] = ",".join(version_cols)
    return LakeTable.create(
        spark, os.path.join(root, "t"), SCHEMA,
        key_cols=["k"], version_cols=list(version_cols),
        n_buckets=4, props=props or None,
    )


class _NoRead:
    """Context: any LakeTable.read during the block is a test failure."""

    def __enter__(self):
        self._orig = LakeTable.read

        def _boom(*a, **kw):
            raise AssertionError("stamp validation touched data files")

        LakeTable.read = _boom
        return self

    def __exit__(self, *exc):
        LakeTable.read = self._orig


def test_stats_covered_validation_reads_zero_data_files(spark, tmp_root):
    t = _mk(spark, tmp_root, stats=True)
    t.merge(spark.createDataFrame(
        [("I", k, 3, "x") for k in range(10)], ROWS), manifest_key="seed")
    with _NoRead():
        validate_outranking_stamp(t, {"v": 4})          # outranks: passes
        with pytest.raises(ValueError, match="does not outrank"):
            validate_outranking_stamp(t, {"v": 3})      # ties current max
        with pytest.raises(ValueError, match="does not outrank"):
            validate_outranking_stamp(t, {"v": 1})
    bound, exact = meta_version_bound(t.current_snapshot())
    assert bound == (3,) and exact


def test_empty_table_any_stamp_outranks(spark, tmp_root):
    t = _mk(spark, tmp_root, stats=True)
    with _NoRead():
        validate_outranking_stamp(t, {"v": 0})


@pytest.mark.parametrize("stats", [True, False])
def test_tombstone_versions_participate(spark, tmp_root, stats):
    """Insert k at v=5, delete at v=10: a stamp of 7 must be REFUSED
    (it would 'apply' while the row stays deleted), 11 accepted —
    identically on the metadata path and the include_deleted scan."""
    t = _mk(spark, tmp_root, stats=stats)
    t.merge(spark.createDataFrame([("I", 1, 5, "a")], ROWS),
            manifest_key="i")
    t.merge(spark.createDataFrame([("D", 1, 10, None)], ROWS),
            manifest_key="d")
    assert t.read().count() == 0                       # live-max is empty
    with pytest.raises(ValueError, match="does not outrank"):
        validate_outranking_stamp(t, {"v": 7})
    validate_outranking_stamp(t, {"v": 11})


def test_scan_fallback_warns_naming_stats_cols(spark, tmp_root, caplog):
    t = _mk(spark, tmp_root, stats=False)
    t.merge(spark.createDataFrame([("I", 1, 5, "a")], ROWS),
            manifest_key="i")
    import logging

    with caplog.at_level(logging.WARNING, logger="etl_spark.lake.stamp"):
        validate_outranking_stamp(t, {"v": 6})
    assert any("stats_cols" in r.message for r in caplog.records)


def test_composite_version_fast_pass_and_ambiguous_scan(spark, tmp_root):
    schema = StructType([
        StructField("k", LongType()),
        StructField("v", LongType()),
        StructField("v2", LongType()),
        StructField("name", StringType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "t"), schema,
        key_cols=["k"], version_cols=["v", "v2"],
        n_buckets=4, props={"stats_cols": "v,v2"},
    )
    # rows: (v, v2) maxima componentwise = (3, 9); true lexicographic
    # max = (3, 4) — v=3 rows only reach v2=4
    rows = [("I", k, 3 if k < 5 else 2, k, "x") for k in range(10)]
    t.merge(spark.createDataFrame(
        rows, "op string, k bigint, v bigint, v2 bigint, name string"),
        manifest_key="seed")
    with _NoRead():
        # strictly above the componentwise bound: decided from metadata
        validate_outranking_stamp(t, {"v": 4, "v2": 0})
    # ambiguous band: (3, 6) beats the true max (3, 4) but not the
    # componentwise bound (3, 9) — must fall through to the exact scan
    # and be ACCEPTED (a metadata-only rejection here would be wrong)
    validate_outranking_stamp(t, {"v": 3, "v2": 6})
    with pytest.raises(ValueError, match="does not outrank"):
        validate_outranking_stamp(t, {"v": 3, "v2": 4})


def test_dml_uses_metadata_path_end_to_end(spark, tmp_root):
    """delete_where on a stats-covered table: the only read() is the
    pruned affected-row scan (the WHERE), never a validation scan."""
    t = _mk(spark, tmp_root, stats=True)
    t.merge(spark.createDataFrame(
        [("I", k, 1, "x") for k in range(10)], ROWS), manifest_key="seed")
    reads = []
    orig = LakeTable.read

    def _spy(self, *a, **kw):
        reads.append(kw)
        return orig(self, *a, **kw)

    LakeTable.read = _spy
    try:
        n, st = delete_where(t, [("k", ">=", 8)], {"v": 2},
                             manifest_key="dml:z")
    finally:
        LakeTable.read = orig
    assert n == 2 and st.applied
    # exactly one read: the affected-row scan with the WHERE pushed in
    assert len(reads) == 1 and reads[0].get("where") == [("k", ">=", 8)]


def test_reconcile_refuses_stamp_below_tombstone(spark, tmp_root):
    """The ADVICE repro: insert k at v=5, delete at v=10, reconcile with
    stamp v=7 used to report inserts=1/applied while the row stayed
    deleted. Now it refuses loudly; v=11 repairs for real."""
    from etl_spark.cdc.reconcile import reconcile_snapshot

    t = _mk(spark, tmp_root, stats=False)
    t.merge(spark.createDataFrame([("I", 1, 5, "a")], ROWS),
            manifest_key="i")
    t.merge(spark.createDataFrame([("D", 1, 10, None)], ROWS),
            manifest_key="d")
    truth = spark.createDataFrame([(1, "a")], "k bigint, name string")
    with pytest.raises(ValueError, match="outrank"):
        reconcile_snapshot(t, truth, {"v": 7}, manifest_key="rec:1")
    st = reconcile_snapshot(t, truth, {"v": 11}, manifest_key="rec:2")
    assert st.inserts == 1
    assert [r["name"] for r in t.read().collect()] == ["a"]
