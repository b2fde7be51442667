"""Column type promotion (LakeTable.alter_column_type — Iceberg type
promotion analogue).

Pins: metadata-only widenings (int→long, int→double, float→double) read
old files on the fly and merge wider batches; long→double demands the
priced rewrite and preserves values/tombstones/LWW across vintages;
key/stats/bloom columns and narrowings are refused.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.lake import LakeTable


def _mk(spark, root, value_type, props=None):
    t = LakeTable.create(
        spark, os.path.join(root, "t"),
        StructType([StructField("k", LongType()),
                    StructField("v", LongType()),
                    StructField("x", value_type)]),
        key_cols=["k"], version_cols=["v"], n_buckets=2, props=props,
    )
    return t


def test_metadata_widening_int_to_long(spark, tmp_root):
    t = _mk(spark, tmp_root, IntegerType())
    t.merge(spark.createDataFrame([("I", 1, 1, 7), ("I", 2, 1, 8)],
                                  "op string, k bigint, v bigint, x int"),
            manifest_key="e:0")
    files_before = sorted(f for fl in t.current_snapshot().buckets.values()
                          for f in fl)
    v = t.alter_column_type("x", LongType())
    snap = t.current_snapshot()
    assert snap.version == v
    # metadata-only: same physical files, widened read schema
    assert sorted(f for fl in snap.buckets.values() for f in fl) \
        == files_before
    assert dict((f.name, f.dataType.simpleString())
                for f in snap.schema.fields)["x"] == "bigint"
    # old int files read fine; a wider-than-int batch merges
    big = 2**40
    t.merge(spark.createDataFrame([("U", 1, 2, big)],
                                  "op string, k bigint, v bigint, x bigint"),
            manifest_key="e:1")
    got = {r["k"]: r["x"] for r in t.read().collect()}
    assert got == {1: big, 2: 8}
    t.compact()  # fold across vintages
    assert {r["k"]: r["x"] for r in t.read().collect()} == got


def test_metadata_widening_float_to_double(spark, tmp_root):
    t = _mk(spark, tmp_root, FloatType())
    t.merge(spark.createDataFrame([("I", 1, 1, 1.5)],
                                  "op string, k bigint, v bigint, x float"),
            manifest_key="e:0")
    t.alter_column_type("x", DoubleType())
    assert {r["x"] for r in t.read().collect()} == {1.5}


def test_rewrite_widening_long_to_double(spark, tmp_root):
    t = _mk(spark, tmp_root, LongType())
    t.merge(spark.createDataFrame(
        [("I", 1, 1, 10), ("I", 2, 1, 20), ("D", 3, 5, None)],
        "op string, k bigint, v bigint, x bigint"), manifest_key="e:0")
    with pytest.raises(ValueError, match="rewrite=True"):
        t.alter_column_type("x", DoubleType())
    t.alter_column_type("x", DoubleType(), rewrite=True)
    assert {r["k"]: r["x"] for r in t.read().collect()} == {1: 10.0, 2: 20.0}
    # the wire's drifted fractional value now lands
    t.merge(spark.createDataFrame(
        [("U", 1, 2, 10.5), ("I", 3, 4, 3.25)],
        "op string, k bigint, v bigint, x double"), manifest_key="e:1")
    got = {r["k"]: r["x"] for r in t.read().collect()}
    # k=3's re-insert at v=4 LOSES to the rewritten tombstone at v=5
    assert got == {1: 10.5, 2: 20.0}


def test_refusals(spark, tmp_root):
    t = _mk(spark, tmp_root, IntegerType(),
            props={"stats_cols": "x", "bloom_cols": "v"})
    t.merge(spark.createDataFrame([("I", 1, 1, 7)],
                                  "op string, k bigint, v bigint, x int"),
            manifest_key="e:0")
    with pytest.raises(ValueError, match="key column"):
        t.alter_column_type("k", DoubleType())
    with pytest.raises(ValueError, match="zone maps"):
        t.alter_column_type("x", LongType())
    with pytest.raises(ValueError, match="bloom"):
        t.alter_column_type("v", DoubleType())
    with pytest.raises(ValueError, match="no such column"):
        t.alter_column_type("nope", LongType())
    # narrowing refused
    t2 = _mk(spark, os.path.join(tmp_root, "2"), DoubleType())
    with pytest.raises(ValueError, match="unsupported promotion"):
        t2.alter_column_type("x", IntegerType())


def test_same_type_is_noop_and_string_needs_rewrite(spark, tmp_root):
    t = _mk(spark, tmp_root, LongType())
    v0 = t.current_version()
    assert t.alter_column_type("x", LongType()) == v0
    t.merge(spark.createDataFrame([("I", 1, 1, 42)],
                                  "op string, k bigint, v bigint, x bigint"),
            manifest_key="e:0")
    with pytest.raises(ValueError, match="rewrite=True"):
        t.alter_column_type("x", StringType())
    t.alter_column_type("x", StringType(), rewrite=True)
    assert {r["x"] for r in t.read().collect()} == {"42"}


def test_drift_promotion_ops_loop(spark, tmp_root):
    """The full drift repair: a wire batch outgrows a BIGINT column —
    ANSI cast would SILENTLY truncate 10.5 to 10, so merge refuses the
    narrowing cast loudly; suggest_promotions names the exact promotion,
    alter_column_type applies it, the same batch then lands."""
    import json

    from etl_spark.cdc import suggest_promotions

    t = _mk(spark, tmp_root, LongType())
    t.merge(spark.createDataFrame([("I", 1, 1, 10)],
                                  "op string, k bigint, v bigint, x bigint"),
            manifest_key="e:0")
    drifted = spark.createDataFrame(
        [("U", 1, 2, 10.5)], "op string, k bigint, v bigint, x double")
    with pytest.raises(ValueError, match="silently truncate"):
        t.merge(drifted, manifest_key="e:1")

    wire = spark.createDataFrame(
        [(json.dumps({"op": "u", "ts_ms": 2,
                      "after": {"k": 1, "v": 2, "x": 10.5}}),)],
        "value string")
    base = t.current_snapshot().schema
    assert suggest_promotions(wire, base) == {"x": ("bigint", "double")}

    t.alter_column_type("x", DoubleType(), rewrite=True)
    st = t.merge(drifted, manifest_key="e:1")
    assert st.applied
    assert {r["x"] for r in t.read().collect()} == {10.5}


def test_suggest_promotions_lattice(spark, tmp_root):
    import json

    from etl_spark.cdc import suggest_promotions

    base = StructType([
        StructField("a", LongType()),      # gets "1.5"  -> double
        StructField("b", DoubleType()),    # gets "abc"  -> string
        StructField("c", LongType()),      # gets "2"    -> fits
        StructField("d", StringType()),    # anything fits a string
        StructField("e", IntegerType()),   # gets 2**40  -> bigint
    ])
    rows = [json.dumps({"op": "u", "ts_ms": 1, "after": {
        "a": 1.5, "b": "abc", "c": 2, "d": 9, "e": 2**40}})]
    wire = spark.createDataFrame([(r,) for r in rows], "value string")
    assert suggest_promotions(wire, base) == {
        "a": ("bigint", "double"),
        "b": ("double", "string"),
        "e": ("int", "bigint"),
    }
    assert suggest_promotions(wire, StructType([])) == {}


def test_replica_must_promote_before_next_sync(spark, tmp_root):
    """Docstring contract made real: after the upstream widens int→long
    and lands a value an INT can't hold, the replica's next sync round
    fails LOUDLY (ANSI overflow on the narrowing cast) until the replica
    applies the same promotion — never a silent wrap."""
    from etl_spark.cdc import sync_changes

    src = _mk(spark, tmp_root, IntegerType())
    src.merge(spark.createDataFrame([("I", 1, 1, 7)],
                                    "op string, k bigint, v bigint, x int"),
              manifest_key="e:0")
    replica = LakeTable.create(
        spark, os.path.join(tmp_root, "rep"),
        StructType([StructField("k", LongType()),
                    StructField("v", LongType()),
                    StructField("x", IntegerType())]),
        key_cols=["k"], version_cols=["v"], n_buckets=2,
        props={"cursor_prefixes": "sync"},
    )
    sync_changes(src, replica)
    assert {r["x"] for r in replica.read().collect()} == {7}

    src.alter_column_type("x", LongType())
    src.merge(spark.createDataFrame([("U", 1, 2, 2**40)],
                                    "op string, k bigint, v bigint, x bigint"),
              manifest_key="e:1")
    with pytest.raises(Exception, match="CAST_OVERFLOW|overflow|ARITHMETIC"):
        sync_changes(src, replica)
    replica.alter_column_type("x", LongType())
    sync_changes(src, replica)
    assert {r["x"] for r in replica.read().collect()} == {2**40}


def test_merge_refuses_fractional_decimal_into_integral(spark, tmp_root):
    """ANSI cast(DECIMAL '10.5' AS BIGINT) truncates silently, exactly
    like double→bigint — the guard must refuse decimal(p, s>0) batch
    columns into integral table columns, while scale-0 decimals (exact
    integers, loud on overflow) stay allowed."""
    from decimal import Decimal

    from pyspark.sql.types import DecimalType

    t = _mk(spark, tmp_root, LongType())
    frac = spark.createDataFrame(
        [("I", 1, 1, Decimal("10.5"))],
        StructType([
            StructField("op", StringType()),
            StructField("k", LongType()),
            StructField("v", LongType()),
            StructField("x", DecimalType(10, 2)),
        ]),
    )
    with pytest.raises(ValueError, match="truncate"):
        t.merge(frac, manifest_key="e:frac")
    whole = spark.createDataFrame(
        [("I", 1, 1, Decimal("10"))],
        StructType([
            StructField("op", StringType()),
            StructField("k", LongType()),
            StructField("v", LongType()),
            StructField("x", DecimalType(10, 0)),
        ]),
    )
    st = t.merge(whole, manifest_key="e:whole")
    assert st.applied
    assert [r["x"] for r in t.read().collect()] == [10]
