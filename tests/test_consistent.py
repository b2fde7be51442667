"""Consistent cross-table read groups (cdc/consistent.py).

Pins: aligned_version locating the FIRST applying commit, torn-wave
immunity (one table a batch ahead — crash shape — and live commits
after the pin), maintenance commits not disturbing the pin, the
router-composed path via route_keys, and the not-found contract.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from etl_spark.cdc import apply_envelope_batch
from etl_spark.cdc.consistent import aligned_version, read_group, route_keys
from etl_spark.lake import LakeTable

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("name", StringType()),
])
ROWS = "op string, k bigint, v bigint, name string"


def _mk(spark, root, name):
    return LakeTable.create(
        spark, os.path.join(root, name), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=2,
    )


def _merge(spark, table, key, rows):
    table.merge(spark.createDataFrame(rows, ROWS), manifest_key=key)


def test_group_pins_exactly_the_batch(spark, tmp_root):
    a, b = _mk(spark, tmp_root, "a"), _mk(spark, tmp_root, "b")
    _merge(spark, a, "env:s:0:a", [("I", 1, 1, "a0")])
    _merge(spark, b, "env:s:0:b", [("I", 1, 1, "b0")])
    _merge(spark, a, "env:s:1:a", [("U", 1, 2, "a1")])
    _merge(spark, b, "env:s:1:b", [("U", 1, 2, "b1")])
    # the live tail runs ahead on table a only (mid-wave / crash shape)
    _merge(spark, a, "env:s:2:a", [("U", 1, 3, "a2")])

    group, versions = read_group(
        {"a": a, "b": b}, route_keys(["a", "b"], "s", 1),
        with_versions=True,
    )
    assert {r["name"] for r in group["a"].collect()} == {"a1"}
    assert {r["name"] for r in group["b"].collect()} == {"b1"}
    # and batch 0 is still pinnable to its own older pair
    g0 = read_group({"a": a, "b": b}, route_keys(["a", "b"], "s", 0))
    assert {r["name"] for r in g0["a"].collect()} == {"a0"}
    # batch 2 is torn: table b hasn't applied it
    with pytest.raises(LookupError, match="'b'"):
        read_group({"a": a, "b": b}, route_keys(["a", "b"], "s", 2))
    # versions point at the FIRST applying commit, not just any
    assert versions["a"] == aligned_version(a, "env:s:1:a")
    assert aligned_version(a, "env:s:0:a") < versions["a"]


def test_maintenance_commits_do_not_disturb_the_pin(spark, tmp_root):
    a = _mk(spark, tmp_root, "a")
    _merge(spark, a, "env:s:0:a", [("I", k, 1, f"x{k}") for k in range(8)])
    v0 = aligned_version(a, "env:s:0:a")
    _merge(spark, a, "env:s:1:a", [("U", 0, 2, "y0")])
    a.compact()  # rewrites files; pinned read must still resolve batch 0
    got = {r["k"]: r["name"] for r in a.read(version=v0).collect()}
    assert got == {k: f"x{k}" for k in range(8)}
    assert aligned_version(a, "env:s:0:a") == v0  # still the first commit


def test_through_the_router(spark, tmp_root):
    from pyspark.sql.types import DoubleType

    files = StructType([
        StructField("k", LongType()), StructField("name", StringType()),
    ])
    commits = StructType([
        StructField("cid", LongType()), StructField("msg", StringType()),
    ])
    lake_schema = lambda p: StructType(  # noqa: E731
        [StructField("op_ts", TimestampType()),
         StructField("seq", LongType())] + list(p.fields)
    )
    tables = {
        "files": LakeTable.create(
            spark, os.path.join(tmp_root, "files"), lake_schema(files),
            key_cols=["k"], version_cols=["op_ts", "seq"], n_buckets=2),
        "commits": LakeTable.create(
            spark, os.path.join(tmp_root, "commits"), lake_schema(commits),
            key_cols=["cid"], version_cols=["op_ts", "seq"], n_buckets=2),
    }
    schemas = {"files": files, "commits": commits}

    def env(op, after, ts, tbl, lsn):
        return json.dumps({"op": op, "ts_ms": ts, "after": after,
                           "source": {"table": tbl, "lsn": lsn}})

    def wire(rows):
        return spark.createDataFrame([(r,) for r in rows], "value string")

    apply_envelope_batch(
        wire([env("c", {"k": 1, "name": "f1"}, 1000, "files", 1),
              env("c", {"cid": 9, "msg": "init"}, 1000, "commits", 2)]),
        schemas, tables, "env:s:0")
    apply_envelope_batch(
        wire([env("u", {"k": 1, "name": "f1b"}, 2000, "files", 3)]),
        schemas, tables, "env:s:1")

    group = read_group(tables, route_keys(tables, "s", 0))
    assert [r["name"] for r in group["files"].collect()] == ["f1"]
    assert [r["msg"] for r in group["commits"].collect()] == ["init"]
    g1 = read_group(tables, route_keys(tables, "s", 1))
    assert [r["name"] for r in g1["files"].collect()] == ["f1b"]


def test_not_found_and_key_validation(spark, tmp_root):
    a = _mk(spark, tmp_root, "a")
    assert aligned_version(a, "env:s:9:a") is None
    with pytest.raises(ValueError, match="no manifest key"):
        read_group({"a": a}, {})
    with pytest.raises(LookupError, match="not found"):
        read_group({"a": a}, {"a": "env:s:9:a"})
