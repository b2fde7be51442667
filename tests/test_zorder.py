"""Z-order clustering (`cluster_order: "zorder"` → lake/zorder.py).

Pins: Spark's Morton key matches the pure-Python reference bit for bit,
compaction writes each bucket file in z-curve order, BOTH dimensions get
locality (chunk-level spans — the row-group proxy — shrink on the
second dimension where lexicographic order shows none), reads stay
byte-identical, bounds resolve from zone-map metadata without a data
pass when stats cover the cluster columns, and non-embeddable (string)
dimensions are refused loudly.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.lake import LakeTable
from etl_spark.lake.zorder import zorder_key, zorder_ref

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("x", LongType()),
    StructField("y", LongType()),
])
ROWS = "op string, k bigint, v bigint, x bigint, y bigint"
GRID = 64  # 64x64 grid => 4096 rows, x = k // 64, y = k % 64


def _mk(spark, root, name, props=None):
    t = LakeTable.create(
        spark, os.path.join(root, name), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=2, props=props,
    )
    rows = [("I", k, 1, k // GRID, k % GRID) for k in range(GRID * GRID)]
    half = len(rows) // 2
    t.merge(spark.createDataFrame(rows[:half], ROWS), manifest_key="s0")
    t.merge(spark.createDataFrame(rows[half:], ROWS), manifest_key="s1")
    assert t.compact() > 0
    return t


def _file_cols(table, cols):
    snap = table.current_snapshot()
    out = {}
    for fl in snap.buckets.values():
        for f in fl:
            tb = pq.read_table(os.path.join(table.path, f), columns=cols)
            out[f] = list(zip(*[tb[c].to_pylist() for c in cols]))
    return out


def test_spark_morton_key_matches_python_reference(spark):
    import random

    rng = random.Random(7)
    vals = [(rng.randint(-50, 1000), rng.randint(0, 99)) for _ in range(400)]
    vals += [(None, 5), (0, None)]
    bounds = {"x": (-50.0, 1000.0), "y": (0.0, 99.0)}
    df = spark.createDataFrame(vals, "x bigint, y bigint")
    got = [r["z"] for r in
           df.select(zorder_key(SCHEMA, bounds, bits=16).alias("z"))
           .collect()]
    want = zorder_ref(vals, [bounds["x"], bounds["y"]], bits=16)
    assert got == want


def test_compaction_writes_z_curve_order_and_reads_identical(spark, tmp_root):
    zt = _mk(spark, tmp_root, "z", props={
        "cluster_cols": "x,y", "cluster_order": "zorder",
    })
    per_file = _file_cols(zt, ["x", "y"])
    assert per_file
    lo_x, hi_x = 0.0, float(GRID - 1)
    for f, pairs in per_file.items():
        zs = zorder_ref(pairs, [(lo_x, hi_x), (lo_x, hi_x)])
        assert zs == sorted(zs), f"{f} not in z-curve order"
    # identical rows to a lexicographically clustered twin
    lex = _mk(spark, tmp_root, "lex", props={"cluster_cols": "x,y"})
    a = {tuple(r) for r in zt.read().collect()}
    b = {tuple(r) for r in lex.read().collect()}
    assert a == b


def test_second_dimension_gets_locality(spark, tmp_root):
    """Chunk-level span analysis — the row-group pruning proxy: slice
    each file into contiguous 64-row chunks (what a small row group
    would hold) and measure each chunk's span of the SECOND dimension.
    Lexicographic (x, y) order leaves y spanning ~the whole domain in
    every chunk; z-order confines both dimensions."""
    zt = _mk(spark, tmp_root, "z", props={
        "cluster_cols": "x,y", "cluster_order": "zorder",
    })
    lex = _mk(spark, tmp_root, "lex", props={"cluster_cols": "x,y"})

    def mean_y_span(table):
        spans = []
        for pairs in _file_cols(table, ["x", "y"]).values():
            for i in range(0, len(pairs), 64):
                ys = [y for _, y in pairs[i:i + 64]]
                if len(ys) > 1:
                    spans.append(max(ys) - min(ys))
        return sum(spans) / len(spans)

    z_span, lex_span = mean_y_span(zt), mean_y_span(lex)
    # lexicographic chunks span nearly the full y domain (31); z-order
    # chunks stay inside a curve cell — require at least a 2x cut (in
    # practice ~4x on this grid)
    assert lex_span > (GRID - 1) * 0.8, lex_span
    assert z_span < lex_span / 2, (z_span, lex_span)


def test_bounds_resolve_from_zone_maps_without_data_pass(spark, tmp_root):
    from etl_spark.lake.zorder import cluster_bounds

    t = _mk(spark, tmp_root, "s", props={
        "cluster_cols": "x,y", "cluster_order": "zorder",
        "stats_cols": "x,y",
    })
    snap = t.current_snapshot()
    files = [f for fl in snap.buckets.values() for f in fl]

    class _Boom:
        def agg(self, *a, **kw):
            raise AssertionError("bounds took a data pass despite stats")

    got = cluster_bounds(snap, ["x", "y"], files, _Boom())
    assert got == {"x": (0.0, float(GRID - 1)), "y": (0.0, float(GRID - 1))}


def test_string_dimension_refused_and_single_dim_falls_back(spark, tmp_root):
    schema = StructType([
        StructField("k", LongType()),
        StructField("v", LongType()),
        StructField("x", LongType()),
        StructField("s", StringType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "bad"), schema,
        key_cols=["k"], version_cols=["v"], n_buckets=2,
        props={"cluster_cols": "x,s", "cluster_order": "zorder"},
    )
    t.merge(spark.createDataFrame(
        [("I", 1, 1, 5, "a"), ("I", 2, 1, 6, "b")],
        "op string, k bigint, v bigint, x bigint, s string"),
        manifest_key="s0")
    t.merge(spark.createDataFrame(
        [("I", 3, 1, 7, "c")],
        "op string, k bigint, v bigint, x bigint, s string"),
        manifest_key="s1")
    with pytest.raises(ValueError, match="zorder"):
        t.compact()
    # a single cluster dim under zorder is just the lexicographic order
    t2 = _mk(spark, tmp_root, "one", props={
        "cluster_cols": "x", "cluster_order": "zorder",
    })
    for f, pairs in _file_cols(t2, ["x"]).items():
        xs = [x for (x,) in pairs]
        assert xs == sorted(xs)
    with pytest.raises(ValueError, match="cluster_order"):
        t3 = _mk(spark, tmp_root, "typo", props={
            "cluster_cols": "x,y", "cluster_order": "hilbert",
        })


def test_rebucket_keeps_z_order(spark, tmp_root):
    t = _mk(spark, tmp_root, "rb", props={
        "cluster_cols": "x,y", "cluster_order": "zorder",
    })
    t.rebucket(4)
    lo, hi = 0.0, float(GRID - 1)
    per_file = _file_cols(t, ["x", "y"])
    assert len(per_file) >= 4
    for f, pairs in per_file.items():
        zs = zorder_ref(pairs, [(lo, hi), (lo, hi)])
        assert zs == sorted(zs), f"{f} not z-ordered after rebucket"
