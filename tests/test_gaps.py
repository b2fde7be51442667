"""Wire sequence-gap auditing (cdc/gaps.py).

Pins: exact missing-run intervals incl. runs crossing coarse-bucket
boundaries and runs spanning entirely-empty buckets, strided sequences,
re-delivery immunity, multi-partition isolation, the stats surface, and
a randomized parity sweep against a naive python ground truth.
"""

from __future__ import annotations

import random

from etl_spark.cdc.gaps import sequence_gap_stats, sequence_gaps

import pytest


def _gaps_py(seqs, step=1):
    s = sorted(set(seqs))
    out = []
    for a, b in zip(s, s[1:]):
        if b - a > step:
            out.append((a + step, b - step, (b - a) // step - 1))
    return out


def _rows(spark, seqs, part="p0"):
    return spark.createDataFrame([(part, s) for s in seqs],
                                 "src_part string, seq bigint")


def test_exact_intervals_within_and_across_buckets(spark):
    seqs = [0, 1, 2, 5, 6, 9, 40, 41, 90]  # bucket_span=8 splits these
    df = _rows(spark, seqs)
    got = sorted(
        (r["gap_lo"], r["gap_hi"], r["missing"])
        for r in sequence_gaps(df, "seq", ["src_part"],
                               bucket_span=8).collect()
    )
    assert got == _gaps_py(seqs)
    # gap 10..39 spans buckets 1-4 (2 and 3 entirely empty): ONE row
    assert (10, 39, 30) in got and (42, 89, 48) in got


def test_strided_and_multi_partition(spark):
    rows = [("a", s) for s in (0, 4, 8, 20)] + [("b", s) for s in (1, 13)]
    df = spark.createDataFrame(rows, "src_part string, seq bigint")
    got = {
        (r["src_part"], r["gap_lo"], r["gap_hi"], r["missing"])
        for r in sequence_gaps(df, "seq", ["src_part"], step=4,
                               bucket_span=16).collect()
    }
    assert got == {("a", 12, 16, 2), ("b", 5, 9, 2)}


def test_redelivery_is_not_a_gap(spark):
    df = _rows(spark, [0, 1, 1, 1, 2, 4, 4])
    gaps = sequence_gaps(df, "seq", ["src_part"]).collect()
    assert [(r["gap_lo"], r["gap_hi"]) for r in gaps] == [(3, 3)]
    st = sequence_gap_stats(df, "seq", ["src_part"]).collect()[0]
    assert (st["seq_lo"], st["seq_hi"]) == (0, 4)
    assert st["expected"] == 5 and st["observed"] == 4
    assert st["missing"] == 1 and st["redelivered"] == 3


def test_global_sequence_without_partitions(spark):
    df = _rows(spark, [10, 11, 15]).drop("src_part")
    gaps = sequence_gaps(df, "seq").collect()
    assert [tuple(r) for r in gaps] == [(12, 14, 3)]
    st = sequence_gap_stats(df, "seq").collect()[0]
    assert tuple(st) == (10, 15, 6, 3, 3, 0)


def test_randomized_parity_with_tiny_buckets(spark):
    rng = random.Random(7)
    for trial in range(3):
        seqs = sorted(rng.sample(range(0, 400), 120))
        seqs += rng.choices(seqs, k=15)  # re-deliveries
        df = _rows(spark, seqs)
        got = sorted(
            tuple(r)[1:] if False else (r["gap_lo"], r["gap_hi"], r["missing"])
            for r in sequence_gaps(df, "seq", ["src_part"],
                                   bucket_span=16).collect()
        )
        assert got == _gaps_py(seqs), f"trial {trial}"


def test_validation(spark):
    df = _rows(spark, [1, 2])
    with pytest.raises(ValueError, match="step"):
        sequence_gaps(df, "seq", step=0)
    with pytest.raises(ValueError, match="bucket_span"):
        sequence_gaps(df, "seq", bucket_span=1)
    with pytest.raises(ValueError, match="step"):
        sequence_gap_stats(df, "seq", step=0)
