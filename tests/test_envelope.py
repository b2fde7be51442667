"""Envelope adapter: Debezium-style JSON → flat engine events.

Pins the documented normalization semantics (op mapping, delete payload
from before, tombstone drop, quarantine reasons, ms-precision version)
and the end-to-end path envelope stream → parse → replay → LakeTable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.cdc.envelope import make_envelope, parse_envelopes

PAYLOAD = StructType(
    [
        StructField("k", LongType(), True),
        StructField("name", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)


def _env(op, before, after, ts_ms, lsn=None, table="files", order=None):
    import json

    e = {"op": op, "ts_ms": ts_ms, "source": {"table": table}}
    if before is not None:
        e["before"] = before
    if after is not None:
        e["after"] = after
    if lsn is not None:
        e["source"]["lsn"] = lsn
    if order is not None:
        e["transaction"] = {"id": "tx", "total_order": order}
    return json.dumps(e)


def _parse(spark, values, **kw):
    df = spark.createDataFrame([(v,) for v in values], "value string")
    good, bad = parse_envelopes(df, PAYLOAD, **kw)
    return (
        sorted(good.collect(), key=lambda r: (r["seq"], r["op"])),
        sorted(bad.collect(), key=lambda r: r["reason"]),
    )


def test_op_mapping_and_payload_sides(spark):
    rows, bad = _parse(
        spark,
        [
            _env("c", None, {"k": 1, "name": "a", "score": 1.5}, 1000, lsn=1),
            _env("r", None, {"k": 2, "name": "b", "score": 2.5}, 1000, lsn=2),
            _env("u", {"k": 3, "name": "b0"}, {"k": 3, "name": "b1", "score": 3.5},
                 2000, lsn=3),
            _env("d", {"k": 4}, None, 3000, lsn=4),
        ],
    )
    assert bad == []
    assert [(r["op"], r["k"]) for r in rows] == [
        ("I", 1), ("I", 2), ("U", 3), ("D", 4)]
    by_k = {r["k"]: r for r in rows}
    # update takes AFTER; delete takes BEFORE (after is null)
    assert by_k[3]["name"] == "b1" and by_k[3]["score"] == 3.5
    assert by_k[4]["name"] is None
    # ms-precision event time
    assert by_k[4]["op_ts"].second == 3
    assert all(r["_table"] == "files" for r in rows)


def test_tombstones_dropped_quarantine_reasons(spark):
    rows, bad = _parse(
        spark,
        [
            None,  # Kafka tombstone: neither output
            "{not json",  # unparseable
            _env("x", None, {"k": 1}, 1000),  # unknown op
            '{"before": null, "after": {"k": 2}, "ts_ms": 5}',  # missing op
            _env("c", None, {"k": 3, "name": "ok"}, None),  # missing ts
            _env("c", None, {"k": 9, "name": "ok"}, 1000, lsn=7),
        ],
    )
    assert [(r["op"], r["k"], r["seq"]) for r in rows] == [("I", 9, 7)]
    reasons = sorted(r["reason"] for r in bad)
    # unparseable JSON may surface as a NULL struct or a struct of NULL
    # fields depending on parser path; either lands in quarantine
    assert len(reasons) == 4
    assert "null_ts" in reasons
    assert {"bad_op", "null_envelope"} & set(reasons)


def test_seq_precedence_lsn_then_txorder_then_zero(spark):
    rows, _ = _parse(
        spark,
        [
            _env("c", None, {"k": 1}, 1000, lsn=55, order=9),
            _env("c", None, {"k": 2}, 1000, order=9),
            _env("c", None, {"k": 3}, 1000),
        ],
    )
    assert sorted(r["seq"] for r in rows) == [0, 9, 55]


def test_table_routing_filter(spark):
    vals = [
        _env("c", None, {"k": 1}, 1000, table="files"),
        _env("c", None, {"k": 2}, 1000, table="commits"),
    ]
    rows, _ = _parse(spark, vals, table="files")
    assert [r["k"] for r in rows] == [1]


def test_envelope_roundtrip_make_parse(spark):
    """make_envelope is the exact inverse of parse_envelopes."""
    src = spark.range(0, 50).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )
    wire = src.select(
        make_envelope(
            op=F.when(F.col("k") % 10 == 0, F.lit("d")).otherwise(F.lit("u")),
            before=F.when(F.col("k") % 10 == 0, F.struct("k", "name", "score")),
            after=F.when(F.col("k") % 10 != 0, F.struct("k", "name", "score")),
            ts_ms=F.lit(1700000000000) + F.col("k"),
            source=F.named_struct(
                F.lit("table"), F.lit("files"), F.lit("lsn"), F.col("k")
            ),
        ).alias("value")
    )
    good, bad = parse_envelopes(wire, PAYLOAD)
    assert bad.count() == 0
    out = good.collect()
    assert len(out) == 50
    assert sum(1 for r in out if r["op"] == "D") == 5
    assert all(r["name"] == f"n{r['k']}" for r in out)
    assert all(r["seq"] == r["k"] for r in out)


def test_envelope_to_replay_end_to_end(spark, tmp_root):
    """Envelope stream → parse → epoch WAL → replay_events → final state:
    last writer (by ts_ms, then lsn) wins; deletes remove keys."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    vals = [
        _env("c", None, {"k": 1, "name": "v1", "score": 1.0}, 1000, lsn=1),
        _env("u", {"k": 1}, {"k": 1, "name": "v2", "score": 2.0}, 2000, lsn=2),
        # same ts, higher lsn wins
        _env("u", {"k": 1}, {"k": 1, "name": "v3", "score": 3.0}, 2000, lsn=3),
        _env("c", None, {"k": 2, "name": "w1", "score": 9.0}, 1000, lsn=4),
        _env("d", {"k": 2}, None, 5000, lsn=5),
        _env("c", None, {"k": 3, "name": "x1", "score": 7.0}, 1000, lsn=6),
    ]
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    events, bad = parse_envelopes(df, PAYLOAD)
    assert bad.count() == 0
    wal = events.withColumn("epoch", (F.col("seq") % 2).cast("long"))
    write_event_epochs(wal.drop("_table"), f"{tmp_root}/wal")
    table, stats = replay_events(
        spark, f"{tmp_root}/wal", f"{tmp_root}/tbl", n_buckets=4,
        key_cols=["k"], version_cols=["op_ts", "seq"],
    )
    state = {r["k"]: r["name"] for r in table.read().collect()}
    assert state == {1: "v3", 3: "x1"}


def test_null_table_quarantined_in_single_table_mode(spark):
    """With table= set, a well-formed envelope whose source.table is
    NULL can't be attributed — it must land in the QUARANTINE (reason
    'null_table'), not vanish between the two outputs."""
    import json

    no_table = json.dumps({
        "op": "c", "ts_ms": 1000, "source": {},
        "after": {"k": 9, "name": "ghost", "score": 1.0},
    })
    good, bad = _parse(
        spark,
        [_env("c", None, {"k": 1, "name": "a", "score": 1.0}, 1000,
              lsn=1, table="files"), no_table],
        table="files",
    )
    assert [r["k"] for r in good] == [1]
    assert [(r["reason"],) for r in bad] == [("null_table",)]
    # multi-table mode (no table=) is unchanged: the row parses with a
    # NULL _table for the router to classify
    good2, bad2 = _parse(spark, [no_table])
    assert len(good2) == 1 and good2[0]["_table"] is None and not bad2
