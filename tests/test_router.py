"""Multi-table envelope routing + wire-schema drift inference.

Pins: per-table fan-out with payload parse only on each table's rows,
unknown-table / poison dead-lettering, per-(batch, table) exactly-once
through apply_envelope_batch, the streaming face with restart resume,
and infer_payload_schema's additive consensus typing.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.cdc import (
    apply_envelope_batch,
    infer_payload_schema,
    parse_envelopes,
    route_envelopes,
)
from etl_spark.cdc.router import read_quarantine
from etl_spark.lake import LakeTable
from etl_spark.streaming import stream_envelope_ingest

FILES = StructType([
    StructField("k", LongType()), StructField("name", StringType()),
    StructField("score", DoubleType()),
])
COMMITS = StructType([
    StructField("cid", LongType()), StructField("msg", StringType()),
])
SCHEMAS = {"files": FILES, "commits": COMMITS}


def _env(op, after, ts_ms, table, lsn, before=None):
    e = {"op": op, "ts_ms": ts_ms, "source": {"table": table, "lsn": lsn}}
    if after is not None:
        e["after"] = after
    if before is not None:
        e["before"] = before
    return json.dumps(e)


def _wire_rows():
    return [
        _env("c", {"k": 1, "name": "a", "score": 1.5}, 1000, "files", 1),
        _env("u", {"k": 1, "name": "a2", "score": 2.5}, 2000, "files", 2),
        _env("c", {"k": 2, "name": "b", "score": 9.0}, 1000, "files", 3),
        _env("d", None, 3000, "files", 4, before={"k": 2}),
        _env("c", {"cid": 7, "msg": "init"}, 1000, "commits", 5),
        _env("u", {"cid": 7, "msg": "amend"}, 4000, "commits", 6),
        _env("c", {"x": 1}, 1000, "branches", 9),       # unknown table
        "{not json",                                     # poison
        _env("z", {"k": 5}, 1000, "files", 10),          # bad op
    ]


def _versioned(payload: StructType) -> StructType:
    """Lake schema = payload + the envelope version columns."""
    from pyspark.sql.types import TimestampType

    return StructType(
        [StructField("op_ts", TimestampType()),
         StructField("seq", LongType())] + list(payload.fields)
    )


def _mk_tables(spark, root):
    return {
        "files": LakeTable.create(
            spark, os.path.join(root, "files"), _versioned(FILES),
            key_cols=["k"], version_cols=["op_ts", "seq"], n_buckets=2,
        ),
        "commits": LakeTable.create(
            spark, os.path.join(root, "commits"), _versioned(COMMITS),
            key_cols=["cid"], version_cols=["op_ts", "seq"], n_buckets=2,
        ),
    }


def test_route_fans_out_and_dead_letters(spark):
    df = spark.createDataFrame([(v,) for v in _wire_rows()], "value string")
    events, quarantine = route_envelopes(df, SCHEMAS)

    files = {(r["op"], r["k"]) for r in events["files"].collect()}
    assert files == {("I", 1), ("U", 1), ("I", 2), ("D", 2)}
    commits = {(r["op"], r["cid"], r["msg"])
               for r in events["commits"].collect()}
    assert commits == {("I", 7, "init"), ("U", 7, "amend")}

    q = {(r["reason"], r["_table"]) for r in quarantine.collect()}
    assert ("unknown_table", "branches") in q
    assert ("bad_op", "files") in q
    # unparseable JSON has no probe-able table; its reason label depends
    # on whether the parser yields NULL or a struct of NULLs (either is a
    # standard quarantine reason, never unknown_table)
    assert any(reason in ("null_envelope", "bad_op") and tbl is None
               for reason, tbl in q)
    assert len(q) == 3


def test_apply_batch_exactly_once_and_quarantine_idempotent(spark, tmp_root):
    tables = _mk_tables(spark, tmp_root)
    qdir = os.path.join(tmp_root, "dead")
    df = spark.createDataFrame([(v,) for v in _wire_rows()], "value string")

    stats = apply_envelope_batch(df, SCHEMAS, tables, "b:0",
                                 quarantine_dir=qdir)
    assert all(s.applied for s in stats.values())
    # replay of the same batch: metadata no-op on every table, dead
    # letters rewritten in place (not duplicated)
    stats2 = apply_envelope_batch(df, SCHEMAS, tables, "b:0",
                                  quarantine_dir=qdir)
    assert not any(s.applied for s in stats2.values())

    state = {r["k"]: (r["name"], r["score"])
             for r in tables["files"].read().collect()}
    assert state == {1: ("a2", 2.5)}  # LWW winner; k=2 deleted
    assert {r["msg"] for r in tables["commits"].read().collect()} == {"amend"}
    assert read_quarantine(spark, qdir).count() == 3


def test_apply_batch_rejects_key_mismatch(spark, tmp_root):
    tables = _mk_tables(spark, tmp_root)
    df = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(ValueError, match="mismatch"):
        apply_envelope_batch(df, {"files": FILES}, tables, "b:0")


def _land_wire(wire_dir, fname, rows):
    os.makedirs(wire_dir, exist_ok=True)
    with open(os.path.join(wire_dir, fname), "w") as f:
        f.write("\n".join(rows) + "\n")


def test_stream_envelope_ingest_end_to_end(spark, tmp_root):
    wire = os.path.join(tmp_root, "wire")
    rows = _wire_rows()
    _land_wire(wire, "b1.jsonl", rows[:4])
    _land_wire(wire, "b2.jsonl", rows[4:])
    tables = _mk_tables(spark, tmp_root)
    qdir = os.path.join(tmp_root, "dead")

    q = stream_envelope_ingest(
        spark, wire, SCHEMAS, tables, os.path.join(tmp_root, "ckpt"),
        quarantine_dir=qdir, max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    assert not q.isActive

    state = {r["k"]: r["name"] for r in tables["files"].read().collect()}
    assert state == {1: "a2"}
    assert {r["msg"] for r in tables["commits"].read().collect()} == {"amend"}
    assert read_quarantine(spark, qdir).count() == 3


def test_stream_envelope_restart_resumes(spark, tmp_root):
    wire = os.path.join(tmp_root, "wire")
    rows = _wire_rows()
    _land_wire(wire, "b1.jsonl", rows[:4])
    _land_wire(wire, "b2.jsonl", rows[4:6])
    tables = _mk_tables(spark, tmp_root)
    ckpt = os.path.join(tmp_root, "ckpt")

    q = stream_envelope_ingest(spark, wire, SCHEMAS, tables, ckpt,
                               max_files_per_trigger=1)
    while not q.recentProgress:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)

    # late third file lands between incarnations
    _land_wire(wire, "b3.jsonl",
               [_env("c", {"cid": 8, "msg": "late"}, 9000, "commits", 11)])
    q2 = stream_envelope_ingest(spark, wire, SCHEMAS, tables, ckpt,
                                max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert not q2.isActive

    state = {r["k"]: r["name"] for r in tables["files"].read().collect()}
    assert state == {1: "a2"}
    assert {r["msg"] for r in tables["commits"].read().collect()} == {
        "amend", "late"}


# ---------------------------------------------------------------- drift


def test_infer_payload_schema_consensus_types(spark):
    base = StructType.fromDDL("k bigint, name string")
    vals = [
        _env("c", {"k": 1, "name": "a", "stars": 3, "ratio": 0.5,
                   "flag": True, "tag": "x1"}, 1000, "files", 1),
        _env("u", {"k": 2, "name": "b", "stars": 4, "ratio": 2,
                   "flag": False}, 2000, "files", 2,
             before={"k": 2, "legacy": "old"}),
        # stars stays integral; ratio mixes int+float -> double; a null
        # never vetoes; mixed-type junk -> string
        _env("c", {"k": 3, "stars": None, "ratio": 1.25, "tag": 7},
             3000, "files", 3),
    ]
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    evolved = infer_payload_schema(df, base)
    assert evolved.fieldNames() == [
        "k", "name", "flag", "legacy", "ratio", "stars", "tag"]
    by_name = {f.name: f.dataType.simpleString() for f in evolved.fields}
    assert by_name["stars"] == "bigint"
    assert by_name["ratio"] == "double"
    assert by_name["flag"] == "boolean"
    assert by_name["legacy"] == "string"
    assert by_name["tag"] == "string"  # "x1" vetoes bigint
    # base fields untouched, in place
    assert by_name["k"] == "bigint" and by_name["name"] == "string"


def test_drift_flows_into_lake_evolution(spark, tmp_root):
    """Wire drift end-to-end: infer → parse → merge evolves the table."""
    base = StructType.fromDDL("k bigint, name string")
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "t"), _versioned(base),
        key_cols=["k"], version_cols=["op_ts", "seq"], n_buckets=2,
    )
    batch1 = spark.createDataFrame(
        [(_env("c", {"k": 1, "name": "a"}, 1000, "files", 1),)],
        "value string")
    good, _ = parse_envelopes(batch1, infer_payload_schema(batch1, base))
    table.merge(good.drop("_table"), manifest_key="e:0")

    batch2 = spark.createDataFrame(
        [(_env("u", {"k": 1, "name": "a2", "lang": "py"}, 2000, "files", 2),),
         (_env("c", {"k": 2, "name": "b", "lang": "rs"}, 2000, "files", 3),)],
        "value string")
    evolved = infer_payload_schema(batch2, base)
    assert evolved.fieldNames() == ["k", "name", "lang"]
    good2, _ = parse_envelopes(batch2, evolved)
    table.merge(good2.drop("_table"), manifest_key="e:1")

    state = {r["k"]: (r["name"], r["lang"]) for r in table.read().collect()}
    assert state == {1: ("a2", "py"), 2: ("b", "rs")}


def test_dead_letter_replay_after_fix(spark, tmp_root):
    """Ops fixed the config (the unknown table got a schema): feeding the
    dead letters back through the router ingests the releasable ones and
    re-quarantines only the genuinely poison rows."""
    tables = _mk_tables(spark, tmp_root)
    qdir = os.path.join(tmp_root, "dead")
    df = spark.createDataFrame([(v,) for v in _wire_rows()], "value string")
    apply_envelope_batch(df, SCHEMAS, tables, "b:0", quarantine_dir=qdir)

    branches_schema = StructType([StructField("x", LongType())])
    branches = LakeTable.create(
        spark, os.path.join(tmp_root, "branches"),
        _versioned(branches_schema),
        key_cols=["x"], version_cols=["op_ts", "seq"], n_buckets=2,
    )
    dead = read_quarantine(spark, qdir).select("value")
    schemas2 = dict(SCHEMAS, branches=branches_schema)
    tables2 = dict(tables, branches=branches)
    qdir2 = os.path.join(tmp_root, "dead2")
    apply_envelope_batch(dead, schemas2, tables2, "replay:0",
                         quarantine_dir=qdir2)
    assert [r["x"] for r in branches.read().collect()] == [1]
    # the two poison rows re-quarantine; the unknown-table row is gone
    assert read_quarantine(spark, qdir2).count() == 2


def test_live_drift_evolves_lake_mid_stream(spark, tmp_root):
    """infer_drift=True on the streaming face: a later micro-batch whose
    payloads carry a new key evolves the lake table additively while the
    stream runs; earlier rows read NULL for the column they never sent."""
    wire = os.path.join(tmp_root, "wire")
    _land_wire(wire, "b1.jsonl", [
        _env("c", {"k": 1, "name": "a"}, 1000, "files", 1),
    ])
    _land_wire(wire, "b2.jsonl", [
        _env("u", {"k": 1, "name": "a2", "stars": 5}, 2000, "files", 2),
        _env("c", {"k": 2, "name": "b", "stars": 7}, 2000, "files", 3),
    ])
    files = LakeTable.create(
        spark, os.path.join(tmp_root, "files"), _versioned(FILES),
        key_cols=["k"], version_cols=["op_ts", "seq"], n_buckets=2,
    )
    q = stream_envelope_ingest(
        spark, wire, {"files": FILES}, {"files": files},
        os.path.join(tmp_root, "ckpt"), max_files_per_trigger=1,
        infer_drift=True,
    )
    q.awaitTermination(120)
    assert not q.isActive

    out = files.read()
    assert "stars" in out.columns
    state = {r["k"]: (r["name"], r["stars"]) for r in out.collect()}
    assert state == {1: ("a2", 5), 2: ("b", 7)}

    # without drift inference the same wire would have dropped the key
    # (sanity that the flag is what did it)
    events, _ = route_envelopes(
        spark.createDataFrame(
            [(_env("c", {"k": 9, "stars": 1}, 1000, "files", 9),)],
            "value string"),
        {"files": FILES})
    assert "stars" not in events["files"].columns
