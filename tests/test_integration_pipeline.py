"""End-to-end production shape, one scenario: a transactional multi-table
wire stream → txn gate → routed lake ingest (restart mid-stream) →
incremental replica sync → incremental aggregate rollup → freshness
report — with poison dead-lettered and an incomplete transaction
withheld throughout.

This is the composed system the unit suites pin piecewise; here the
pieces run AGAINST EACH OTHER: the gate's releases feed the router's
merges, whose change feed drives sync and agg_sync, and every layer must
agree at the end (replica == state, rollup == GROUP BY of state,
snapshot_diff of replica vs nothing pending, lag report caught up).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from etl_spark.cdc import create_txn_gate
from etl_spark.cdc.agg_sync import create_aggregate_table, sync_aggregate
from etl_spark.cdc.sync import sync_changes
from etl_spark.cdc.txn import TxnGate
from etl_spark.lake import LakeTable
from etl_spark.metrics import consumer_lag
from etl_spark.streaming import stream_txn_ingest

PAYLOAD = StructType([
    StructField("k", LongType()),
    StructField("lang", StringType()),
    StructField("size", LongType()),
])


def _row(k, lang, size, ts_ms, lsn, tid=None, order=None, op="c",
         before=None):
    e = {"op": op, "ts_ms": ts_ms,
         "source": {"table": "files", "lsn": lsn}}
    if op != "d":
        e["after"] = {"k": k, "lang": lang, "size": size}
    if before is not None:
        e["before"] = before
    if tid is not None:
        e["transaction"] = {"id": tid, "total_order": order}
    return json.dumps(e)


def _end(tid, n):
    return json.dumps({"status": "END", "id": tid, "event_count": n})


def test_full_pipeline_with_restart(spark, tmp_root):
    wire = os.path.join(tmp_root, "wire")
    os.makedirs(wire, exist_ok=True)

    def land(name, lines):
        with open(os.path.join(wire, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    # b1: autocommit inserts + start of txn t1
    land("b1.jsonl", [
        _row(1, "py", 100, 1000, 1),
        _row(2, "rs", 200, 1000, 2),
        _row(10, "py", 111, 1000, 3, tid="t1", order=1),
        "{poison-line",
    ])
    # b2: t1 completes (second row + marker); autocommit update of k=1
    land("b2.jsonl", [
        _row(11, "go", 222, 1000, 4, tid="t1", order=2),
        _end("t1", 2),
        _row(1, "py", 150, 2000, 5, op="u"),
    ])
    # b3: autocommit delete of k=2; txn t2 never completes
    land("b3.jsonl", [
        _row(2, None, None, 3000, 6, op="d", before={"k": 2}),
        _row(99, "zz", 999, 3000, 7, tid="t2", order=1),
    ])

    lake_schema = StructType(
        [StructField("op_ts", TimestampType()),
         StructField("seq", LongType())] + list(PAYLOAD.fields))
    files = LakeTable.create(
        spark, os.path.join(tmp_root, "files"), lake_schema,
        key_cols=["k"], version_cols=["op_ts", "seq"], n_buckets=4,
    )
    gate_path = os.path.join(tmp_root, "gate")
    create_txn_gate(spark, gate_path, n_buckets=2)
    ckpt = os.path.join(tmp_root, "ckpt")
    qdir = os.path.join(tmp_root, "dead")
    schemas, tables = {"files": PAYLOAD}, {"files": files}

    # first incarnation: stop after the first progress (restart story)
    q = stream_txn_ingest(spark, wire, gate_path, schemas, tables, ckpt,
                          quarantine_dir=qdir, max_files_per_trigger=1)
    while not q.recentProgress:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)
    # second incarnation drains the rest
    q2 = stream_txn_ingest(spark, wire, gate_path, schemas, tables, ckpt,
                           quarantine_dir=qdir, max_files_per_trigger=1)
    q2.awaitTermination(180)
    assert not q2.isActive

    # ---- final lake state: whole transactions + autocommit effects only
    state = {r["k"]: (r["lang"], r["size"])
             for r in files.read().collect()}
    assert state == {
        1: ("py", 150),     # update won by LWW
        10: ("py", 111),    # txn t1, whole
        11: ("go", 222),
    }  # k=2 deleted; t2 (k=99) withheld

    # ---- the incomplete transaction is visible to ops, not to readers
    gate = TxnGate.load(spark, gate_path)
    pend = gate.pending().collect()
    assert [r["txn_id"] for r in pend] == ["t2"]

    # ---- poison landed exactly once across both incarnations
    dead = spark.read.option("recursiveFileLookup", "true").parquet(qdir)
    assert [r["reason"] is not None for r in dead.collect()] == [True]

    # ---- downstream replica via the change feed
    replica = LakeTable.create(
        spark, os.path.join(tmp_root, "replica"), lake_schema,
        key_cols=["k"], version_cols=["op_ts", "seq"], n_buckets=4,
        props={"cursor_prefixes": "sync"},
    )
    sync_changes(files, replica)
    rep = {r["k"]: (r["lang"], r["size"]) for r in replica.read().collect()}
    assert rep == state

    # ---- incremental rollup: bytes per lang, exact
    rollup = create_aggregate_table(
        spark, os.path.join(tmp_root, "rollup"), files,
        group_cols=["lang"], sum_names=["bytes"], n_buckets=2,
    )
    sync_aggregate(files, rollup, ["lang"],
                   {"bytes": F.col("size").cast("bigint")})
    agg = {r["lang"]: (r["n_rows"], r["bytes"])
           for r in rollup.read().collect()}
    assert agg == {"py": (2, 261), "go": (1, 222)}

    # ---- freshness: replica caught up
    lag = {r["consumer"]: r for r in consumer_lag(
        spark, files, {"replica": replica}).collect()}
    assert lag["replica"]["caught_up"]
