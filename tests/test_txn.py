"""Transaction-boundary gate: whole source transactions or nothing.

Pins: completeness in any arrival order (marker first, rows first,
split across waves), autocommit pass-through, release/confirm crash
protocol (unconfirmed releases re-release; confirmed ones evict),
manifest-keyed wave idempotence, abandoned-transaction ops surface,
and the composed path gate → parse → MERGE applying a transaction
atomically.
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

from etl_spark.cdc import create_txn_gate, parse_envelopes
from etl_spark.cdc.txn import TxnGate
from etl_spark.lake import LakeTable


def _row(k, name, ts_ms, lsn, tid=None, order=None, op="c"):
    e = {"op": op, "ts_ms": ts_ms,
         "source": {"table": "files", "lsn": lsn},
         "after": {"k": k, "name": name}}
    if tid is not None:
        e["transaction"] = {"id": tid, "total_order": order}
    return json.dumps(e)


def _end(tid, n):
    return json.dumps({"status": "END", "id": tid, "event_count": n})


def _begin(tid):
    return json.dumps({"status": "BEGIN", "id": tid, "event_count": None})


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "value string")


def _gate(spark, root):
    return create_txn_gate(spark, os.path.join(root, "gate"), n_buckets=4)


def test_autocommit_and_complete_txn_release(spark, tmp_root):
    gate = _gate(spark, tmp_root)
    out, st = gate.apply_wave(_df(spark, [
        _row(1, "solo", 1000, 1),                      # autocommit
        _begin("t1"),
        _row(2, "a", 1000, 2, tid="t1", order=1),
        _row(3, "b", 1000, 3, tid="t1", order=2),
        _end("t1", 2),
    ]), wave=0)
    vals = [r["value"] for r in out.collect()]
    assert st.autocommit_rows == 1 and st.released_rows == 2
    assert st.released_txns == 1 and st.buffered_rows == 0
    ks = {json.loads(v)["after"]["k"] for v in vals}
    assert ks == {1, 2, 3}
    gate.confirm_released(0)
    assert gate.buffer.read().count() == 0
    assert gate.markers.read().count() == 0


def test_any_arrival_order_across_waves(spark, tmp_root):
    gate = _gate(spark, tmp_root)
    # wave 0: marker before any rows
    out0, st0 = gate.apply_wave(_df(spark, [_end("t1", 2)]), wave=0)
    assert out0.count() == 0 and st0.released_rows == 0
    gate.confirm_released(0)
    # wave 1: first row — still incomplete
    out1, st1 = gate.apply_wave(
        _df(spark, [_row(1, "a", 1000, 1, tid="t1", order=1)]), wave=1)
    assert out1.count() == 0 and st1.buffered_rows == 1
    gate.confirm_released(1)
    # wave 2: second row completes it
    out2, st2 = gate.apply_wave(
        _df(spark, [_row(2, "b", 1000, 2, tid="t1", order=2)]), wave=2)
    assert st2.released_rows == 2 and st2.released_txns == 1
    assert {json.loads(r["value"])["after"]["k"]
            for r in out2.collect()} == {1, 2}
    gate.confirm_released(2)
    assert gate.buffer.read().count() == 0


def test_unconfirmed_release_re_releases(spark, tmp_root):
    """Crash between downstream apply and confirm: the transaction is
    still buffered and still complete, so the next wave re-releases it
    (downstream is idempotent)."""
    gate = _gate(spark, tmp_root)
    out0, st0 = gate.apply_wave(_df(spark, [
        _row(1, "a", 1000, 1, tid="t1", order=1), _end("t1", 1),
    ]), wave=0)
    assert st0.released_rows == 1
    # no confirm — simulated crash; reload the gate like a new process
    gate2 = TxnGate.load(spark, os.path.join(tmp_root, "gate"))
    out1, st1 = gate2.apply_wave(_df(spark, []), wave=1)
    assert st1.released_rows == 1
    gate2.confirm_released(1)
    assert gate2.buffer.read().count() == 0
    out2, st2 = gate2.apply_wave(_df(spark, []), wave=2)
    assert st2.released_rows == 0


def test_replayed_wave_is_idempotent(spark, tmp_root):
    """Same wave re-fed (streaming restart): buffer merges are manifest
    no-ops — no double-buffering, same release."""
    gate = _gate(spark, tmp_root)
    batch = _df(spark, [
        _row(1, "a", 1000, 1, tid="t1", order=1),
        _row(2, "b", 1000, 2, tid="t2", order=1),  # incomplete
        _end("t1", 1),
    ])
    _, st0 = gate.apply_wave(batch, wave=0)
    assert st0.released_rows == 1 and st0.buffered_rows == 1
    gate.confirm_released(0)
    _, st1 = gate.apply_wave(batch, wave=0)  # replay
    assert st1.released_rows == 0 and st1.buffered_rows == 1
    assert gate.buffer.read().count() == 1


def test_pending_and_discard_abandoned(spark, tmp_root):
    gate = _gate(spark, tmp_root)
    gate.apply_wave(_df(spark, [
        _row(1, "a", 1000, 1, tid="dead", order=1),
        _row(2, "b", 1000, 2, tid="open", order=1),
        _end("open", 2),  # expects 2, only 1 arrived
    ]), wave=0)
    gate.confirm_released(0)
    pend = {r["txn_id"]: (r["rows_buffered"], r["expected"])
            for r in gate.pending().collect()}
    assert pend == {"dead": (1, None), "open": (1, 2)}
    assert gate.discard("dead", wave=1) == 1
    assert {r["txn_id"] for r in gate.pending().collect()} == {"open"}


def test_gate_composes_with_parse_and_merge(spark, tmp_root):
    """Atomicity downstream: with the gate, lake state never holds half
    a transaction — the incomplete one contributes nothing."""
    payload = StructType(
        [StructField("k", LongType()), StructField("name", StringType())])
    table = LakeTable.create(
        spark, os.path.join(tmp_root, "t"),
        StructType([StructField("op_ts", TimestampType()),
                    StructField("seq", LongType())] + list(payload.fields)),
        key_cols=["k"], version_cols=["op_ts", "seq"], n_buckets=2,
    )
    gate = _gate(spark, tmp_root)
    out, _ = gate.apply_wave(_df(spark, [
        _row(1, "whole-a", 1000, 1, tid="t1", order=1),
        _row(2, "whole-b", 1000, 2, tid="t1", order=2),
        _end("t1", 2),
        _row(9, "half", 1000, 3, tid="t2", order=1),  # END never arrives
        _row(5, "auto", 1000, 4),
    ]), wave=0)
    good, bad = parse_envelopes(out, payload)
    assert bad.count() == 0
    table.merge(good.drop("_table"), manifest_key="w:0")
    gate.confirm_released(0)

    assert {r["k"] for r in table.read().collect()} == {1, 2, 5}
    assert gate.pending().count() == 1


def test_stream_txn_ingest_atomic_and_resumes(spark, tmp_root):
    """Streaming composition: a transaction split across micro-batch
    files applies only when its END lands (possibly after a restart)."""
    from etl_spark.streaming import stream_txn_ingest

    payload = StructType(
        [StructField("k", LongType()), StructField("name", StringType())])
    schemas = {"files": payload}
    tables = {"files": LakeTable.create(
        spark, os.path.join(tmp_root, "files"),
        StructType([StructField("op_ts", TimestampType()),
                    StructField("seq", LongType())] + list(payload.fields)),
        key_cols=["k"], version_cols=["op_ts", "seq"], n_buckets=2,
    )}
    gate_path = os.path.join(tmp_root, "gate")
    create_txn_gate(spark, gate_path, n_buckets=2)
    wire = os.path.join(tmp_root, "wire")
    os.makedirs(wire, exist_ok=True)

    def land(name, lines):
        with open(os.path.join(wire, name), "w") as f:
            f.write("\n".join(lines) + "\n")

    land("b1.jsonl", [
        _row(1, "auto", 1000, 1),
        _row(2, "txn-a", 1000, 2, tid="t1", order=1),
    ])
    ckpt = os.path.join(tmp_root, "ckpt")
    q = stream_txn_ingest(spark, wire, gate_path, schemas, tables, ckpt,
                          max_files_per_trigger=1)
    q.awaitTermination(120)
    assert not q.isActive
    # only the autocommit row is visible; t1 is buffered whole
    assert {r["k"] for r in tables["files"].read().collect()} == {1}

    # second incarnation completes the transaction
    land("b2.jsonl", [
        _row(3, "txn-b", 1000, 3, tid="t1", order=2),
        _end("t1", 2),
    ])
    q2 = stream_txn_ingest(spark, wire, gate_path, schemas, tables, ckpt,
                           max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert not q2.isActive
    assert {r["k"] for r in tables["files"].read().collect()} == {1, 2, 3}
    gate = TxnGate.load(spark, gate_path)
    assert gate.buffer.read().count() == 0


def test_marker_only_txn_is_visible_and_discardable(spark, tmp_root):
    """An END marker whose rows never arrive is abandoned state too: it
    must surface in pending() (rows_buffered=0) and discard() must
    remove it, or the marker table grows forever."""
    gate = _gate(spark, tmp_root)
    gate.apply_wave(_df(spark, [_end("orphan", 3)]), wave=0)
    gate.confirm_released(0)
    pend = {r["txn_id"]: (r["rows_buffered"], r["expected"])
            for r in gate.pending().collect()}
    assert pend == {"orphan": (0, 3)}
    assert gate.discard("orphan", wave=1) == 0
    assert gate.pending().count() == 0
    assert gate.markers.read().count() == 0


def test_missing_total_order_rows_do_not_collide(spark, tmp_root):
    """Two transactional rows whose blocks lack total_order must not
    collapse on the (txn_id, total_order) buffer key: each gets a
    synthesized NEGATIVE tiebreak (hash of its raw line), so the
    buffered count reaches event_count and the transaction releases
    whole — previously both coalesced to 0, one row was silently lost,
    and the transaction was stuck pending forever."""
    gate = _gate(spark, tmp_root)
    out, st = gate.apply_wave(_df(spark, [
        _row(1, "a", 1000, 1, tid="t1", order=None),
        _row(2, "b", 1000, 2, tid="t1", order=None),
        _row(3, "c", 1000, 3, tid="t1", order=1),
        _end("t1", 3),
    ]), wave=0)
    assert st.released_rows == 3 and st.released_txns == 1
    ks = {json.loads(r["value"])["after"]["k"] for r in out.collect()}
    assert ks == {1, 2, 3}
    gate.confirm_released(0)
    assert gate.buffer.read().count() == 0
    # synthesized tiebreaks stay disjoint from legit nonnegative orders:
    # a genuine order=0 row coexists with an order-less one
    out2, st2 = gate.apply_wave(_df(spark, [
        _row(4, "d", 1000, 4, tid="t2", order=0),
        _row(5, "e", 1000, 5, tid="t2", order=None),
        _end("t2", 2),
    ]), wave=1)
    assert st2.released_rows == 2 and st2.released_txns == 1


def test_missing_total_order_redelivery_is_idempotent(spark, tmp_root):
    """A redelivered order-less row hashes to the same tiebreak and
    LWW-collapses — exactly like a redelivered well-formed row."""
    gate = _gate(spark, tmp_root)
    r = _row(1, "a", 1000, 1, tid="t1", order=None)
    out0, st0 = gate.apply_wave(_df(spark, [r]), wave=0)
    assert st0.buffered_rows == 1
    gate.confirm_released(0)
    out1, st1 = gate.apply_wave(_df(spark, [r, _end("t1", 1)]), wave=1)
    assert st1.released_rows == 1 and st1.released_txns == 1
