"""Composed day-2 ops loop: detect wire loss → repair → converge.

The audit/repair/consumer layers each have their own gates; this test
pins the LOOP a production operator actually runs when a connector
silently drops a window:

1. a wire with a dropped offset window replays into the lake (nobody
   notices at ingest time — the stream just looks shorter),
2. `sequence_gap_stats` on the wire metadata flags `missing > 0` and
   `sequence_gaps` locates the exact runs,
3. one fresh upstream snapshot + `reconcile_snapshot` repairs the lake
   through the normal exactly-once MERGE,
4. the repair propagates to a downstream replica through `sync_changes`
   like any ordinary wave — every layer converges on the truth.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.cdc import reconcile_snapshot, sync_changes
from etl_spark.cdc.gaps import sequence_gap_stats, sequence_gaps
from etl_spark.lake import LakeTable

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("seq", LongType()),
    StructField("name", StringType()),
])


def test_gap_detect_reconcile_sync_converges(spark, tmp_root):
    n = 200
    truth = [(k, k, f"v{k}") for k in range(n)]  # seq == k: one event per key
    # the connector silently dropped offsets 60..89 and 140..149
    lost = set(range(60, 90)) | set(range(140, 150))
    wire = spark.createDataFrame(
        [("I", k, s, v) for (k, s, v) in truth if s not in lost],
        "op string, k bigint, seq bigint, name string",
    )

    table = LakeTable.create(
        spark, os.path.join(tmp_root, "t"), SCHEMA,
        key_cols=["k"], version_cols=["seq"], n_buckets=4,
    )
    table.merge(wire, manifest_key="wire:0")

    # ---- detect: wire metadata alone flags the loss and locates it
    st = sequence_gap_stats(wire, "seq").collect()[0]
    assert st["missing"] == len(lost) and st["redelivered"] == 0
    runs = sorted((r["gap_lo"], r["gap_hi"])
                  for r in sequence_gaps(wire, "seq", bucket_span=64).collect())
    assert runs == [(60, 89), (140, 149)]

    # ---- repair: one fresh full snapshot, corrections through MERGE
    snapshot = spark.createDataFrame([(k, v) for (k, _, v) in truth],
                                     "k bigint, name string")
    rs = reconcile_snapshot(table, snapshot, {"seq": n + 1},
                            manifest_key="reconcile:1")
    assert rs.inserts == len(lost) and rs.deletes == 0

    # ---- converge: the repair reaches a replica as an ordinary wave
    replica = LakeTable.create(
        spark, os.path.join(tmp_root, "r"), SCHEMA,
        key_cols=["k"], version_cols=["seq"], n_buckets=4,
        props={"cursor_prefixes": "sync"},
    )
    sync_changes(table, replica)
    for t in (table, replica):
        got = {r["k"]: r["name"] for r in t.read().collect()}
        assert got == {k: v for (k, _, v) in truth}

    # healed: a second reconcile (dry run) finds zero corrections
    rs2 = reconcile_snapshot(table, snapshot, {"seq": n + 2},
                             manifest_key="reconcile:2", dry_run=True)
    assert rs2.corrections == 0
