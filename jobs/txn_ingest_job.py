"""spark-submit entry point: transaction-consistent multi-table ingest.

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/txn_ingest_job.py --wire-dir LANDED --tables-root ROOT \
        --gate-path GATE --checkpoint CKPT --config tables.json \
        [--quarantine-dir DEAD] [--max-files-per-trigger 8] [--follow]

Same wire and table-config shape as ``envelope_ingest_job.py`` (one
JSONL envelope per line, ``tables.json`` declaring payload DDL + keys),
but fed through the transaction gate first: rows carrying a
``transaction`` block are withheld until their END marker arrives with
a matching row count, so the lake tables never hold half an upstream
transaction. The gate state (two LakeTables) is created at
``--gate-path`` on first run. Prints per-table row counts plus the
transactions still pending (the abandoned-transaction ops surface).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wire-dir", required=True)
    ap.add_argument("--tables-root", required=True)
    ap.add_argument("--gate-path", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", required=True,
                    help="JSON file: {table: {ddl, key_cols[, n_buckets]}}")
    ap.add_argument("--quarantine-dir", default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--gate-buckets", type=int, default=16)
    ap.add_argument("--follow", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    spark = SparkSession.builder.appName("etl_spark-txn-ingest").getOrCreate()

    from etl_spark.cdc.txn import TxnGate, create_txn_gate
    from etl_spark.lake import LakeTable
    from etl_spark.streaming import stream_txn_ingest

    with open(args.config) as f:
        config = json.load(f)

    schemas, tables = {}, {}
    for name, spec in config.items():
        payload = StructType.fromDDL(spec["ddl"])
        schemas[name] = payload
        path = os.path.join(args.tables_root, name)
        if LakeTable.exists(path):
            tables[name] = LakeTable.load(spark, path)
        else:
            tables[name] = LakeTable.create(
                spark, path,
                StructType([StructField("op_ts", TimestampType()),
                            StructField("seq", LongType())]
                           + list(payload.fields)),
                key_cols=list(spec["key_cols"]),
                version_cols=["op_ts", "seq"],
                n_buckets=int(spec.get("n_buckets", 64)),
            )
    if not LakeTable.exists(os.path.join(args.gate_path, "buffer")):
        create_txn_gate(spark, args.gate_path, n_buckets=args.gate_buckets)

    q = stream_txn_ingest(
        spark, args.wire_dir, args.gate_path, schemas, tables,
        args.checkpoint, quarantine_dir=args.quarantine_dir,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.follow,
    )
    q.awaitTermination()
    gate = TxnGate.load(spark, args.gate_path)
    print(json.dumps({
        "tables": {n: tables[n].read().count() for n in sorted(tables)},
        "pending_txns": [
            {"txn_id": r["txn_id"], "rows_buffered": r["rows_buffered"],
             "expected": r["expected"]}
            for r in gate.pending().collect()
        ],
    }))


if __name__ == "__main__":
    main()
