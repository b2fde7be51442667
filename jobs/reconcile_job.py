"""spark-submit entry point: snapshot reconciliation (anti-entropy).

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/reconcile_job.py --table TBL --snapshot SNAP.parquet \
        --version-json '{"op_ts": "2100-01-01", "seq": 0}' \
        --manifest-key reconcile:2026-08-19 [--dry-run]

``--snapshot`` is a parquet directory holding one fresh, consistent full
read of the upstream (key + payload columns). The job diffs it against
the lake table, applies only the corrections as versioned I/U/D events
through the exactly-once MERGE (or just counts them under ``--dry-run``),
and prints one JSON line of per-op counts. ``--version-json`` supplies
the correction stamp, one value per table version column (string values
are cast to the column's type); the job refuses a stamp that does not
outrank the table's current max version. Re-running with the same
``--manifest-key`` after a crash is a metadata no-op.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="LakeTable path")
    ap.add_argument("--snapshot", required=True,
                    help="parquet path of the fresh full snapshot")
    ap.add_argument("--version-json", required=True,
                    help='correction stamp, e.g. {"op_ts": "2100-01-01", '
                         '"seq": 0}')
    ap.add_argument("--manifest-key", required=True)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("etl_spark-reconcile").getOrCreate()

    from etl_spark.cdc.reconcile import reconcile_snapshot
    from etl_spark.lake import LakeTable

    table = LakeTable.load(spark, args.table)
    snapshot = spark.read.parquet(args.snapshot)
    stats = reconcile_snapshot(
        table,
        snapshot,
        version=json.loads(args.version_json),
        manifest_key=args.manifest_key,
        dry_run=args.dry_run,
    )
    print(json.dumps({
        "inserts": stats.inserts,
        "updates": stats.updates,
        "deletes": stats.deletes,
        "applied": bool(stats.merge and stats.merge.applied),
        "dry_run": args.dry_run,
    }))


if __name__ == "__main__":
    main()
