"""spark-submit entry point: chunked initial-snapshot bootstrap with
live-tail handoff (cdc/bootstrap.py).

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/bootstrap_job.py --snapshot PARQUET_DIR --dest TABLE \
        [--stamp v=1000 ...] [--tag init] [--chunks 16]

``--snapshot`` is a parquet directory holding one full source read (key
+ payload columns; include the table's version columns and omit
``--stamp`` when the source exposes per-row versions — the faithful
form). Run it WHILE the live tail (replay/envelope job) keeps merging:
every snapshot-vs-stream race resolves by LWW, chunks are exactly-once,
and a crashed run resumed with the same ``--tag``/``--chunks`` skips the
chunks already in the ledger. Tombstone expiry stays blocked until the
last chunk lands (see BOOTSTRAP_FLOOR_PROP).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True,
                    help="parquet dir: one full source read")
    ap.add_argument("--dest", required=True, help="LakeTable path")
    ap.add_argument("--stamp", nargs="*", default=None, metavar="COL=VAL",
                    help="uniform source-position stamp, one per version "
                         "column; omit when the snapshot carries per-row "
                         "version columns")
    ap.add_argument("--tag", default="init")
    ap.add_argument("--chunks", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("etl_spark-bootstrap").getOrCreate()

    from etl_spark.cdc.bootstrap import bootstrap_snapshot
    from etl_spark.lake import LakeTable

    dest = LakeTable.load(spark, args.dest)
    version = None
    if args.stamp:
        # values cast through the table's own column types inside
        # bootstrap_snapshot, so strings are fine here
        version = dict(p.split("=", 1) for p in args.stamp)
    stats = bootstrap_snapshot(
        dest, spark.read.parquet(args.snapshot), version,
        tag=args.tag, n_chunks=args.chunks,
    )
    print(json.dumps({
        "tag": stats.tag,
        "chunks_total": stats.chunks_total,
        "chunks_applied": stats.chunks_applied,
        "chunks_skipped": stats.chunks_skipped,
        "rows_loaded": stats.rows_loaded,
        "table_version": stats.table_version,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
