"""spark-submit entry point: LakeTable maintenance (the Iceberg-actions
surface — compaction, snapshot expiry, orphan-file vacuum).

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/maintenance_job.py --table-path TBL \
        [--compact] [--expire-keep-last N] \
        [--vacuum-older-than-sec S] [--rebucket N] \
        [--expire-tombstones-before 2024-01-01T00:00:00] \
        [--set-prop bloom_cols=repo|path --set-prop bloom_bits=auto \
         --backfill-stats]

Run it on a schedule beside the replay job (the reference's analogue is
the monthly re-capture/cleanup cadence). Each action is its own atomic
snapshot commit; a concurrent replay writer losing a commit race simply
retries, and vice versa. Order: compact → expire → vacuum (vacuum only
reclaims files no remaining snapshot references, after the grace window).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table-path", required=True)
    ap.add_argument("--compact", action="store_true",
                    help="fold multi-file / nonunique buckets to one file")
    ap.add_argument("--expire-tombstones-before", default=None,
                    help="ISO event-time watermark: compaction drops older "
                         "tombstones (bounded-lateness contract)")
    ap.add_argument("--expire-keep-last", type=int, default=None,
                    help="drop snapshot metadata older than the newest N")
    ap.add_argument("--vacuum-older-than-sec", type=float, default=None,
                    help="delete unreferenced data files older than this "
                         "grace window (e.g. 3600)")
    ap.add_argument("--reclaim-staging", action="store_true",
                    help="also remove crashed writers' .stage trees older "
                         "than the window (use a window above the longest "
                         "plausible merge)")
    ap.add_argument("--rebucket", type=int, default=None,
                    help="rewrite the table into this bucket count "
                         "(O(table); layout evolution)")
    ap.add_argument("--set-prop", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="set a table prop first (e.g. stats_cols=...,"
                         " bloom_cols=repo|path, bloom_bits=auto);"
                         " repeatable")
    ap.add_argument("--backfill-stats", action="store_true",
                    help="harvest zone maps and Bloom filters for "
                         "referenced files that predate stats_cols/"
                         "bloom_cols (migration entry point)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("etl_spark-maintenance").getOrCreate()

    from etl_spark.lake import LakeTable

    table = LakeTable.load(spark, args.table_path)
    report: dict = {"table": args.table_path,
                    "version_before": table.current_version()}

    if args.set_prop:
        props = dict(kv.split("=", 1) for kv in args.set_prop)
        table.alter_props(props)
        report["props_set"] = sorted(props)
    if args.backfill_stats:
        report["backfilled_files"] = table.backfill_stats()
    if args.rebucket is not None:
        report["rebucketed_to"] = args.rebucket
        table.rebucket(args.rebucket)
    if args.compact:
        wm = (dt.datetime.fromisoformat(args.expire_tombstones_before)
              if args.expire_tombstones_before else None)
        report["compacted_buckets"] = table.compact(
            expire_tombstones_before=wm)
    if args.expire_keep_last is not None:
        report["expired_snapshots"] = len(
            table.expire_snapshots(keep_last=args.expire_keep_last))
    if args.vacuum_older_than_sec is not None:
        report["vacuumed_files"] = len(
            table.vacuum(older_than_sec=args.vacuum_older_than_sec,
                         reclaim_staging=args.reclaim_staging))

    report["version_after"] = table.current_version()
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
