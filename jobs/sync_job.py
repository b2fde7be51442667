"""spark-submit entry point: incremental downstream sync (change feed →
second LakeTable with a crash-safe cursor).

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/sync_job.py --src-path UPSTREAM --dst-path DOWNSTREAM \
        [--n-buckets 64] [--prefix sync] [--full-refresh]

Run it on a schedule beside the replay job (the reference's analogue:
downstream consumers re-deriving warehouse tables from the capture
history, scripts/geral.py:92-109). Each round is one atomic commit that
lands the new change-feed range AND advances the cursor; re-running a
crashed round is a metadata no-op. The destination is created on first
run with ``cursor_prefixes`` set so cursor metadata stays bounded.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src-path", required=True)
    ap.add_argument("--dst-path", required=True)
    ap.add_argument("--n-buckets", type=int, default=64,
                    help="bucket count for a destination created on first run")
    ap.add_argument("--prefix", default="sync",
                    help="cursor manifest-key prefix")
    ap.add_argument("--full-refresh", action="store_true",
                    help="bootstrap from the upstream snapshot state "
                         "(recovery past the snapshot-retention horizon)")
    ap.add_argument("--count-rows", action="store_true",
                    help="also report the destination's live row count — "
                         "an O(table) scan, off by default so a scheduled "
                         "incremental round stays O(changed rows)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("etl_spark-sync").getOrCreate()

    from etl_spark.cdc.sync import last_synced_version, sync_changes
    from etl_spark.lake import LakeTable

    src = LakeTable.load(spark, args.src_path)
    if LakeTable.exists(args.dst_path):
        dst = LakeTable.load(spark, args.dst_path)
    else:
        snap = src.current_snapshot()
        dst = LakeTable.create(
            spark, args.dst_path, snap.schema,
            key_cols=snap.key_cols, version_cols=snap.version_cols,
            n_buckets=args.n_buckets,
            props={"cursor_prefixes": args.prefix},
        )

    stats = sync_changes(src, dst, prefix=args.prefix,
                         full_refresh=args.full_refresh)
    report = {
        "src": args.src_path,
        "dst": args.dst_path,
        "src_version": src.current_version(),
        "cursor": last_synced_version(dst, args.prefix),
        "applied": stats.applied if stats is not None else False,
        "caught_up": stats is None,
        "rows_written": stats.rows_written if stats is not None else 0,
    }
    if args.count_rows:
        report["rows"] = dst.read().count()
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
