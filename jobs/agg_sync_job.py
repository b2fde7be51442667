"""spark-submit entry point: incremental aggregate maintenance (change
feed → materialized GROUP BY rollup, exact under updates/deletes).

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/agg_sync_job.py --src-path UPSTREAM --dst-path ROLLUP \
        --group-cols lang --sum-cols size_bytes \
        [--n-buckets 16] [--prefix aggsync] [--full-refresh]

Each ``--sum-cols`` entry must be an integral upstream column (fixed-point
measures — see etl_spark/cdc/agg_sync.py for why floats are not safely
maintainable incrementally); the rollup lands it as ``sum_<col>`` beside
``n_rows``. Alternatively pass ``--distinct-cols`` INSTEAD to maintain
approx distinct-EVER cardinalities via HLL sketches
(etl_spark/cdc/sketch_sync.py — O(changed keys), deletes never retract);
each entry lands as a ``distinct_<col>`` estimate column beside its
``distinct_<col>_sketch`` register blob. Run on a schedule beside the replay job; every round touches
only the changed keys' buckets on both ends and advances the cursor in the
same atomic commit (reference analogue: aggregated QA tables re-derived
per capture slice, scripts/geral.py:92-109).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src-path", required=True)
    ap.add_argument("--dst-path", required=True)
    ap.add_argument("--group-cols", required=True,
                    help="comma-separated upstream grouping columns")
    ap.add_argument("--sum-cols", default="",
                    help="comma-separated integral upstream columns to SUM")
    ap.add_argument("--distinct-cols", default="",
                    help="comma-separated upstream columns whose approx "
                         "distinct-EVER count to maintain via HLL sketches "
                         "(mutually exclusive with --sum-cols)")
    ap.add_argument("--n-buckets", type=int, default=16,
                    help="bucket count for a rollup created on first run")
    ap.add_argument("--prefix", default="aggsync",
                    help="cursor manifest-key prefix")
    ap.add_argument("--full-refresh", action="store_true",
                    help="recompute the rollup from the current upstream "
                         "snapshot (recovery past the retention horizon); "
                         "retracts groups that vanished upstream")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("etl_spark-agg-sync").getOrCreate()

    from etl_spark.cdc.agg_sync import (
        create_aggregate_table,
        last_synced_version,
        sync_aggregate,
    )
    from etl_spark.cdc.sketch_sync import (
        create_sketch_table,
        sync_aggregate_sketch,
    )
    from etl_spark.lake import LakeTable

    group_cols = [c for c in args.group_cols.split(",") if c]
    sum_cols = [c for c in args.sum_cols.split(",") if c]
    distinct_cols = [c for c in args.distinct_cols.split(",") if c]
    if sum_cols and distinct_cols:
        raise SystemExit("--sum-cols and --distinct-cols are mutually "
                         "exclusive (exact delta tier vs HLL sketch tier)")
    sums = {f"sum_{c}": F.col(c) for c in sum_cols}

    src = LakeTable.load(spark, args.src_path)
    if distinct_cols:
        distincts = {f"distinct_{c}": F.col(c) for c in distinct_cols}
        if LakeTable.exists(args.dst_path):
            dst = LakeTable.load(spark, args.dst_path)
        else:
            fields = [f for f in src.current_snapshot().schema.fields
                      if f.name in group_cols]
            dst = create_sketch_table(
                spark, args.dst_path, fields, list(distincts),
                n_buckets=args.n_buckets, prefix=args.prefix,
            )
        stats = sync_aggregate_sketch(
            src, dst, group_cols, distincts, prefix=args.prefix,
            full_refresh=args.full_refresh)
    else:
        if LakeTable.exists(args.dst_path):
            dst = LakeTable.load(spark, args.dst_path)
        else:
            dst = create_aggregate_table(
                spark, args.dst_path, src, group_cols, list(sums),
                n_buckets=args.n_buckets, prefix=args.prefix,
            )
        stats = sync_aggregate(src, dst, group_cols, sums,
                               prefix=args.prefix,
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
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
