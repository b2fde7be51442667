"""spark-submit entry point: incremental join-view maintenance (two
change feeds → denormalized ``fact LEFT JOIN dim`` destination).

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/join_sync_job.py --fact-path FACT --dim-path DIM \
        --dst-path VIEW --dim-on repo \
        [--dim-select owner=repo_owner,tier=tier] \
        [--n-buckets 16] [--prefix jsync] [--full-refresh]

``--dim-on`` lists the fact columns referencing the dim's key columns,
positionally. Run on a schedule beside the replay job; each round applies
the fact leg (bucket-pruned changed keys against the dim's current state)
and the dim leg (affected fact rows re-emitted against the new dim
values), each advancing its cursor in the same atomic commit (reference
analogue: dimension enrichment re-run per capture slice,
comum/geografias.py + comum/datas.py).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fact-path", required=True)
    ap.add_argument("--dim-path", required=True)
    ap.add_argument("--dst-path", required=True)
    ap.add_argument("--dim-on", required=True,
                    help="comma-separated fact columns referencing the "
                         "dim key columns (positional)")
    ap.add_argument("--dim-select", default="",
                    help="comma-separated dim_col=out_name renames; "
                         "default = every dim payload column, same name")
    ap.add_argument("--n-buckets", type=int, default=16,
                    help="bucket count for a view created on first run")
    ap.add_argument("--prefix", default="jsync",
                    help="cursor manifest-key prefix (two cursors: "
                         "<prefix>F and <prefix>D)")
    ap.add_argument("--full-refresh", action="store_true",
                    help="re-bootstrap from both current snapshots "
                         "(recovery past a retention horizon)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("etl_spark-join-sync").getOrCreate()

    from etl_spark.cdc.join_sync import create_join_table, sync_join
    from etl_spark.cdc.sync import last_synced_version
    from etl_spark.lake import LakeTable

    dim_on = [c for c in args.dim_on.split(",") if c]
    dim_select = None
    if args.dim_select:
        dim_select = dict(kv.split("=", 1) for kv in
                          args.dim_select.split(",") if kv)

    fact = LakeTable.load(spark, args.fact_path)
    dim = LakeTable.load(spark, args.dim_path)
    if LakeTable.exists(args.dst_path):
        dst = LakeTable.load(spark, args.dst_path)
    else:
        dst = create_join_table(
            spark, args.dst_path, fact, dim, dim_on,
            dim_select=dim_select, n_buckets=args.n_buckets,
            prefix=args.prefix,
        )

    stats = sync_join(fact, dim, dst, dim_on, dim_select=dim_select,
                      prefix=args.prefix, full_refresh=args.full_refresh)
    report = {
        "fact": args.fact_path,
        "dim": args.dim_path,
        "dst": args.dst_path,
        "fact_cursor": last_synced_version(dst, f"{args.prefix}F"),
        "dim_cursor": last_synced_version(dst, f"{args.prefix}D"),
        "legs_applied": sum(1 for s in stats if s.applied),
        "caught_up": stats == [],
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
