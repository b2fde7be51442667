"""spark-submit entry point: SCD Type-2 maintenance (landed WAL epochs →
current + history interval tables).

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/scd2_job.py --events-dir WAL_DIR --root SCD2_ROOT \
        --key-cols repo,path --version-cols op_ts,event_id \
        [--n-buckets 32]

Idempotent: epochs already in the manifests are metadata no-ops, so the
job resumes after any crash (including between a history and a current
commit — see etl_spark/cdc/scd2.py for the ordering contract). Run it on
a schedule beside the replay job; for a live stream use
``streaming.stream_scd2`` instead. Reference analogue: the scheduled
re-capture loop maintaining ``%s_versoes`` history tables
(scripts/geral.py:36-116, bd.py:77-84).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events-dir", required=True,
                    help="landed WAL directory (epoch=N parquet subdirs)")
    ap.add_argument("--root", required=True,
                    help="SCD2 root (current/ and history/ tables under it)")
    ap.add_argument("--key-cols", default="repo,path")
    ap.add_argument("--version-cols", default="op_ts,event_id")
    ap.add_argument("--n-buckets", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("etl_spark-scd2").getOrCreate()

    from etl_spark.cdc.scd2 import replay_scd2, scd2_view

    cur, hist, stats = replay_scd2(
        spark, args.events_dir, args.root,
        key_cols=[c for c in args.key_cols.split(",") if c],
        version_cols=[c for c in args.version_cols.split(",") if c],
        n_buckets=args.n_buckets,
    )
    report = {
        "root": args.root,
        "epochs_seen": len(stats),
        "epochs_applied": sum(1 for h, c in stats if c.applied),
        "open_intervals": cur.read().count(),
        "closed_intervals": hist.read().count(),
        "current_version": cur.current_version(),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
