"""spark-submit entry point: replay a landed WAL into a LakeTable.

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/replay_job.py --events-dir WAL --table-path TBL \
        [--n-buckets 64] [--streaming --checkpoint-dir CKPT \
         --max-files-per-trigger K]

On a cluster, add the usual --master/--num-executors flags; the job itself
is agnostic (it uses the session spark-submit builds). Batch mode replays
pending epochs idempotently; streaming mode drains via availableNow with
exactly-once manifests and resumes from the checkpoint.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events-dir", required=True)
    ap.add_argument("--table-path", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--metrics-dir", default=None)
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("etl_spark-replay").getOrCreate()
    from etl_spark.metrics import MetricsSink

    sink = MetricsSink(args.metrics_dir) if args.metrics_dir else None

    if args.streaming:
        if not args.checkpoint_dir:
            ap.error("--streaming requires --checkpoint-dir")
        from pyspark.sql.types import StructType

        from etl_spark.lake import LakeTable
        from etl_spark.streaming import stream_replay

        if LakeTable.exists(args.table_path):
            table = LakeTable.load(spark, args.table_path)
        else:
            sample = spark.read.parquet(args.events_dir)
            user = StructType(
                [f for f in sample.schema.fields if f.name not in ("op", "epoch")]
            )
            table = LakeTable.create(
                spark, args.table_path, user, key_cols=["repo", "path"],
                version_cols=["op_ts", "event_id"], n_buckets=args.n_buckets,
            )
        q = stream_replay(
            spark, args.events_dir, table, args.checkpoint_dir,
            max_files_per_trigger=args.max_files_per_trigger,
            metrics_sink=sink,
        )
        q.awaitTermination()
        # applied_manifests() is the bounded recent WINDOW (older keys fold
        # into watermarks) — report the total applied_count, not the keys
        snap = table.current_snapshot()
        stats = {"applied_count": snap.applied_count,
                 "recent_window": len(snap.applied)}
    else:
        from etl_spark.cdc.replay import replay_events

        table, merge_stats = replay_events(
            spark, args.events_dir, args.table_path,
            n_buckets=args.n_buckets, metrics_sink=sink,
        )
        stats = [
            {"manifest_key": s.manifest_key, "applied": s.applied,
             "version": s.version}
            for s in merge_stats
        ]

    print(json.dumps({
        "table": args.table_path,
        "version": table.current_version(),
        "rows": table.read().count(),
        "applied": stats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
