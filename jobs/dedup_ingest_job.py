"""spark-submit entry point: streaming dedup-gated document ingest.

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/dedup_ingest_job.py --docs-dir LANDED --docs-path DOCS \
        --state-path STATE --checkpoint CKPT \
        [--id-col doc_id] [--text-col text] [--version-col v] \
        [--threshold 0.5] [--max-files-per-trigger 8] [--n-buckets 64] \
        [--follow]

Tails a landing directory of parquet document batches through the dedup
gate (exact + verified within-batch LSH + verified near-dup check
against the accumulated sketch state) and commits survivors + sketches
exactly once per micro-batch. Default is a bounded availableNow drain
(schedule it like the replay job); ``--follow`` tails forever. Restarts
resume from the checkpoint; a replayed micro-batch heals through the
gate's docs-before-state crash contract
(etl_spark/cdc/dedup_ingest.py — reference analogue: the idempotent
scheduled capture loop, scripts/geral.py:36-116).
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-dir", required=True,
                    help="landing directory of parquet document batches")
    ap.add_argument("--docs-path", required=True, help="docs LakeTable path")
    ap.add_argument("--state-path", required=True,
                    help="sketch-state LakeTable path")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--version-col", default="v",
                    help="LWW version column of a docs table created on "
                         "first run")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="Jaccard verification threshold for near-dup drops")
    ap.add_argument("--max-bucket", type=int, default=1000)
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--n-buckets", type=int, default=64,
                    help="bucket count for tables created on first run")
    ap.add_argument("--follow", action="store_true",
                    help="tail the landing directory forever instead of a "
                         "bounded availableNow drain")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql.types import StructField, StructType

    spark = SparkSession.builder.appName("etl_spark-dedup-ingest").getOrCreate()

    from etl_spark.cdc.dedup_ingest import create_dedup_state
    from etl_spark.lake import LakeTable
    from etl_spark.streaming import stream_dedup_ingest

    if LakeTable.exists(args.docs_path):
        docs = LakeTable.load(spark, args.docs_path)
    else:
        sample = spark.read.parquet(args.docs_dir)
        schema = StructType(
            [StructField(f.name, f.dataType, True)
             for f in sample.schema.fields if f.name != "op"]
        )
        docs = LakeTable.create(
            spark, args.docs_path, schema,
            key_cols=[args.id_col], version_cols=[args.version_col],
            n_buckets=args.n_buckets,
        )
    if LakeTable.exists(args.state_path):
        state = LakeTable.load(spark, args.state_path)
    else:
        state = create_dedup_state(
            spark, args.state_path, id_col=args.id_col,
            n_buckets=args.n_buckets,
        )

    stats: list = []
    q = stream_dedup_ingest(
        spark, args.docs_dir, docs, state, args.checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.follow,
        stats_sink=stats,
        id_col=args.id_col, text_col=args.text_col,
        threshold=args.threshold, max_bucket=args.max_bucket,
    )
    q.awaitTermination()
    report = {
        "docs": args.docs_path,
        "state": args.state_path,
        "batches": [dataclasses.asdict(s) for s in stats],
        "docs_version": docs.current_version(),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
