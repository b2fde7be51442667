"""spark-submit entry point: streaming multi-table CDC envelope ingest.

Ship as:

    python tools/package.py                       # -> dist/etl_spark.zip
    spark-submit --py-files dist/etl_spark.zip \
        jobs/envelope_ingest_job.py --wire-dir LANDED --tables-root ROOT \
        --checkpoint CKPT --config tables.json \
        [--quarantine-dir DEAD] [--max-files-per-trigger 8] [--follow]

``tables.json`` declares the routed tables, one entry per
``source.table`` name the connector emits::

    {
      "files":   {"ddl": "k bigint, name string, score double",
                  "key_cols": ["k"], "n_buckets": 64},
      "commits": {"ddl": "cid bigint, msg string",
                  "key_cols": ["cid"]}
    }

``ddl`` is the payload schema (the envelope's ``before``/``after``
shape); every table gets the envelope version columns
``op_ts timestamp, seq bigint`` prepended and is created on first run
(or loaded if it already exists at ``ROOT/<name>``). The wire directory
holds newline-delimited envelope JSON files — the landing shape of a
Kafka-connect file/object-store sink; on a cluster with Kafka, swap the
reader inside ``stream_envelope_ingest`` for the kafka source.

Default is a bounded availableNow drain (schedule it like the replay
job); ``--follow`` tails forever. Restarts resume from the checkpoint
with per-(micro-batch, table) exactly-once manifests; poison messages
and unknown tables land under ``--quarantine-dir`` idempotently.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wire-dir", required=True,
                    help="landing directory of envelope JSONL files")
    ap.add_argument("--tables-root", required=True,
                    help="directory holding one LakeTable per routed table")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", required=True,
                    help="JSON file: {table: {ddl, key_cols[, n_buckets]}}")
    ap.add_argument("--quarantine-dir", default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--infer-drift", action="store_true",
                    help="discover payload keys beyond the declared DDL "
                         "per micro-batch and evolve the lake tables "
                         "additively mid-stream")
    ap.add_argument("--follow", action="store_true",
                    help="tail the wire directory forever instead of a "
                         "bounded availableNow drain")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    spark = SparkSession.builder.appName(
        "etl_spark-envelope-ingest").getOrCreate()

    from etl_spark.lake import LakeTable
    from etl_spark.streaming import stream_envelope_ingest

    with open(args.config) as f:
        config = json.load(f)

    schemas: dict[str, StructType] = {}
    tables: dict[str, LakeTable] = {}
    for name, spec in config.items():
        payload = StructType.fromDDL(spec["ddl"])
        schemas[name] = payload
        path = os.path.join(args.tables_root, name)
        if LakeTable.exists(path):
            tables[name] = LakeTable.load(spark, path)
        else:
            lake_schema = StructType(
                [StructField("op_ts", TimestampType()),
                 StructField("seq", LongType())] + list(payload.fields)
            )
            tables[name] = LakeTable.create(
                spark, path, lake_schema,
                key_cols=list(spec["key_cols"]),
                version_cols=["op_ts", "seq"],
                n_buckets=int(spec.get("n_buckets", 64)),
            )

    q = stream_envelope_ingest(
        spark, args.wire_dir, schemas, tables, args.checkpoint,
        quarantine_dir=args.quarantine_dir,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.follow,
        infer_drift=args.infer_drift,
    )
    q.awaitTermination()
    summary = {
        name: tables[name].read().count() for name in sorted(tables)
    }
    print(json.dumps({"tables": summary}))


if __name__ == "__main__":
    main()
