"""Paired A/B: merge wall with vs without CHECK constraints.

The claim under test (lake/constraints.py): enforcement adds ZERO extra
passes — the guard folds into the write's own projection, so a clean
batch pays only a codegen'd boolean per constraint per row. Both legs
run in the SAME JVM, interleaved A/B/A/B (same neighbor-load window),
fresh table per merge, identical synthetic batch. Prints one JSON line.

Usage: python tools/bench_constraints.py [n_rows] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from etl_spark.lake import LakeTable
    from etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)

    def batch():
        return spark.range(n_rows).select(
            F.col("id").alias("event_id"),
            F.lit("I").alias("op"),
            (F.lit("2024-01-01").cast("timestamp")
             + F.make_interval(secs=F.col("id") % 86400)).alias("ts"),
            (F.col("id") % 997).alias("user_id"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )

    schema = batch().drop("op").schema
    cons = ('{"nonneg": "value >= 0", "uid": "user_id >= 0", '
            '"ts_sane": "ts >= TIMESTAMP\'2020-01-01\'"}')
    root = tempfile.mkdtemp(prefix="bench_cons_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    walls = {"off": [], "on3": []}
    try:
        legs = [("off", None), ("on3", cons)] * reps
        # one untimed warmup leg (JIT) before the pairs
        for name, c in [("warm", None)] + legs:
            path = os.path.join(root, f"t{len(os.listdir(root))}")
            props = {"check_constraints": c} if c else None
            t = LakeTable.create(spark, path, schema,
                                 key_cols=["event_id"], version_cols=["ts"],
                                 n_buckets=16, props=props)
            t0 = time.monotonic()
            t.merge(batch(), "e0")
            wall = time.monotonic() - t0
            if name in walls:
                walls[name].append(round(wall, 3))
            shutil.rmtree(path, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    best_off, best_on = min(walls["off"]), min(walls["on3"])
    print(json.dumps({
        "n_rows": n_rows, "reps": reps, "cpus": cpus,
        "merge_sec_off": walls["off"], "merge_sec_on3": walls["on3"],
        "best_off": best_off, "best_on3": best_on,
        "overhead_pct_3_constraints": round(100 * (best_on / best_off - 1), 1),
    }))


if __name__ == "__main__":
    main()
