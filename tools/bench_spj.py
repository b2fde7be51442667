"""Paired benchmark: storage-partitioned join (lake/spj.cobucket_join)
vs the plain shuffle join Catalyst plans for the same two tables.

Both variants compute the identical inner join of two co-bucketed
LakeTables (same snapshots, same rows) and are timed in the SAME JVM,
interleaved warmup-then-best-of-R — the usual anti-noise protocol
(CLAUDE.md). The SPJ plan is Range -> mapInPandas (zero Exchange); the
plain plan must Exchange BOTH sides (Catalyst cannot see the shared
layout of plain parquet) plus the merge-on-read aggregates' own
shuffles. Reported: wall per variant, speedup, and the Exchange count
straight from each executed plan.

Usage: python tools/bench_spj.py [rows_left] [rows_right] [n_buckets] [reps]
Env:   SPARK_GRAFT_CPUS (default 8), SPJ_SCRATCH (default /dev/shm)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    rows_l = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rows_r = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    scratch = tempfile.mkdtemp(prefix="spj_bench_",
                               dir=os.environ.get("SPJ_SCRATCH", "/dev/shm"))
    from pyspark.sql import functions as F

    from etl_spark.lake import LakeTable, cobucket_join
    from etl_spark.session import get_spark

    spark = get_spark(app_name="bench-spj", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus,
                      extra_conf={"spark.local.dir": scratch + "/sh"})
    spark.sparkContext.setLogLevel("ERROR")
    try:
        def synth(n, seed_mul, payload):
            # deterministic key skew-free synthesis: keys shared across
            # sides by construction (repo/path grid), unique versions
            return (spark.range(n)
                    .withColumn("repo", F.concat(
                        F.lit("r"), (F.col("id") % 3000).cast("string")))
                    .withColumn("path", F.concat(
                        F.lit("p"), (F.col("id") % 977).cast("string")))
                    .withColumn("event_id",
                                F.col("id") * seed_mul + seed_mul)
                    .withColumn("op", F.lit("I"))
                    .withColumn(payload,
                                (F.col("id") * 7 % 100000).cast("long"))
                    .drop("id"))

        lt = LakeTable.create(
            spark, os.path.join(scratch, "l"),
            synth(1, 1, "size").drop("op").schema,
            key_cols=["repo", "path"], version_cols=["event_id"],
            n_buckets=n_buckets, props={"write_metrics": "coarse"})
        rt = LakeTable.create(
            spark, os.path.join(scratch, "r"),
            synth(1, 1, "stars").drop("op").schema,
            key_cols=["repo", "path"], version_cols=["event_id"],
            n_buckets=n_buckets, props={"write_metrics": "coarse"})
        lt.merge(synth(rows_l, 3, "size"), manifest_key="l:0")
        rt.merge(synth(rows_r, 5, "stars"), manifest_key="r:0")

        def spj():
            return cobucket_join(lt, rt)

        def plain():
            r = rt.read().withColumnsRenamed({"event_id": "event_id_r"})
            return lt.read().join(r, on=["repo", "path"], how="inner")

        def exchanges(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange")

        # warmup both (JIT + Python worker pool), then interleave reps
        n_spj = spj().count()
        n_plain = plain().count()
        assert n_spj == n_plain, (n_spj, n_plain)
        walls = {"spj": [], "plain": []}
        for _ in range(reps):
            for name, fn in (("spj", spj), ("plain", plain)):
                t0 = time.monotonic()
                fn().count()
                walls[name].append(time.monotonic() - t0)
        best = {k: min(v) for k, v in walls.items()}
        out = {
            "rows_left": rows_l, "rows_right": rows_r,
            "n_buckets": n_buckets, "cpus": cpus,
            "join_rows": n_spj,
            "spj_sec": round(best["spj"], 3),
            "plain_sec": round(best["plain"], 3),
            "speedup": round(best["plain"] / best["spj"], 2),
            "spj_exchanges": exchanges(spj()),
            "plain_exchanges": exchanges(plain()),
            "reps": reps,
            "walls": {k: [round(x, 3) for x in v]
                      for k, v in walls.items()},
        }
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
