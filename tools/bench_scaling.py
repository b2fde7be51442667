"""Scaling-efficiency evidence (BASELINE.md sandbox protocol).

Runs the identical CDC replay job on the identical deterministic WAL at two
local parallelism levels (local[8] / local[32], shuffle partitions scaled
2x cores), measures events/sec, and writes BENCH/BASELINE.md with
efficiency = (throughput_32 / throughput_8) / (32 / 8).

Methodology notes baked in:
- one JIT/codegen warmup merge per session before timing (the first merge
  compiles every codegen path and would otherwise bill warmup to the
  smaller level asymmetrically);
- best-of-R repetitions per level (the sandbox VM has noisy neighbors —
  load average >4 at idle was observed; min is the standard noise filter);
- tmpfs scratch for shuffle + table (per-executor disk bandwidth scales
  with executor count on a real cluster; a single shared disk would
  understate scaling);
- fixed n_buckets (table layout must not change with the cluster size).

Usage: python tools/bench_scaling.py [events] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from etl_spark.session import get_spark
from etl_spark.cdc import synth_events, write_event_epochs
from etl_spark.lake import LakeTable
from pyspark.sql.types import StructType

cpus = {cpus}
n_events = {events}
reps = {reps}
n_epochs = {epochs}
n_buckets = 64

scratch = tempfile.mkdtemp(prefix=f"scale{{cpus}}_", dir="/dev/shm")
spark = get_spark(
    app_name=f"scale-{{cpus}}", master=f"local[{{cpus}}]",
    shuffle_partitions=2 * cpus,
    extra_conf={{
        "spark.local.dir": os.path.join(scratch, "shuffle"),
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    }},
)
spark.sparkContext.setLogLevel("ERROR")

wal = os.path.join(scratch, "wal")
ev = synth_events(spark, n_events, n_repos=2000, paths_per_repo=2000,
                  n_epochs=n_epochs, seed=42, hot_pct=30, partitions=2 * cpus)
write_event_epochs(ev, wal)
sample = spark.read.parquet(wal)
user = StructType([f for f in sample.schema.fields if f.name not in ("op", "epoch")])

# JIT/codegen warmup: one small merge on a throwaway table.
wtbl = LakeTable.create(spark, os.path.join(scratch, "warm"), user,
                        ["repo", "path"], ["op_ts", "event_id"], n_buckets=8)
wtbl.merge(spark.read.parquet(os.path.join(wal, "epoch=0")).limit(20000), "warm")

best = None
for r in range(reps):
    tpath = os.path.join(scratch, f"tbl{{r}}")
    tbl = LakeTable.create(spark, tpath, user, ["repo", "path"],
                           ["op_ts", "event_id"], n_buckets=n_buckets)
    t0 = time.monotonic()
    for e in range(n_epochs):
        tbl.merge(spark.read.parquet(os.path.join(wal, f"epoch={{e}}")), f"epoch:{{e}}")
    dt = time.monotonic() - t0
    if best is None or dt < best:
        best = dt
    shutil.rmtree(tpath, ignore_errors=True)

total_events = int(n_events * 1.05)
print(json.dumps({{"cpus": cpus, "replay_sec": round(best, 2),
                  "events_per_sec": round(total_events / best, 1)}}))
spark.stop()
shutil.rmtree(scratch, ignore_errors=True)
"""


def run_level(cpus: int, events: int, reps: int, epochs: int) -> dict:
    code = WORKER.format(repo=REPO, cpus=cpus, events=events, reps=reps, epochs=epochs)
    env = dict(os.environ, SPARK_DRIVER_MEMORY="16g")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=3000,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"level {cpus} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    lo = run_level(8, events, reps, epochs)
    print("local[8]:", lo)
    hi = run_level(32, events, reps, epochs)
    print("local[32]:", hi)
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (32 / 8)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

**Protocol** (BASELINE.md "sandbox evidence protocol"): the identical CDC
replay job (deterministic synthetic WAL, seed=42, {events:,} events + 5%
duplicate re-deliveries, {epochs} epochs, 2 000 repos x 2 000 paths, 30% hot-repo
skew, n_buckets=64 fixed) executed at two parallelism levels on the same
machine. Shuffle partitions scale with cores (2x); table layout does not.
Per level: 1 JIT warmup merge, then best of {reps} full replays (the
sandbox VM shows idle load >4 from noisy neighbors; min filters that).
Scratch (shuffle + table) on tmpfs, standing in for per-executor disks
whose aggregate bandwidth scales with executor count on a real cluster.

| level | shuffle partitions | replay wall (s) | events/sec |
|---|---|---|---|
| local[8]  | 16 | {lo['replay_sec']} | {lo['events_per_sec']:,} |
| local[32] | 64 | {hi['replay_sec']} | {hi['events_per_sec']:,} |

**Scaling efficiency** = (throughput_32 / throughput_8) / (32 / 8)
= ({hi['events_per_sec']:,} / {lo['events_per_sec']:,}) / 4
= **{eff:.3f}** (criterion: >= 0.8)

Workload under test: `etl_spark.cdc.replay.replay_events` — per-epoch
LWW dedup (combinable `max_by` hash aggregate), merge-on-read delta write
bucketed by `pmod(xxhash64(repo, path), 64)`, exactly-once commit manifest
per epoch, auto-compaction threshold 6. See `bench.py` for the per-round
headline numbers recorded by the driver.
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as fh:
        fh.write(md)
    print(f"efficiency={eff:.3f} -> {path}")


if __name__ == "__main__":
    main()
