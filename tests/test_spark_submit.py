"""End-to-end spark-submit smoke test: the ship mechanism itself.

The target deployment is ``spark-submit --py-files dist/etl_spark.zip`` on
a multi-executor cluster; this test runs the real replay and maintenance
jobs through a real ``spark-submit`` subprocess (local master) against a
tiny WAL — proving the packaging (zip import path), the job CLIs, and the
exactly-once resume across two separate driver processes."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"),
                            "bin", "spark-submit")


def _submit(job: str, *args: str, zip_path: str) -> str:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", job), *args],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this machine")
def test_spark_submit_replay_and_maintenance(spark, tmp_root):
    # build the WAL with the in-process session; the jobs get their own JVMs
    from etl_spark.cdc import synth_events, write_event_epochs

    wal = os.path.join(tmp_root, "wal")
    tbl = os.path.join(tmp_root, "tbl")
    write_event_epochs(
        synth_events(spark, 1500, n_repos=15, paths_per_repo=15, n_epochs=3),
        wal,
    )
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    out = _submit("replay_job.py", "--events-dir", wal, "--table-path", tbl,
                  "--n-buckets", "4", zip_path=zip_path)
    report = json.loads(out.strip().splitlines()[-1])
    assert len(report["applied"]) == 3
    assert all(s["applied"] for s in report["applied"])
    assert report["rows"] > 0

    # separate driver process resumes idempotently (exactly-once manifests)
    out2 = _submit("replay_job.py", "--events-dir", wal, "--table-path", tbl,
                   "--n-buckets", "4", zip_path=zip_path)
    report2 = json.loads(out2.strip().splitlines()[-1])
    assert report2["applied"] == []           # nothing pending, no re-apply
    assert report2["rows"] == report["rows"]

    out3 = _submit("maintenance_job.py", "--table-path", tbl, "--compact",
                   "--vacuum-older-than-sec", "0", "--audit-counts",
                   zip_path=zip_path)
    mreport = json.loads(out3.strip().splitlines()[-1])
    assert mreport["compacted_buckets"] >= 1
    assert mreport["version_after"] > mreport["version_before"]
    # post-maintenance row-count audit (lake/fastagg.py): matches the
    # replay report and, freshly compacted, answers from footers alone
    assert mreport["live_rows"] == report["rows"]
    assert mreport["count_tiers"]["buckets_resolved"] == 0

    # migration entry point: enable composite blooms on the existing
    # table and backfill them from a separate driver process
    out3b = _submit("maintenance_job.py", "--table-path", tbl,
                    "--set-prop", "bloom_cols=repo|path",
                    "--set-prop", "bloom_bits=auto",
                    "--backfill-stats", zip_path=zip_path)
    breport = json.loads(out3b.strip().splitlines()[-1])
    assert breport["backfilled_files"] > 0

    # table state visible to the in-process session too
    from etl_spark.lake import LakeTable

    t = LakeTable.load(spark, tbl)
    assert t.read().count() > 0
    snap = t.current_snapshot()
    assert max(len(fl) for fl in snap.buckets.values()) == 1
    assert any("repo|path#bloom" in snap.file_stats.get(f, {})
               for fl in snap.buckets.values() for f in fl)

    # downstream sync job: bootstrap + catch-up across driver processes
    dst = os.path.join(tmp_root, "dst")
    out4 = _submit("sync_job.py", "--src-path", tbl, "--dst-path", dst,
                   "--n-buckets", "2", "--count-rows", zip_path=zip_path)
    sreport = json.loads(out4.strip().splitlines()[-1])
    assert sreport["applied"] and sreport["rows"] == report["rows"]
    assert sreport["cursor"] == sreport["src_version"]
    out5 = _submit("sync_job.py", "--src-path", tbl, "--dst-path", dst,
                   zip_path=zip_path)
    sreport2 = json.loads(out5.strip().splitlines()[-1])
    assert sreport2["caught_up"] and sreport2["cursor"] == sreport["cursor"]

    # aggregate-maintenance job: bootstrap + catch-up, rollup equals a
    # direct GROUP BY over upstream state
    agg = os.path.join(tmp_root, "agg")
    out6 = _submit("agg_sync_job.py", "--src-path", tbl, "--dst-path", agg,
                   "--group-cols", "lang", "--n-buckets", "2",
                   zip_path=zip_path)
    areport = json.loads(out6.strip().splitlines()[-1])
    assert areport["applied"] and areport["cursor"] == areport["src_version"]
    out7 = _submit("agg_sync_job.py", "--src-path", tbl, "--dst-path", agg,
                   "--group-cols", "lang", zip_path=zip_path)
    assert json.loads(out7.strip().splitlines()[-1])["caught_up"]
    expected = {r["lang"]: r["count"] for r in t.read().groupBy("lang").count().collect()}
    rollup = {r["lang"]: r["n_rows"]
              for r in LakeTable.load(spark, agg).read().collect()}
    assert rollup == expected

    # join-view job: enrich the replay table against a repo dim built
    # in-process; bootstrap then catch-up across driver processes
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    dimp = os.path.join(tmp_root, "dim")
    dim = LakeTable.create(
        spark, dimp,
        StructType.fromDDL("d_ts timestamp, repo string, owner string"),
        key_cols=["repo"], version_cols=["d_ts"], n_buckets=2,
    )
    dim.merge(
        t.read().select("repo").distinct().select(
            F.lit("2024-01-01").cast("timestamp").alias("d_ts"),
            "repo", F.concat(F.lit("own-"), F.col("repo")).alias("owner"),
            F.lit("I").alias("op")),
        "d:0")
    view = os.path.join(tmp_root, "view")
    outj = _submit("join_sync_job.py", "--fact-path", tbl,
                   "--dim-path", dimp, "--dst-path", view,
                   "--dim-on", "repo", "--n-buckets", "2",
                   zip_path=zip_path)
    jreport = json.loads(outj.strip().splitlines()[-1])
    assert jreport["legs_applied"] == 2 and not jreport["caught_up"]
    outj2 = _submit("join_sync_job.py", "--fact-path", tbl,
                    "--dim-path", dimp, "--dst-path", view,
                    "--dim-on", "repo", zip_path=zip_path)
    assert json.loads(outj2.strip().splitlines()[-1])["caught_up"]
    vt = LakeTable.load(spark, view)
    assert vt.read().count() == report["rows"]
    assert vt.read().filter(
        F.col("owner") != F.concat(F.lit("own-"), F.col("repo"))
    ).count() == 0

    # SCD2 job: open intervals == the replay table's live state; a second
    # driver process is a pure no-op on both tables
    scd2 = os.path.join(tmp_root, "scd2")
    out8 = _submit("scd2_job.py", "--events-dir", wal, "--root", scd2,
                   "--key-cols", "repo,path",
                   "--version-cols", "op_ts,event_id",
                   "--n-buckets", "4", zip_path=zip_path)
    s2 = json.loads(out8.strip().splitlines()[-1])
    assert s2["epochs_applied"] == 3
    assert s2["open_intervals"] == report["rows"]
    out9 = _submit("scd2_job.py", "--events-dir", wal, "--root", scd2,
                   zip_path=zip_path)
    s2b = json.loads(out9.strip().splitlines()[-1])
    assert s2b["epochs_applied"] == 0
    assert s2b["closed_intervals"] == s2["closed_intervals"]
    assert s2b["open_intervals"] == s2["open_intervals"]


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this machine")
def test_spark_submit_dedup_ingest(spark, tmp_root):
    import glob
    import shutil

    land = os.path.join(tmp_root, "land")
    os.makedirs(land, exist_ok=True)
    A = ("the quick brown fox jumps over the lazy dog and keeps running "
         "through the wide open field all day")

    def _land(name, rows, v):
        df = spark.createDataFrame(
            [(i, t, v, "I") for i, t in rows],
            "doc_id bigint, text string, v bigint, op string")
        stage = os.path.join(tmp_root, f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(land, f"{name}.parquet"))

    _land("b1", [(1, A), (2, "totally different words about rivers and "
                             "boats at dawn under a pale morning sky")], 1)
    _land("b2", [(11, A + " tonight"),
                 (3, "gardening tomatoes in clay pots on a small balcony "
                     "during early spring months this year")], 2)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    docs = os.path.join(tmp_root, "docs")
    state = os.path.join(tmp_root, "state")
    ckpt = os.path.join(tmp_root, "ckpt")
    out = _submit("dedup_ingest_job.py", "--docs-dir", land,
                  "--docs-path", docs, "--state-path", state,
                  "--checkpoint", ckpt, "--n-buckets", "2",
                  "--max-files-per-trigger", "1", zip_path=zip_path)
    report = json.loads(out.strip().splitlines()[-1])
    assert len(report["batches"]) == 2
    assert all(b["applied"] for b in report["batches"])
    # the near-dup pair {1, 11} collapsed to one survivor
    assert sum(b["n_kept"] for b in report["batches"]) == 3

    # separate driver: nothing pending, no re-apply, state unchanged
    out2 = _submit("dedup_ingest_job.py", "--docs-dir", land,
                   "--docs-path", docs, "--state-path", state,
                   "--checkpoint", ckpt, zip_path=zip_path)
    report2 = json.loads(out2.strip().splitlines()[-1])
    assert report2["batches"] == []
    assert report2["docs_version"] == report["docs_version"]

    from etl_spark.lake import LakeTable
    kept = {r["doc_id"] for r in LakeTable.load(spark, docs).read().collect()}
    assert len(kept) == 3 and len(kept & {1, 11}) == 1 and {2, 3} <= kept


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this machine")
def test_spark_submit_envelope_ingest(spark, tmp_root):
    wire = os.path.join(tmp_root, "wire")
    os.makedirs(wire, exist_ok=True)

    def env(op, after, ts_ms, table, lsn, before=None):
        e = {"op": op, "ts_ms": ts_ms,
             "source": {"table": table, "lsn": lsn}}
        if after is not None:
            e["after"] = after
        if before is not None:
            e["before"] = before
        return json.dumps(e)

    with open(os.path.join(wire, "b1.jsonl"), "w") as f:
        f.write("\n".join([
            env("c", {"k": 1, "name": "a"}, 1000, "files", 1),
            env("u", {"k": 1, "name": "a2"}, 2000, "files", 2),
            env("c", {"cid": 7, "msg": "init"}, 1000, "commits", 3),
            "{poison",
        ]) + "\n")
    with open(os.path.join(wire, "b2.jsonl"), "w") as f:
        f.write("\n".join([
            env("c", {"k": 2, "name": "b"}, 1000, "files", 4),
            env("d", None, 3000, "files", 5, before={"k": 2}),
        ]) + "\n")

    cfg = os.path.join(tmp_root, "tables.json")
    with open(cfg, "w") as f:
        json.dump({
            "files": {"ddl": "k bigint, name string", "key_cols": ["k"],
                      "n_buckets": 2},
            "commits": {"ddl": "cid bigint, msg string",
                        "key_cols": ["cid"], "n_buckets": 2},
        }, f)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    root = os.path.join(tmp_root, "tables")
    ckpt = os.path.join(tmp_root, "ckpt")
    dead = os.path.join(tmp_root, "dead")
    out = _submit("envelope_ingest_job.py", "--wire-dir", wire,
                  "--tables-root", root, "--checkpoint", ckpt,
                  "--config", cfg, "--quarantine-dir", dead,
                  "--max-files-per-trigger", "1", zip_path=zip_path)
    report = json.loads(out.strip().splitlines()[-1])
    assert report["tables"] == {"commits": 1, "files": 1}

    # separate driver process: checkpoint resume, nothing re-applied
    out2 = _submit("envelope_ingest_job.py", "--wire-dir", wire,
                   "--tables-root", root, "--checkpoint", ckpt,
                   "--config", cfg, "--quarantine-dir", dead,
                   zip_path=zip_path)
    report2 = json.loads(out2.strip().splitlines()[-1])
    assert report2 == report

    from etl_spark.lake import LakeTable
    files = LakeTable.load(spark, os.path.join(root, "files"))
    assert [(r["k"], r["name"]) for r in files.read().collect()] == [
        (1, "a2")]
    dead_rows = spark.read.option("recursiveFileLookup", "true").parquet(
        dead).collect()
    assert len(dead_rows) == 1


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this machine")
def test_spark_submit_reconcile(spark, tmp_root):
    from etl_spark.lake import LakeTable
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType)

    table = LakeTable.create(
        spark, os.path.join(tmp_root, "t"),
        StructType([StructField("k", LongType()),
                    StructField("v", LongType()),
                    StructField("name", StringType())]),
        key_cols=["k"], version_cols=["v"], n_buckets=2,
    )
    table.merge(spark.createDataFrame(
        [(1, 1, "stale", "I"), (3, 1, "ghost", "I")],
        "k bigint, v bigint, name string, op string"), manifest_key="seed")
    snap = os.path.join(tmp_root, "snap")
    spark.createDataFrame([(1, "fresh"), (2, "new")],
                          "k bigint, name string").write.parquet(snap)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    out = _submit("reconcile_job.py", "--table", os.path.join(tmp_root, "t"),
                  "--snapshot", snap, "--version-json", '{"v": 2}',
                  "--manifest-key", "r:1", zip_path=zip_path)
    report = json.loads(out.strip().splitlines()[-1])
    assert report == {"inserts": 1, "updates": 1, "deletes": 1,
                      "applied": True, "dry_run": False}
    state = {r["k"]: r["name"] for r in table.read().collect()}
    assert state == {1: "fresh", 2: "new"}


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this machine")
def test_spark_submit_txn_ingest(spark, tmp_root):
    wire = os.path.join(tmp_root, "wire")
    os.makedirs(wire, exist_ok=True)

    def env(op, after, ts_ms, lsn, tid=None, order=None):
        e = {"op": op, "ts_ms": ts_ms,
             "source": {"table": "files", "lsn": lsn}, "after": after}
        if tid is not None:
            e["transaction"] = {"id": tid, "total_order": order}
        return json.dumps(e)

    with open(os.path.join(wire, "b1.jsonl"), "w") as f:
        f.write("\n".join([
            env("c", {"k": 1, "name": "auto"}, 1000, 1),
            env("c", {"k": 2, "name": "txn"}, 1000, 2, tid="t1", order=1),
            json.dumps({"status": "END", "id": "t1", "event_count": 1}),
            env("c", {"k": 9, "name": "half"}, 1000, 3, tid="t2", order=1),
        ]) + "\n")

    cfg = os.path.join(tmp_root, "tables.json")
    with open(cfg, "w") as f:
        json.dump({"files": {"ddl": "k bigint, name string",
                             "key_cols": ["k"], "n_buckets": 2}}, f)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    out = _submit("txn_ingest_job.py", "--wire-dir", wire,
                  "--tables-root", os.path.join(tmp_root, "tables"),
                  "--gate-path", os.path.join(tmp_root, "gate"),
                  "--checkpoint", os.path.join(tmp_root, "ckpt"),
                  "--config", cfg, "--gate-buckets", "2",
                  zip_path=zip_path)
    report = json.loads(out.strip().splitlines()[-1])
    assert report["tables"] == {"files": 2}
    assert report["pending_txns"] == [
        {"txn_id": "t2", "rows_buffered": 1, "expected": None}]


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this machine")
def test_spark_submit_bootstrap(spark, tmp_root):
    from etl_spark.cdc.bootstrap import bootstrap_active
    from etl_spark.lake import LakeTable
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType)

    dest = LakeTable.create(
        spark, os.path.join(tmp_root, "t"),
        StructType([StructField("k", LongType()),
                    StructField("v", LongType()),
                    StructField("name", StringType())]),
        key_cols=["k"], version_cols=["v"], n_buckets=2,
    )
    # the live tail is already flowing: k=1 updated at v=5 (> stamp)
    dest.merge(spark.createDataFrame(
        [("U", 1, 5, "live")], "op string, k bigint, v bigint, name string"),
        manifest_key="tail:0")
    snap = os.path.join(tmp_root, "snap")
    spark.createDataFrame([(1, "stale"), (2, "from-snap")],
                          "k bigint, name string").write.parquet(snap)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    out = _submit("bootstrap_job.py", "--snapshot", snap,
                  "--dest", os.path.join(tmp_root, "t"),
                  "--stamp", "v=3", "--chunks", "2", zip_path=zip_path)
    report = json.loads(out.strip().splitlines()[-1])
    assert report["chunks_applied"] == 2 and report["chunks_skipped"] == 0
    state = {r["k"]: r["name"] for r in dest.read().collect()}
    assert state == {1: "live", 2: "from-snap"}  # tail outranks the stamp
    assert bootstrap_active(dest) is None
