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
                   "--vacuum-older-than-sec", "0", zip_path=zip_path)
    mreport = json.loads(out3.strip().splitlines()[-1])
    assert mreport["compacted_buckets"] >= 1
    assert mreport["version_after"] > mreport["version_before"]

    # table state visible to the in-process session too
    from etl_spark.lake import LakeTable

    t = LakeTable.load(spark, tbl)
    assert t.read().count() > 0
    assert max(len(fl) for fl in t.current_snapshot().buckets.values()) == 1

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
