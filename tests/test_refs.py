"""Named snapshot refs (lake/refs.py): tags, branches, retention force,
ref-aware time travel / change feeds, and the purge interlock."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql.types import StructType

from etl_spark.lake import CommitConflict, LakeTable
from etl_spark.lake.purge import purge_keys

SCHEMA = "event_id bigint, op_ts timestamp, seq bigint, repo string, content string"
TS = dt.datetime(2024, 1, 1)


def _table(spark, tmp_root, name="t", **props):
    return LakeTable.create(
        spark, os.path.join(tmp_root, name), StructType.fromDDL(SCHEMA),
        key_cols=["repo"], version_cols=["op_ts", "seq"],
        n_buckets=2, props=props or None,
    )


def _batch(spark, *rows):
    return spark.createDataFrame(list(rows), SCHEMA + ", op string")


def _row(i, repo, content, op="I", sec=None):
    return (i, TS + dt.timedelta(seconds=i if sec is None else sec),
            i, repo, content, op)


def test_tag_read_and_immutability(spark, tmp_root):
    t = _table(spark, tmp_root)
    t.merge(_batch(spark, _row(0, "a", "v0"), _row(1, "b", "v0")), "e0")
    t.tag("audited")
    v_tag = t.resolve_ref("audited")
    t.merge(_batch(spark, _row(2, "a", "v1"), _row(3, "c", "v0")), "e1")

    # ref name works everywhere a version does
    got = {r["repo"]: r["content"]
           for r in t.read(version="audited").collect()}
    assert got == {"a": "v0", "b": "v0"}
    assert t.read().count() == 3
    assert t.snapshot("audited").version == v_tag
    # change feed from a ref: what landed since the audited vintage
    feed = t.changes("audited")
    assert {r["repo"] for r in feed.collect()} == {"a", "c"}

    # tags are immutable: re-create and move both refuse
    with pytest.raises(CommitConflict):
        t.tag("audited")
    with pytest.raises(ValueError, match="is a tag"):
        t.move_branch("audited")
    # a ref must point at a real snapshot
    with pytest.raises(ValueError, match="does not exist"):
        t.tag("bogus", version=999)
    with pytest.raises(KeyError):
        t.resolve_ref("never-made")


def test_retention_force_and_release(spark, tmp_root):
    t = _table(spark, tmp_root)
    for i in range(4):
        t.merge(_batch(spark, _row(i, "a", f"v{i}"), _row(100 + i, f"r{i}", "x")),
                f"e{i}")
    t.tag("pin", version=2)
    expired = t.expire_snapshots(keep_last=1)
    assert 2 not in expired and 2 in t.versions()
    t.vacuum(older_than_sec=0)
    # the pinned vintage still reads in full after expire+vacuum
    assert t.read(version="pin").count() == 3  # a + r0 + r1 at v2... keys
    got = {r["repo"] for r in t.read(version="pin").collect()}
    assert got == {"a", "r0", "r1"}
    # dropping the pin releases it: next expire reclaims the snapshot
    released = t.drop_ref("pin")
    assert released == 2
    assert 2 in t.expire_snapshots(keep_last=1)
    assert 2 not in t.versions()


def test_branch_move_and_decoupled_consumer(spark, tmp_root):
    t = _table(spark, tmp_root)
    t.merge(_batch(spark, _row(0, "a", "v0")), "e0")
    t.branch("stable")
    v0 = t.resolve_ref("stable")
    t.merge(_batch(spark, _row(1, "a", "v1")), "e1")
    t.merge(_batch(spark, _row(2, "a", "v2")), "e2")
    # consumer pinned to the branch sees the old state until promotion
    assert t.read(version="stable").collect()[0]["content"] == "v0"
    new_v = t.move_branch("stable")
    assert new_v == t.current_version() and new_v > v0
    assert t.read(version="stable").collect()[0]["content"] == "v2"
    # rewind is legal for branches (metadata-only consumer rollback)
    t.move_branch("stable", version=v0)
    assert t.read(version="stable").collect()[0]["content"] == "v0"
    # branches protect their target from expiry like tags do
    t.expire_snapshots(keep_last=1)
    assert v0 in t.versions()
    # refs listing sees it with its kind
    refs = t.refs()
    assert refs["stable"].kind == "branch" and refs["stable"].version == v0


def test_purge_refuses_while_pinned(spark, tmp_root):
    t = _table(spark, tmp_root)
    t.merge(_batch(spark, _row(0, "subject", "pii"), _row(1, "other", "ok")),
            "e0")
    t.tag("pre-purge")
    keys = spark.createDataFrame([("subject",)], "repo string")
    with pytest.raises(ValueError, match="purge refused"):
        purge_keys(t, keys, manifest_key="purge:0", vacuum_grace_sec=0.0)
    # table untouched by the refusal
    assert t.read().count() == 2
    t.drop_ref("pre-purge")
    report = purge_keys(t, keys, manifest_key="purge:0", vacuum_grace_sec=0.0)
    assert report["residual_live"] == 0
