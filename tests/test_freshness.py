"""Consumer-lag report: cursors vs upstream snapshot log."""

from __future__ import annotations

import os

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.cdc.sync import sync_changes
from etl_spark.lake import LakeTable
from etl_spark.metrics import consumer_lag

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("name", StringType()),
])
ROWS = "k bigint, v bigint, name string, op string"


def _mk_src(spark, root):
    src = LakeTable.create(
        spark, os.path.join(root, "src"), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=2,
    )
    src.merge(spark.createDataFrame([(1, 1, "a", "I"), (2, 1, "b", "I")],
                                    ROWS), manifest_key="m:1")
    return src


def _mk_dst(spark, root, name):
    return LakeTable.create(
        spark, os.path.join(root, name), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=2,
        props={"cursor_prefixes": "sync"},
    )


def test_lag_tracks_cursors_and_event_time(spark, tmp_root):
    src = _mk_src(spark, tmp_root)
    fresh = _mk_dst(spark, tmp_root, "fresh")
    stale = _mk_dst(spark, tmp_root, "stale")
    never = _mk_dst(spark, tmp_root, "never")

    sync_changes(src, fresh)
    sync_changes(src, stale)
    # upstream moves on; only `fresh` follows
    src.merge(spark.createDataFrame([(3, 2, "c", "I")], ROWS),
              manifest_key="m:2")
    sync_changes(src, fresh)

    report = {r["consumer"]: r for r in consumer_lag(
        spark, src, {"fresh": fresh, "stale": stale, "never": never},
        with_event_time=True,
    ).collect()}

    f, s, n = report["fresh"], report["stale"], report["never"]
    assert f["caught_up"] and f["versions_behind"] == 0
    assert f["cursor_version"] == f["src_version"]
    assert not s["caught_up"] and s["versions_behind"] >= 1
    assert n["cursor_version"] is None
    assert n["versions_behind"] == n["src_version"]
    # event-time high-water: fresh matches upstream, stale trails
    assert f["src_event_hw"] == f["dst_event_hw"] == "2"
    assert s["dst_event_hw"] == "1"
    assert n["dst_event_hw"] is None
