"""Custom stateful streaming operator: in-flight LWW change-log compaction
(applyInPandasWithState). Emitted stream must (a) shrink the event volume
(duplicates / stale events drop) and (b) preserve the LWW final state."""

from __future__ import annotations

import os

import pandas as pd

from etl_spark.cdc import synth_events, write_event_epochs
from etl_spark.cdc.lww import lww_dedup
from etl_spark.streaming.stateful import lww_compact_stream


def test_lww_compact_stream(spark, tmp_root):
    events_dir = os.path.join(tmp_root, "wal")
    ev = synth_events(spark, 3000, n_repos=15, paths_per_repo=15, n_epochs=3,
                      dup_pct=20)
    write_event_epochs(ev, events_dir)
    total = spark.read.parquet(events_dir).count()

    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
        .drop("epoch")
    )
    compacted = lww_compact_stream(stream, ["repo", "path"])

    out_dir = os.path.join(tmp_root, "out")
    q = (
        compacted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp_root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    emitted = spark.read.parquet(out_dir)
    n_emitted = emitted.count()
    assert 0 < n_emitted < total  # compaction actually dropped events

    # LWW final state computed from the compacted stream == from the raw WAL
    raw = spark.read.parquet(events_dir).drop("epoch")
    cols = ["repo", "path", "event_id", "op", "content"]
    want = (
        lww_dedup(raw, ["repo", "path"], ["op_ts", "event_id"])
        .select(*cols).orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    got = (
        lww_dedup(emitted, ["repo", "path"], ["op_ts", "event_id"])
        .select(*cols).orderBy("repo", "path").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
