"""Streaming dedup-gated ingest: micro-batches through the gate with
exactly-once dual commits and restart resume."""

from __future__ import annotations

import os

from pyspark.sql.types import StructType

from etl_spark.cdc import create_dedup_state
from etl_spark.lake import LakeTable
from etl_spark.streaming import stream_dedup_ingest

DOCS_SCHEMA = "doc_id bigint, text string, v bigint, op string"

LONG_A = ("the quick brown fox jumps over the lazy dog and keeps running "
          "through the wide open field all day long without any rest")
LONG_B = ("completely different content about ships sailing across the "
          "northern sea under heavy winter storms and grey morning skies")
LONG_C = ("some genuinely new text about gardening tomatoes in clay pots "
          "on a small sunny balcony during early spring months this year")


def _mk(spark, root):
    docs = LakeTable.create(
        spark, os.path.join(root, "docs"),
        StructType.fromDDL("doc_id bigint, text string, v bigint"),
        key_cols=["doc_id"], version_cols=["v"], n_buckets=2,
    )
    state = create_dedup_state(spark, os.path.join(root, "state"),
                               n_buckets=2)
    return docs, state


def _land(spark, docs_dir, fname, rows, v):
    """Land one micro-batch as a single flat parquet file (the file
    source wants files, not nested directories)."""
    import glob
    import shutil
    import tempfile

    df = spark.createDataFrame([(i, t, v, "I") for i, t in rows], DOCS_SCHEMA)
    stage = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    os.makedirs(docs_dir, exist_ok=True)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(docs_dir, f"{fname}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)


def test_stream_gate_dedups_across_micro_batches(spark, tmp_path):
    root = str(tmp_path)
    docs_dir = os.path.join(root, "in")
    # three landed batches; 11 near-dups 1, 21 near-dups 2 (cross-batch),
    # 22 exact-dups 21 (within batch 3)
    _land(spark, docs_dir, "b1", [(1, LONG_A), (2, LONG_B)], v=1)
    _land(spark, docs_dir, "b2", [(11, LONG_A + " tonight"), (3, LONG_C)], v=2)
    _land(spark, docs_dir, "b3", [(21, LONG_B + " again"), (22, LONG_B + " again")], v=3)
    docs, state = _mk(spark, root)

    stats = []
    q = stream_dedup_ingest(
        spark, docs_dir, docs, state, os.path.join(root, "ckpt"),
        max_files_per_trigger=1, stats_sink=stats,
    )
    q.awaitTermination(120)
    assert not q.isActive

    kept = {r["doc_id"] for r in docs.read().collect()}
    # regardless of file-discovery order, exactly one of each near-dup
    # group survives: {1,11}, {2,21,22}, {3}
    assert len(kept) == 3
    assert len(kept & {1, 11}) == 1
    assert len(kept & {2, 21, 22}) == 1
    assert 3 in kept
    assert {r["doc_id"] for r in state.read().collect()} == kept
    assert len(stats) == 3 and all(s.applied for s in stats)


def test_stream_gate_restart_is_exactly_once(spark, tmp_path):
    root = str(tmp_path)
    docs_dir = os.path.join(root, "in")
    _land(spark, docs_dir, "b1", [(1, LONG_A), (2, LONG_B)], v=1)
    _land(spark, docs_dir, "b2", [(11, LONG_A + " tonight"), (3, LONG_C)], v=2)
    docs, state = _mk(spark, root)
    ckpt = os.path.join(root, "ckpt")

    q = stream_dedup_ingest(spark, docs_dir, docs, state, ckpt,
                            max_files_per_trigger=1)
    while not q.recentProgress:
        q.awaitTermination(1)
    q.stop()
    q.awaitTermination(60)

    q2 = stream_dedup_ingest(spark, docs_dir, docs, state, ckpt,
                             max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert not q2.isActive

    kept = {r["doc_id"] for r in docs.read().collect()}
    assert len(kept) == 3 and len(kept & {1, 11}) == 1 and {2, 3} <= kept
    assert {r["doc_id"] for r in state.read().collect()} == kept
    # both ledgers: every manifest key unique (the replayed micro-batch
    # hit the manifests, it did not double-apply)
    for t in (docs, state):
        keys = list(t.current_snapshot().applied)
        assert len(keys) == len(set(keys))
