"""True concurrent-writer stress: optimistic concurrency under real
thread interleaving (the single-process analogue of N independent jobs
committing to one table — router legs, a live tail beside a bootstrap,
maintenance beside ingest).

The unit test for CommitConflict (test_metrics_listener.py) forces one
stale apply; here 6 writers race genuinely concurrent merges and every
one must land exactly once: hard-linked snapshot publication means at
most one winner per version, losers retry against the fresh snapshot,
and no batch is lost, duplicated, or misordered in the ledger.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_spark.lake import LakeTable

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("who", StringType()),
])


def test_racing_writers_all_land_exactly_once(spark, tmp_root):
    path = os.path.join(tmp_root, "t")
    LakeTable.create(spark, path, SCHEMA, key_cols=["k"],
                     version_cols=["v"], n_buckets=2)
    n_writers, rows_each = 6, 5
    errors: list[BaseException] = []
    barrier = threading.Barrier(n_writers)

    def writer(w: int) -> None:
        try:
            # per-thread handle: nothing shared but the directory
            t = LakeTable.load(spark, path)
            batch = spark.createDataFrame(
                [("I", w * 100 + i, 1, f"w{w}") for i in range(rows_each)],
                "op string, k bigint, v bigint, who string",
            )
            barrier.wait()  # maximize the race window
            st = t.merge(batch, manifest_key=f"writer:{w}",
                         max_retries=4 * n_writers)
            assert st.applied
        except BaseException as exc:  # noqa: BLE001 — surface in main thread
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    t = LakeTable.load(spark, path)
    state = {(r["k"], r["who"]) for r in t.read().collect()}
    assert state == {(w * 100 + i, f"w{w}")
                     for w in range(n_writers) for i in range(rows_each)}
    # every writer's key in the ledger exactly once; versions contiguous
    snap = t.current_snapshot()
    for w in range(n_writers):
        assert snap.has_applied(f"writer:{w}")
    assert sorted(t.versions()) == list(range(t.current_version() + 1))
    # a replay of any batch after the storm is a metadata no-op
    rep = t.merge(
        spark.createDataFrame([("I", 1, 1, "dup")],
                              "op string, k bigint, v bigint, who string"),
        manifest_key="writer:3",
    )
    assert not rep.applied
    # losers' abandoned write attempts are orphans, reclaimed by vacuum
    t.compact()
    t.expire_snapshots(keep_last=1)
    t.vacuum(older_than_sec=0.0)
    assert {(r["k"], r["who"]) for r in t.read().collect()} == state


def test_merges_race_rescale_steps(spark, tmp_root):
    """The rescale claim under a REAL interleaving: a writer thread lands
    merge after merge while a maintenance thread drives start_rescale +
    rescale_step to completion. Every merge must apply exactly once,
    every row must land in the final 2x layout, and the final state must
    equal what a quiet replay of the same batches produces."""
    path = os.path.join(tmp_root, "race_rescale")
    LakeTable.create(spark, path, SCHEMA, key_cols=["k"],
                     version_cols=["v"], n_buckets=4)
    n_batches, rows_each = 8, 40
    errors: list[BaseException] = []
    start = threading.Barrier(2)

    def batch_df(i):
        return spark.createDataFrame(
            [("I", j, i + 1, f"b{i}")
             for j in range(i * 7, i * 7 + rows_each)],
            "op string, k bigint, v bigint, who string",
        )

    def writer() -> None:
        try:
            t = LakeTable.load(spark, path)
            start.wait()
            for i in range(n_batches):
                st = t.merge(batch_df(i), manifest_key=f"b:{i}",
                             max_retries=40)
                assert st.applied
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def rescaler() -> None:
        try:
            t = LakeTable.load(spark, path)
            start.wait()
            t.start_rescale(8, max_retries=40)
            while t.rescale_status() is not None:
                t.rescale_step(max_buckets=1, max_retries=40)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer),
               threading.Thread(target=rescaler)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    t = LakeTable.load(spark, path)
    snap = t.current_snapshot()
    assert snap.n_buckets == 8 and snap.rescale_to is None
    for i in range(n_batches):
        assert snap.has_applied(f"b:{i}")

    ref_path = os.path.join(tmp_root, "race_rescale_ref")
    ref = LakeTable.create(spark, ref_path, SCHEMA, key_cols=["k"],
                           version_cols=["v"], n_buckets=8)
    for i in range(n_batches):
        ref.merge(batch_df(i), manifest_key=f"b:{i}")
    got = sorted(tuple(r) for r in t.read().collect())
    want = sorted(tuple(r) for r in ref.read().collect())
    assert got == want
    # ... and the layout is coherent: every row routes to its bucket
    from etl_spark.lake.fsck import check_integrity

    assert check_integrity(t, deep=True)["ok"]
