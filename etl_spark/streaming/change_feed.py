"""CDC *out*: tail a LakeTable's snapshot log as an incremental change
feed (the downstream half of the binlog→lake→binlog loop).

``LakeTable.changes(v1, v2)`` already materializes the rows a commit range
added (tombstones tagged ``_op='D'``); ``follow_changes`` turns that into
a driver-side tail loop a downstream pipeline can consume — the same
control-plane polling shape as the reference's scheduled pending-work scan
(scripts/geral.py:61-65), pointed at our own table instead of an upstream.

Deliberately a driver-side generator, not a custom streaming Source:
snapshot arrival is a control-plane event (one JSON per commit); each
yielded DataFrame is a normal distributed plan over the commit's added
files. Consumers that want Structured Streaming semantics can land each
yield into a directory and ``readStream`` it.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

from etl_spark.lake import LakeTable

__all__ = ["follow_changes", "stream_sync", "stream_agg_sync",
           "stream_join_sync"]


def follow_changes(
    table: LakeTable,
    from_version: int | None = None,
    poll_interval: float = 1.0,
    stop: Callable[[], bool] | None = None,
) -> Iterator[tuple[int, DataFrame]]:
    """Yield ``(to_version, changes_df)`` for every new snapshot range as
    commits land; blocks polling between commits until ``stop()`` is true.

    ``from_version`` defaults to the current version (tail-from-now);
    pass an older version to backfill first — bounded by snapshot
    retention (``expire_snapshots``), like any change feed.

    Each yielded DataFrame covers the whole range since the previous yield
    (a burst of commits between polls arrives as one batch — consumers
    needing exactly-once downstream apply the same manifest-key pattern
    ``merge`` uses, keyed by ``to_version``)."""
    cur = table.current_version() if from_version is None else from_version
    while stop is None or not stop():
        latest = table.current_version()
        if latest > cur:
            yield latest, table.changes(cur, latest)
            cur = latest
        else:
            if stop is not None and stop():
                return
            time.sleep(poll_interval)


def stream_sync(
    src: LakeTable,
    dst: LakeTable,
    prefix: str = "sync",
    poll_interval: float = 1.0,
    stop: Callable[[], bool] | None = None,
):
    """Continuous downstream sync: follow ``src``'s commit log and apply
    one :func:`etl_spark.cdc.sync.sync_changes` round per detected commit
    wave, yielding each round's ``MergeStats`` — the streaming face of the
    incremental-consumer tier (composition of this module's tail loop with
    the cursor-in-the-same-commit sync).

    There is no checkpoint to manage: the resume cursor IS the
    destination's sync manifest (``{prefix}:{upstream_version}``, advanced
    atomically with the data), so killing this loop anywhere and calling
    ``stream_sync`` again resumes exactly where the last applied round
    left off — a round replayed after a crash is a metadata no-op. A
    burst of upstream commits between polls lands as ONE round (the feed
    range is cursor→current, same as the batch face). Bounded by upstream
    snapshot retention like any feed consumer; a lapsed destination
    raises and must re-bootstrap via ``sync_changes(full_refresh=True)``.

    Driver-side generator by design, like :func:`follow_changes`: commit
    arrival is a control-plane event; each round's work is a normal
    distributed merge plan."""
    from etl_spark.cdc.sync import sync_changes

    yield from _stream_rounds(
        lambda: sync_changes(src, dst, prefix=prefix), poll_interval, stop)


def stream_agg_sync(
    src: LakeTable,
    dst: LakeTable,
    group_cols: list[str],
    sum_exprs=None,
    agg_exprs=None,
    distinct_exprs=None,
    prefix: str = "aggsync",
    poll_interval: float = 1.0,
    stop: Callable[[], bool] | None = None,
):
    """Continuous materialized-rollup maintenance: the streaming face of
    :func:`etl_spark.cdc.agg_sync.sync_aggregate` (pass ``sum_exprs`` —
    exact signed-delta COUNT/SUM tier, O(changed keys) per round), of
    :func:`~etl_spark.cdc.agg_sync.sync_aggregate_recompute` (pass
    ``agg_exprs`` — any Spark aggregate, O(rows of affected groups)), or
    of :func:`etl_spark.cdc.sketch_sync.sync_aggregate_sketch` (pass
    ``distinct_exprs`` — HLL approx distinct-EVER, O(changed keys));
    exactly one of the three must be given, same split and same pricing
    as the batch faces.

    Resume/exactly-once contract is identical to :func:`stream_sync`: the
    cursor IS the destination's ``{prefix}:{upstream_version}`` manifest,
    advanced atomically with each round's merge — kill the loop anywhere,
    call again, and the next round picks up every upstream commit wave
    since the last applied one as a single round."""
    from etl_spark.cdc.agg_sync import sync_aggregate, sync_aggregate_recompute
    from etl_spark.cdc.sketch_sync import sync_aggregate_sketch

    given = [x is not None for x in (sum_exprs, agg_exprs, distinct_exprs)]
    if sum(given) != 1:
        raise ValueError("pass exactly one of sum_exprs (delta tier), "
                         "agg_exprs (recompute tier) or distinct_exprs "
                         "(sketch tier)")
    if sum_exprs is not None:
        round_fn = lambda: sync_aggregate(  # noqa: E731
            src, dst, group_cols, sum_exprs, prefix=prefix)
    elif agg_exprs is not None:
        round_fn = lambda: sync_aggregate_recompute(  # noqa: E731
            src, dst, group_cols, agg_exprs, prefix=prefix)
    else:
        round_fn = lambda: sync_aggregate_sketch(  # noqa: E731
            src, dst, group_cols, distinct_exprs, prefix=prefix)
    yield from _stream_rounds(round_fn, poll_interval, stop)


def stream_join_sync(
    fact: LakeTable,
    dim: LakeTable,
    dst: LakeTable,
    dim_on: list[str],
    dim_select: dict[str, str] | None = None,
    prefix: str = "jsync",
    poll_interval: float = 1.0,
    stop: Callable[[], bool] | None = None,
):
    """Continuous join-view maintenance: the streaming face of
    :func:`etl_spark.cdc.join_sync.sync_join`, tailing BOTH upstreams'
    commit logs and applying one round per detected wave on either side
    (a round may run the fact leg, the dim leg, or both), yielding each
    round's list of ``MergeStats``.

    Resume/exactly-once contract is identical to :func:`stream_sync`,
    with two cursors: each leg's cursor IS the destination's
    ``{prefix}F:{v}`` / ``{prefix}D:{v}`` manifest, advanced atomically
    with that leg's merge — kill the loop between legs and the next round
    replays only the un-applied leg."""
    from etl_spark.cdc.join_sync import sync_join

    def round_fn():
        stats = sync_join(fact, dim, dst, dim_on, dim_select=dim_select,
                          prefix=prefix)
        return stats or None  # [] = caught up = sleep

    yield from _stream_rounds(round_fn, poll_interval, stop)


def _stream_rounds(round_fn, poll_interval: float, stop):
    """Shared tail loop: apply rounds as commit waves land, yield each
    round's MergeStats, sleep between no-op polls, honor ``stop``."""
    while stop is None or not stop():
        stats = round_fn()
        if stats is not None:
            yield stats
        else:
            if stop is not None and stop():
                return
            time.sleep(poll_interval)
