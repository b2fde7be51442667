"""Incremental downstream materialization: change feed → second LakeTable.

The reference's downstream consumers re-derive warehouse tables from the
capture history incrementally (``capturas_historico`` tells them which
``(geo, period)`` slices are new since their last run —
/root/reference/src/impulsoetl/scripts/geral.py:92-109). Here the same
contract is the upstream table's commit-level change feed
(:meth:`etl_spark.lake.LakeTable.changes`) consumed by a cursor:

- the CURSOR is the last upstream snapshot version the destination has
  applied, recorded as the manifest key ``{prefix}:{upstream_version}`` of
  the sync merge itself — crash-safe because the cursor advances in the
  same atomic commit that lands the data (the reference's
  history-insert-in-the-same-transaction);
- each round replays ``changes(cursor, current)``; the feed carries the
  LWW version columns and ``'D'`` tombstones, so the destination merge
  resolves late/duplicate deliveries for free;
- re-running a round is a metadata no-op (``has_applied``), and re-playing
  an OLDER range would be absorbed by LWW anyway — which is why the
  destination should declare the prefix a **monotone cursor**
  (``props["cursor_prefixes"]="sync"``): folded watermarks then keep only
  the high-water mark and metadata stays O(manifest_window) no matter how
  many sync rounds run (upstream versions are sparse — merges, compactions
  — so the contiguous-seq fold would never fire for them).

Bounds: the feed can only start at a snapshot that still exists upstream —
``expire_snapshots(keep_last=k)`` limits how far behind a consumer may
fall (Iceberg's incremental-read contract). A consumer that lapsed past
the horizon must re-bootstrap with ``sync_changes(..., full_refresh=True)``.
"""

from __future__ import annotations

from etl_spark.lake import LakeTable, MergeStats

__all__ = ["last_synced_version", "sync_changes"]


def _guard_upstream(src: LakeTable, recorded: int | None, end: int) -> None:
    """Shared cursor sanity checks for incremental consumers (row sync and
    aggregate sync): a regressed upstream version means the source table
    was reset; a rollback commit between the cursor and the sync end means
    the destination holds rows/contributions the upstream took back, which
    no in-place replay can repair (LWW keeps the newer rolled-back rows)."""
    if recorded is None:
        return
    if end < recorded:
        raise RuntimeError(
            f"upstream version regressed (cursor v{recorded}, upstream now "
            f"v{end}): the source table was reset or replaced — point the "
            f"sync at the right table, or recreate the destination and "
            f"re-bootstrap"
        )
    rolled = [
        v for v in src.versions()
        if recorded < v <= end and src.snapshot(v).rollback_of is not None
    ]
    if rolled:
        raise RuntimeError(
            f"upstream rolled back (commit v{rolled[0]}) after this "
            f"destination's cursor (v{recorded}): the destination has "
            f"applied rows the upstream took back, and neither the "
            f"incremental feed nor full_refresh can repair that in "
            f"place (LWW keeps the newer rolled-back rows) — recreate "
            f"the destination and bootstrap fresh"
        )


def last_synced_version(dst: LakeTable, prefix: str = "sync") -> int | None:
    """The destination's cursor: the highest upstream version recorded by
    a previous sync commit — from the folded watermark (cursor folding
    keeps the max) and any keys still verbatim in the bounded window.
    ``None`` if never synced."""
    from etl_spark.lake.table import _is_canonical_seq

    snap = dst.current_snapshot()
    best: int | None = None
    rng = snap.applied_watermarks.get(prefix)
    if rng is not None:
        best = int(rng[1])
    for key in snap.applied:
        p, _, seq = key.rpartition(":")
        if p == prefix and _is_canonical_seq(seq):
            v = int(seq)
            if best is None or v > best:
                best = v
    return best


def sync_changes(
    src: LakeTable,
    dst: LakeTable,
    prefix: str = "sync",
    end_version: int | None = None,
    full_refresh: bool = False,
) -> MergeStats | None:
    """One incremental sync round: merge ``src.changes(cursor, end)`` into
    ``dst`` and advance the cursor — all in one atomic commit. Returns the
    merge stats, or ``None`` when the destination is already caught up.

    A first sync (no cursor) or ``full_refresh=True`` BOOTSTRAPS by copying
    the upstream snapshot state itself — per-key LWW winners INCLUDING
    tombstones, which must keep suppressing late events in future
    incremental rounds — rather than replaying the feed from version 0:
    smaller input, and it works even after early upstream snapshots
    expired. LWW makes any re-merge of already-applied rows a semantic
    no-op."""
    from pyspark.sql import functions as F

    from etl_spark.lake.table import META_DELETED

    src_sem = src.current_snapshot().props.get("update_semantics", "row")
    dst_sem = dst.current_snapshot().props.get("update_semantics", "row")
    if src_sem != dst_sem:
        # NULL payload means "keep the previous value" under patch but
        # "the value IS NULL" under row semantics — replaying one table's
        # feed rows into the other silently corrupts every partially-set
        # column; there is no NULL-preserving translation between them
        raise ValueError(
            f"update_semantics mismatch: source is {src_sem!r}, destination "
            f"is {dst_sem!r} — a change feed is only replayable into a "
            f"destination with the SAME semantics (NULL means 'keep' under "
            f"patch but 'set NULL' under row); create the destination with "
            f"props={{'update_semantics': {src_sem!r}}}"
        )
    if prefix not in dst.current_snapshot().cursor_prefixes():
        # without the declaration, sync keys ({prefix}:{upstream_version})
        # have sparse seqs that never contiguously fold — the applied
        # ledger would grow by one key per round forever, silently losing
        # the bounded-metadata property this module promises
        raise ValueError(
            f"destination does not declare {prefix!r} a cursor prefix: "
            f"create it with props={{'cursor_prefixes': {prefix!r}}} (or "
            f"add {prefix!r} to the comma-separated prop) so sync cursor "
            f"metadata stays bounded"
        )
    recorded = last_synced_version(dst, prefix)
    end = src.current_version() if end_version is None else end_version
    _guard_upstream(src, recorded, end)
    cursor = None if full_refresh else recorded
    if cursor is None:
        if recorded is not None and end <= recorded:
            # the bootstrap merge's manifest key would hit the cursor
            # dedup (seq ≤ hi ⇒ applied) and silently copy nothing
            raise RuntimeError(
                f"full_refresh at v{end} would be a manifest no-op: the "
                f"destination already recorded sync through v{recorded}. "
                f"For divergence repair, recreate the destination and "
                f"bootstrap fresh; to pick up new data just call "
                f"sync_changes without full_refresh"
            )
        # folded_state, not read(): for row tables they coincide (winner
        # rows incl. tombstones); for patch tables the fold preserves
        # per-column winner VERSIONS as partial rows, so late events that
        # straddle the bootstrap resolve identically in the replica
        state = src.folded_state(version=end)
        feed = state.withColumn(
            "op",
            F.when(F.col(META_DELETED), F.lit("D")).otherwise(F.lit("U")),
        ).drop(META_DELETED)
        return dst.merge(feed, manifest_key=f"{prefix}:{end}")
    if end <= cursor:
        return None
    if cursor not in set(src.versions()):
        raise RuntimeError(
            f"sync cursor v{cursor} fell past the upstream snapshot-retention "
            f"horizon (oldest kept: v{min(src.versions())}); the incremental "
            f"feed can no longer start there — re-bootstrap with "
            f"sync_changes(..., full_refresh=True)"
        )
    feed = src.changes(cursor, end).withColumnRenamed("_op", "op")
    return dst.merge(feed, manifest_key=f"{prefix}:{end}")
