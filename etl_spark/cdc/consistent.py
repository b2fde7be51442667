"""Consistent cross-table reads over a routed fan-out.

One wire batch fans out into N lake tables (:mod:`etl_spark.cdc.router`)
as N sequential per-table commits — so at any instant the CURRENT
versions of two routed tables may straddle a batch: `orders` has batch 7
applied, `customer` doesn't yet (or a crash left exactly that state
until the resume). A consumer joining the two at "latest" sees a torn
wave: fact rows whose dimension hasn't landed, halves of one upstream
transaction. The reference's consumers sidestep this by re-reading whole
periods after every load (scripts/geral.py:36-116 — slice-level
idempotence); at lake scale the right tool is the one the engine
already has: every table is snapshot-versioned and every batch is a
ledger entry, so for any batch B there EXISTS a per-table version that
reflects exactly the batches ≤ B — this module finds it.

``aligned_version(table, key)`` locates the snapshot that FIRST applied
a manifest key: since the router applies batches in ascending order per
table, that snapshot contains exactly the route batches ≤ B (plus any
interleaved maintenance commits, which rewrite rows but never change
them). ``read_group`` does it for every table of a group and returns
time-travel reads pinned to those versions — a mutually consistent view
regardless of what the live tail commits meanwhile.

Scale: resolution is metadata-only — it reads snapshot JSONs, never
data; cost is O(retained snapshots) file reads in the worst case with
the common case (a recent batch) exiting after a handful. The returned
DataFrames are ordinary pinned ``read(version=...)`` plans with all
their bucket/zone-map/bloom pruning intact. Retention is the horizon:
a batch older than ``expire_snapshots`` keeps — or evicted from the
bounded manifest window — resolves to "not found", the same contract as
any time travel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_spark.lake import LakeTable

__all__ = ["aligned_version", "read_group", "route_keys"]


def route_keys(names, stream_id: str, batch: int) -> dict[str, str]:
    """The per-table manifest keys the envelope-streaming face commits
    under (``env:{stream_id}:{batch}:{table}`` —
    streaming/envelope_stream.py)."""
    return {n: f"env:{stream_id}:{batch}:{n}" for n in names}


def aligned_version(table: LakeTable, manifest_key: str) -> int | None:
    """The snapshot version that FIRST applied ``manifest_key``, or None
    if no retained snapshot has it (never applied, applied before the
    retention horizon, or evicted from the bounded manifest window —
    indistinguishable by design, and all three mean "cannot pin").

    Ascending scan with early exit: the applied-run over retained
    versions is ``F…F T…T [F…F]`` (not yet / applied / evicted later),
    so the first True IS the applying commit. A binary search would be
    unsound against the eviction tail."""
    for v in table.versions():
        if table.snapshot(v).has_applied(manifest_key):
            return v
    return None


def read_group(
    tables: dict[str, LakeTable],
    keys: dict[str, str],
    with_versions: bool = False,
):
    """Mutually consistent reads: for each table, a DataFrame pinned to
    the snapshot that first applied that table's ``keys[name]`` — so the
    group reflects exactly the same wire batches even while the live
    tail keeps committing. Raises if any table cannot be pinned (the
    caller chooses: wait for the tail, or fall back to latest)."""
    missing = [n for n in tables if n not in keys]
    if missing:
        raise ValueError(f"no manifest key for tables: {sorted(missing)}")
    versions: dict[str, int] = {}
    for name, table in tables.items():
        v = aligned_version(table, keys[name])
        if v is None:
            raise LookupError(
                f"table {name!r}: manifest key {keys[name]!r} not found "
                f"in any retained snapshot (not yet applied, or past the "
                f"retention/fold horizon)"
            )
        versions[name] = v
    out: dict[str, DataFrame] = {
        name: table.read(version=versions[name])
        for name, table in tables.items()
    }
    if with_versions:
        return out, versions
    return out
