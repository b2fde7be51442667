"""Predicate DML: ``DELETE FROM … WHERE`` / ``UPDATE … SET … WHERE``
as versioned change batches through the exactly-once MERGE.

The reference edits state by re-running a slice with corrected inputs
(scripts/geral.py:36-116); a lake needs the direct form too — the
operator-issued bulk delete ("drop this vintage's bad rows") and bulk
update ("rescale this partner's amounts") every table format ships as
DELETE/UPDATE. Here both are ordinary change batches, which buys what a
file-surgery implementation never gets for free:

- **feed-visible**: downstream consumers (sync, agg tiers, SCD2, diff)
  receive the edit as a normal wave — nothing diverges silently;
- **exactly-once**: one manifest key; a crashed re-run is a metadata
  no-op;
- **LWW-sound**: rows land stamped with a version that must OUTRANK the
  table's current max (validated, like reconcile's correction stamp) —
  a late event older than the edit still loses, and the edit never
  un-deletes or un-updates by accident.

Scale: the affected-row read is the ordinary pruned scan —
bucket/zone-map/bloom pruning all apply to the WHERE — and the merge is
O(affected rows), never O(table). The outranking-stamp validation is
metadata-only when ``stats_cols`` covers the version columns (zero data
I/O — see lake/stamp.py); only a stats-less table pays a scan, loudly.
``dry_run`` prices the edit first (the reference's ``teste=True``
posture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark.lake.stamp import validate_outranking_stamp
from etl_spark.lake.table import LakeTable, MergeStats

__all__ = ["delete_where", "update_where"]


def _validated_stamp(table: LakeTable, version: dict[str, object]):
    return validate_outranking_stamp(table, version)


def _stamped(version: dict, types: dict, ver_cols: list[str]):
    return [F.lit(version[c]).cast(types[c]).alias(c) for c in ver_cols]


def delete_where(
    table: LakeTable,
    where: list,
    version: dict[str, object],
    manifest_key: str,
    dry_run: bool = False,
) -> tuple[int, MergeStats | None]:
    """Tombstone every live row matching ``where`` (the same pruned
    predicate form ``read(where=...)`` takes), stamped at ``version``.
    Returns ``(rows_deleted, MergeStats | None)``; ``dry_run`` counts
    without committing. For data-subject erasure prefer
    :func:`etl_spark.lake.purge.purge_keys`, which also compacts and
    physically vacuums the payload."""
    snap, types = _validated_stamp(table, version)
    # pinned: the batch is consumed twice (count + merge) and must not
    # see a different snapshot than the one the stamp was validated on
    doomed = (
        table.read(where=list(where))
        .select(
            F.lit("D").alias("op"),
            *snap.key_cols,
            *_stamped(version, types, snap.version_cols),
        )
        .localCheckpoint(eager=True)
    )
    n = doomed.count()
    if dry_run:
        return n, None
    return n, table.merge(doomed, manifest_key=manifest_key)


def update_where(
    table: LakeTable,
    where: list,
    set_exprs: dict[str, Column],
    version: dict[str, object],
    manifest_key: str,
    dry_run: bool = False,
) -> tuple[int, MergeStats | None]:
    """Rewrite every live row matching ``where`` with ``set_exprs``
    (column name → expression over the current row), stamped at
    ``version``. Key and version columns cannot be SET (a key change is
    a delete + insert; the version IS the stamp). Returns
    ``(rows_updated, MergeStats | None)``."""
    snap, types = _validated_stamp(table, version)
    bad = [c for c in set_exprs
           if c in snap.key_cols or c in snap.version_cols]
    if bad:
        raise ValueError(
            f"cannot SET key/version columns {sorted(bad)}: key changes "
            f"are a delete + insert; the version is the stamp"
        )
    unknown = [c for c in set_exprs
               if c not in {f.name for f in snap.schema.fields}]
    if unknown:
        raise ValueError(f"SET of unknown columns: {sorted(unknown)}")
    payload_cols = [
        f.name for f in snap.schema.fields
        if f.name not in snap.key_cols and f.name not in snap.version_cols
    ]
    updated = (
        table.read(where=list(where))
        .select(
            F.lit("U").alias("op"),
            *snap.key_cols,
            *_stamped(version, types, snap.version_cols),
            *[
                (set_exprs[c] if c in set_exprs else F.col(c))
                .cast(types[c]).alias(c)
                for c in payload_cols
            ],
        )
        .localCheckpoint(eager=True)
    )
    n = updated.count()
    if dry_run:
        return n, None
    return n, table.merge(updated, manifest_key=manifest_key)
