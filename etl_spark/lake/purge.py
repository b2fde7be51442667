"""Right-to-erasure purge: physically remove a key set's payload history.

The reference pipelines ingest sensitive Brazilian health microdata (per-row
SINAN/SIM records — e.g. /root/reference/src/impulsoetl/sinan/violencia.py);
its warehouse intent includes per-row change tracking
(`bd.py:77-84` versioned tables). A lake engine with snapshots, deltas and
a change feed keeps every version of every row by design — which is exactly
what a data-subject erasure request (LGPD/GDPR) must defeat. Iceberg and
Delta both implement erasure as the same composition this module makes
first-class:

1. **Tombstone the keys through the normal MERGE** — one 'D' row per
   currently-live key, version-bumped so it strictly wins LWW. Going
   through merge (not a side channel) keeps three invariants: the purge is
   exactly-once (manifest key), late duplicates of the purged data stay
   suppressed (the tombstone outranks every prior version), and the purge
   PROPAGATES — the change feed emits the tombstones, so incremental
   consumers (`cdc.sync`, `cdc.agg_sync`) erase downstream on their next
   round. A tombstone's payload is nulled at write time, so the new files
   carry no subject data.
2. **Compact the affected buckets** — the rewrite keeps only per-key LWW
   winners (now the nulled tombstones); the subject's payload rows are not
   written to the new files. Bucket-pruned: only buckets holding purged
   keys are rewritten.
3. **Expire snapshots + vacuum** — old snapshots still reference the
   pre-purge files (that is what time travel means); erasure requires
   dropping them and deleting the newly-unreferenced files. This is the
   deliberate, documented cost of a purge: the time-travel window and the
   change-feed horizon collapse to ``keep_last``; consumers further behind
   must re-bootstrap (``full_refresh``), which carries the tombstones too.

Scale shape: the tombstone build and the residual check are bucket-pruned
point reads (≈ |affected buckets| / n_buckets of the table), the merge is
O(|keys|), and the compaction rewrites only affected buckets. Nothing
scans the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

from etl_spark.lake.table import LakeTable

__all__ = ["purge_keys"]

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def purge_keys(
    table: LakeTable,
    keys: DataFrame,
    manifest_key: str,
    keep_last: int = 1,
    vacuum_grace_sec: float = 600.0,
) -> dict:
    """Erase ``keys`` (a DataFrame of exactly the table's key columns) from
    ``table`` — live state, version history, and physical files. Returns a
    report dict; ``residual_live`` MUST be 0 unless a genuinely newer event
    re-inserted a key after the purge merge.

    The LAST version column must be integral (it is bumped by 1 to outrank
    the current winner — the engine's deterministic stand-in for "a new
    event strictly after everything seen"). ``vacuum_grace_sec`` is the
    concurrent-writer grace window; pass 0 only when no writer can be in
    flight (tests, single-writer maintenance windows).
    """
    from etl_spark.lake.refs import list_refs

    pins = list_refs(table.path)
    if pins:
        # A ref (tag/branch, lake/refs.py) makes its snapshot — and
        # therefore its files — immune to expire+vacuum. Any pre-purge
        # pin would silently keep the subject's payload on disk, which
        # is exactly the physical-residue guarantee this module exists
        # to give. Refuse loudly; the operator decides what the pin was
        # protecting and drops or moves it first.
        raise ValueError(
            f"purge refused: refs pin snapshots that expire+vacuum could "
            f"not reclaim ({sorted((r.name, r.version) for r in pins.values())}); "
            f"drop_ref()/move_branch() them past the purge first"
        )
    snap = table.current_snapshot()
    key_cols, ver_cols = snap.key_cols, snap.version_cols
    if sorted(keys.columns) != sorted(key_cols):
        raise ValueError(
            f"keys must have exactly the key columns {key_cols}, "
            f"got {keys.columns}"
        )
    last_ver = ver_cols[-1]
    last_type = {f.name: f.dataType for f in snap.schema.fields}[last_ver]
    if not isinstance(last_type, _INTEGRAL):
        raise ValueError(
            f"purge needs an integral final version column to outrank the "
            f"current winner; {last_ver!r} is {last_type.simpleString()}"
        )

    # Materialize the key set BEFORE touching the table: callers routinely
    # derive it from the table itself ("purge the users matching X"), and a
    # lazy plan re-evaluated after compact/expire/vacuum would re-read
    # files the purge just deleted. An erasure request is bounded (subject
    # keys, not table rows), so a localCheckpoint is cheap.
    keys = keys.select(*key_cols).distinct().localCheckpoint(eager=True)
    affected = sorted(
        r["__b"]
        for r in keys.select(table.bucket_expr(snap).alias("__b"))
        .distinct().collect()
    )
    # live winners only: already-tombstoned keys need no new tombstone, but
    # their buckets still hold pre-delete payload versions — kept in
    # `affected` above so compaction scrubs them regardless
    winners = table.read(buckets=affected).join(keys, key_cols, "left_semi")
    tombstones = winners.select(
        *key_cols,
        *[
            (F.col(c) + F.lit(1)).alias(c) if c == last_ver else F.col(c)
            for c in ver_cols
        ],
        F.lit("D").alias("op"),
    )
    stats = table.merge(tombstones, manifest_key=manifest_key)

    compacted = table.compact(buckets=affected)
    expired = table.expire_snapshots(keep_last=keep_last)
    removed = table.vacuum(older_than_sec=vacuum_grace_sec)

    residual = (
        table.read(buckets=affected)
        .join(keys, key_cols, "left_semi")
        .count()
    )
    return {
        "keys": keys.count(),
        "tombstoned": stats.applied,
        "buckets_compacted": compacted,
        "snapshots_expired": len(expired),
        "files_vacuumed": len(removed),
        "residual_live": residual,
    }
