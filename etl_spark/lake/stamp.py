"""Outranking-stamp validation for versioned corrections (predicate DML,
snapshot reconcile).

A correction batch (DELETE/UPDATE WHERE, reconcile diff) lands stamped
with a version that must OUTRANK every version already in the table —
otherwise the edit loses the very LWW races it exists to win, silently.
Two properties make the check both correct and cheap:

- **Tombstones participate.** The max is taken over ALL physical rows,
  deleted included: a key deleted at version 10 must still force a
  correction stamp past 10, or an ``I`` correction between live-max and
  the tombstone's version would "apply" (manifest key consumed) while
  the row stays dead — exactly the silent non-repair the check exists
  to prevent. Because every key's LWW winner carries that key's maximum
  version, the max over all physical rows equals the max over winners
  *including tombstones* — so the zone-map path below and the
  ``read(include_deleted=True)`` fallback agree by construction.
- **Metadata first.** When the ``stats_cols`` table prop covers the
  version columns, every data file already carries footer-harvested
  ``[min, max]`` bounds for them in the snapshot (lake/stats.py). The
  componentwise max over those per-file maxima is computed driver-side
  from the snapshot dict — O(files) on metadata the snapshot JSON read
  already paid for, ZERO data-file I/O. For a single version column the
  bound is exact; for a composite version tuple it is a lexicographic
  upper bound (componentwise dominance implies lexicographic order), so
  a stamp that outranks the bound provably outranks the table and only
  the ambiguous remainder falls through to the scan.

Only without covering stats (or when any file lacks a bound, e.g. an
all-NULL version column) does validation pay one merge-on-read scan —
and it warns, naming the prop to set. This is what keeps DML honest at
scale: a one-row UPDATE on a 100 TB table validates its stamp from the
snapshot alone.

Reference analogue: the reference guards re-captures behind the
capture-ledger's recorded positions rather than re-reading state
(/root/reference/src/impulsoetl/bd.py:62-74 reflected-table upserts +
scripts/geral.py:61-65 slice bookkeeping); here the "recorded position"
is the snapshot's own zone-map metadata.
"""

from __future__ import annotations

import logging

from pyspark.sql import functions as F

__all__ = ["validate_outranking_stamp", "meta_version_bound"]

log = logging.getLogger(__name__)


def meta_version_bound(snap) -> tuple[tuple | None, bool]:
    """Componentwise max of the version columns over ALL physical rows,
    resolved purely from snapshot zone-map metadata.

    Returns ``(bound, exact)``:

    - ``(None, True)`` — table holds no data files: any stamp outranks.
    - ``(tuple, True)`` — single version column: ``bound`` IS the
      table's max version (footer stats cover tombstone rows too).
    - ``(tuple, False)`` — composite version tuple: ``bound`` is a
      lexicographic UPPER bound on the max (sufficient to pass a stamp
      that outranks it, not to fail one that doesn't).
    - ``(None, False)`` — metadata unavailable (``stats_cols`` does not
      cover the version columns, or some file lacks a bound): caller
      must fall back to scanning.
    """
    from etl_spark.lake.stats import decode_bound

    ver_cols = snap.version_cols
    files = [f for fl in snap.buckets.values() for f in fl]
    if not files:
        return None, True
    if not all(c in snap.stats_cols() for c in ver_cols):
        return None, False
    maxima = []
    for c in ver_cols:
        best = None
        for f in files:
            b = snap.file_stats.get(f, {}).get(c)
            if b is None:
                return None, False
            hi = decode_bound(b[1])
            if best is None or hi > best:
                best = hi
        maxima.append(best)
    return tuple(maxima), len(ver_cols) == 1


def validate_outranking_stamp(table, version: dict[str, object]):
    """Raise ``ValueError`` unless ``version`` strictly outranks the
    table's current max version struct over ALL rows (tombstones
    included — see module docstring). Metadata-only when zone maps
    cover the version columns; otherwise ONE merge-on-read scan, with a
    warning naming the prop that would make it free.

    Returns ``(snap, types)`` — the snapshot the stamp was validated
    against and the column-type map — so callers build their batches
    against the exact validated state. Comparisons run through Spark
    literals so stamp values cast through the columns' own types (the
    spark-submit face passes strings).
    """
    snap = table.current_snapshot()
    ver_cols = snap.version_cols
    if set(version) != set(ver_cols):
        raise ValueError(
            f"version stamp must cover exactly {ver_cols}, got "
            f"{sorted(version)}"
        )
    types = {f.name: f.dataType for f in snap.schema.fields}
    stamped = F.struct(
        *[F.lit(version[c]).cast(types[c]).alias(c) for c in ver_cols]
    )

    bound, exact = meta_version_bound(snap)
    if bound is None and exact:
        return snap, types  # empty table: any stamp outranks
    if bound is not None:
        # one-row local job over literals: exact Spark cast/compare
        # semantics, zero file I/O
        cur = F.struct(
            *[F.lit(v).cast(types[c]).alias(c)
              for c, v in zip(ver_cols, bound)]
        )
        not_outranked = (
            table.spark.range(1)
            .select((cur >= stamped).alias("x"))
            .collect()[0]["x"]
        )
        if not not_outranked:
            return snap, types  # stamp > upper bound ≥ actual max
        if exact:
            raise ValueError(
                f"version stamp {dict(version)} does not outrank current "
                f"max {bound} — the edit would lose the LWW races it "
                f"exists to win"
            )
        # composite version tuple, stamp ≤ componentwise bound: the
        # bound is not tight enough to decide — fall through to the scan
    else:
        log.warning(
            "stamp validation on %s is scanning the table: set the "
            "stats_cols table prop to cover version columns %s (then "
            "backfill_stats) to resolve it from snapshot metadata",
            table.path, ver_cols,
        )
    row = (
        table.read(include_deleted=True)
        .agg(F.max(F.struct(*[F.col(c) for c in ver_cols])).alias("v"))
        .select("v", (F.col("v") >= stamped).alias("not_outranked"))
        .collect()[0]
    )
    if row["v"] is not None and row["not_outranked"]:
        raise ValueError(
            f"version stamp {dict(version)} does not outrank current "
            f"max {tuple(row['v'])} — the edit would lose the LWW races "
            f"it exists to win"
        )
    return snap, types
