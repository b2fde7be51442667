"""Snapshot reconciliation: repair lake state against a fresh full
snapshot of the upstream (anti-entropy).

A CDC tail can silently drift from its source — a connector bug drops a
window of events, a manual backfill writes around the pipeline, a
mis-ordered purge resurrects rows. The standard repair is to take one
fresh FULL snapshot of the upstream (cheap for the source: a single
consistent read) and reconcile: diff it against the lake state and apply
only the corrections, as ordinary versioned I/U/D events through the
same MERGE path — so downstream consumers (sync, agg_sync, SCD2, diff)
see the repair as a normal change-feed wave instead of a blind rewrite.
The reference's recovery posture is the same shape — re-run the slice
idempotently over authoritative source data
(/root/reference/src/impulsoetl/scripts/geral.py:36-116); here the
"slice" is the keys that actually differ.

Scale: one full-outer sort-merge join of snapshot vs resolved state on
the key columns (both sides shuffle once — a full-state compare cannot
do less), with the payload comparison collapsed to an md5 over the
canonical JSON of the payload struct so the join compares two hashes,
not 2×N wide rows. Output is O(differing keys); an in-sync table costs
the join and writes nothing (``merge`` of an empty correction batch is
still one commit recording the reconcile in the ledger — pass
``dry_run=True`` to skip it).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark.lake import LakeTable
from etl_spark.lake.stamp import validate_outranking_stamp

__all__ = ["reconcile_snapshot", "snapshot_corrections", "ReconcileStats"]


@dataclass(frozen=True)
class ReconcileStats:
    inserts: int
    updates: int
    deletes: int
    merge: object | None  # MergeStats when applied, None on dry_run

    @property
    def corrections(self) -> int:
        return self.inserts + self.updates + self.deletes


def _payload_digest(cols: list[str]) -> Column:
    # Canonical row digest: to_json of the payload struct (stable field
    # order = selection order; NULL fields dropped identically on both
    # sides), hashed so the join carries 16 bytes per side, not the row.
    return F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))


def snapshot_corrections(
    table: LakeTable,
    snapshot: DataFrame,
    version: dict[str, object],
) -> DataFrame:
    """The corrective event batch that would make ``table`` equal
    ``snapshot`` — ``op`` I (missing key), U (differing payload), or D
    (key gone from the snapshot) with the snapshot's payload, stamped
    with the ``version`` values (one per table version column; must
    outrank every version already in the table or the corrections lose
    the LWW race they are meant to win — :func:`reconcile_snapshot`
    validates this before applying; this audit-only form does not).
    Audit-only form of :func:`reconcile_snapshot`."""
    snap_meta = table.current_snapshot()
    if snap_meta.props.get("update_semantics", "row") == "patch":
        raise ValueError(
            "snapshot reconciliation needs row update semantics: under "
            "patch, NULL means 'keep previous', so a correction cannot "
            "null out a drifted column"
        )
    key_cols = snap_meta.key_cols
    ver_cols = snap_meta.version_cols
    if set(version) != set(ver_cols):
        raise ValueError(
            f"version stamp must cover exactly {ver_cols}, got "
            f"{sorted(version)}"
        )
    payload_cols = [
        f.name
        for f in snap_meta.schema.fields
        if f.name not in key_cols and f.name not in ver_cols
    ]
    missing = [c for c in key_cols + payload_cols if c not in snapshot.columns]
    if missing:
        raise ValueError(f"snapshot missing table columns: {missing}")

    state = table.read()
    # Align the snapshot to the table's types BEFORE digesting: a
    # representational difference (int vs double, varchar date) would
    # otherwise digest differently and re-"repair" the whole table on
    # every run.
    types = {f.name: f.dataType for f in snap_meta.schema.fields}
    aligned = snapshot.select(
        *[F.col(c).cast(types[c]).alias(c) for c in key_cols + payload_cols]
    )
    s = aligned.select(
        *key_cols,
        *[F.col(c) for c in payload_cols],
        _payload_digest(payload_cols).alias("__s_digest"),
        F.lit(True).alias("__in_snap"),
    )
    t = state.select(
        *key_cols,
        _payload_digest(payload_cols).alias("__t_digest"),
        F.lit(True).alias("__in_state"),
    )
    joined = s.join(t, on=key_cols, how="full_outer")
    op = (
        F.when(F.col("__in_state").isNull(), F.lit("I"))
        .when(F.col("__in_snap").isNull(), F.lit("D"))
        .when(F.col("__s_digest") != F.col("__t_digest"), F.lit("U"))
    )
    stamped = [
        F.lit(version[c]).cast(dict(
            (f.name, f.dataType) for f in snap_meta.schema.fields
        )[c]).alias(c)
        for c in ver_cols
    ]
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select("op", *key_cols, *stamped, *payload_cols)
    )


def reconcile_snapshot(
    table: LakeTable,
    snapshot: DataFrame,
    version: dict[str, object],
    manifest_key: str,
    dry_run: bool = False,
) -> ReconcileStats:
    """Diff ``snapshot`` (external truth) against ``table`` and apply the
    corrections through the normal exactly-once MERGE; returns per-op
    counts plus the MergeStats. ``dry_run`` computes the counts without
    committing (the reference's ``teste=True`` posture). Re-running with
    the same ``manifest_key`` after a crash is a metadata no-op."""
    # A stamp that doesn't outrank the current state loses every LWW race
    # it exists to win — fail loudly instead of silently not repairing.
    # Shared validator (lake/stamp.py): tombstone versions PARTICIPATE in
    # the max (a key deleted at a high version must still force the stamp
    # past it, or an 'I' correction would "apply" while the row stays
    # dead), and the check is metadata-only when zone maps cover the
    # version columns.
    validate_outranking_stamp(table, version)
    corrections = snapshot_corrections(table, snapshot, version)
    # The corrections are consumed twice (counts + merge) and derive from
    # a join over the table's CURRENT state — pin them so the merge can't
    # see a different state than the one the diff measured.
    corrections = corrections.localCheckpoint(eager=True)
    by_op = {r["op"]: r["n"] for r in
             corrections.groupBy("op").agg(F.count("*").alias("n")).collect()}
    stats = None
    if not dry_run:
        stats = table.merge(corrections, manifest_key=manifest_key)
    return ReconcileStats(
        inserts=by_op.get("I", 0),
        updates=by_op.get("U", 0),
        deletes=by_op.get("D", 0),
        merge=stats,
    )
