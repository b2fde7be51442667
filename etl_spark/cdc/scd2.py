"""SCD Type-2 history: interval-valued change tracking from a CDC stream.

The reference's change-tracking intent is per-row history tables —
``%s_versoes`` with transaction ids and the ``criacao_data`` /
``atualizacao_data`` audit pair (/root/reference/src/impulsoetl/bd.py:77-84,
sisab/modelos.py:29): every revision of a row is kept, not just the latest.
This module realizes that as the warehouse-standard SCD2 product: one row
per *state interval* ``[valid_from, valid_to)`` per key, ``valid_to`` NULL
while the state is current, deletes closing the last interval without a
successor.

Two tiers:

- :func:`scd2_history` — batch: derive the full interval table from a
  bounded event log in one pass. One shuffle (hash by key) + per-key sort;
  a window is the right tool here because a key's interval chain is
  inherently sequential, and its cost is bounded by per-key churn, not
  table size.
- :func:`create_scd2_tables` / :func:`apply_scd2` — incremental: maintain
  the SCD2 product epoch-by-epoch with exactly-once manifests. The state
  splits into the two tables a 100 TB dimension actually needs:

  * ``current`` — open intervals only, keyed by the entity key, so the
    per-epoch "which intervals do I close?" lookup is a bucket-pruned
    point read of O(batch keys) rows, never a scan of the full history.
  * ``history`` — closed intervals, append-only (keyed by entity key +
    opening version so every interval is unique; nothing ever rewrites).

  Crash ordering mirrors ``dedup_ingest``'s docs-before-state rule:
  history commits BEFORE current. A crash between the two replays the
  epoch — the history merge re-derives the same closed rows from the
  still-unchanged current table and no-ops on its manifest, then the
  current merge applies. Committing current first would lose closings.

Within-epoch churn collapses to the epoch's LWW winner (interval
granularity = one state per key per epoch), matching what a net change
feed delivers downstream. A stale winner (version <= the open interval's)
loses LWW in ``current`` and must close nothing in ``history`` — both
guards are the same strict version-struct comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType, StructField, StructType
from pyspark.sql.window import Window

from etl_spark.cdc.agg_sync import _changed_buckets
from etl_spark.cdc.lww import lww_dedup
from etl_spark.lake import LakeTable, MergeStats

__all__ = [
    "scd2_history",
    "create_scd2_tables",
    "apply_scd2",
    "replay_scd2",
    "scd2_view",
    "purge_scd2",
]

SEQ_COL = "_scd_seq"
CURRENT_COL = "is_current"
VALID_TO_COL = "valid_to"


def _ver(side: str, version_cols: list[str]):
    return F.struct(*[F.col(f"{side}.{c}") for c in version_cols])


def scd2_history(
    events: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    ts_col: str | None = None,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Batch SCD2: each non-delete event opens an interval that the key's
    next event (of any op) closes. Output = the event's columns minus
    ``op_col``, plus ``valid_to`` (next event's ``ts_col``; NULL if none)
    and ``is_current`` (open and not deleted). ``ts_col`` defaults to the
    first version column; ``version_cols`` must order a key's events
    totally (ties would make the chain ambiguous)."""
    ts_col = ts_col or version_cols[0]
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in version_cols]
    )
    closed = events.withColumn(VALID_TO_COL, F.lead(ts_col).over(w))
    return (
        closed.filter(F.col(op_col) != F.lit(delete_op))
        .withColumn(CURRENT_COL, F.col(VALID_TO_COL).isNull())
        .drop(op_col)
    )


def create_scd2_tables(
    spark: SparkSession,
    root: str,
    schema: StructType,
    key_cols: list[str],
    version_cols: list[str],
    n_buckets: int = 32,
    props: dict[str, str] | None = None,
) -> tuple[LakeTable, LakeTable]:
    """Create the ``current`` + ``history`` pair under ``root``. ``schema``
    is the event payload schema (no op/epoch). ``current`` is keyed by the
    entity key (bucket-pruned point reads); ``history`` by entity key +
    opening version (each closed interval unique, append-only), versioned
    by the epoch seq so replays are idempotent row-wise too."""
    ts_type = {f.name: f.dataType for f in schema.fields}[version_cols[0]]
    cur = LakeTable.create(
        spark, os.path.join(root, "current"), schema,
        key_cols=key_cols, version_cols=version_cols,
        n_buckets=n_buckets, props=props,
    )
    hist_fields = list(schema.fields) + [
        StructField(VALID_TO_COL, ts_type, True),
        StructField(SEQ_COL, LongType(), True),
        StructField(CURRENT_COL, BooleanType(), True),
    ]
    hist = LakeTable.create(
        spark, os.path.join(root, "history"), StructType(hist_fields),
        key_cols=key_cols + version_cols, version_cols=[SEQ_COL],
        n_buckets=n_buckets, props=props,
    )
    return cur, hist


def apply_scd2(
    current: LakeTable,
    history: LakeTable,
    batch: DataFrame,
    epoch: int,
    op_col: str = "op",
    delete_op: str = "D",
    manifest_prefix: str = "scd2",
) -> tuple[MergeStats, MergeStats]:
    """Apply one epoch of CDC events to the SCD2 pair, exactly-once under
    manifest keys ``{manifest_prefix}:hist:{epoch}`` /
    ``{manifest_prefix}:cur:{epoch}`` (epoch last, so the keys fold into
    per-prefix watermarks and metadata stays bounded; a streaming caller
    namespaces the prefix per stream identity). See the module docstring
    for ordering and stale-winner semantics."""
    snap = current.current_snapshot()
    # cur commits LAST, so its manifest implies the whole round landed:
    # a replayed epoch (streaming checkpoint re-delivery, re-run of a WAL
    # directory) short-circuits BEFORE the eager winner/close computation
    # — a 1,000-epoch re-replay costs 1,000 metadata reads, not 1,000 jobs
    if snap.has_applied(f"{manifest_prefix}:cur:{epoch}"):
        return (
            MergeStats(f"{manifest_prefix}:hist:{epoch}", False,
                       history.current_version()),
            MergeStats(f"{manifest_prefix}:cur:{epoch}", False, snap.version),
        )
    key_cols, ver_cols = snap.key_cols, snap.version_cols
    ts_col = ver_cols[0]
    payload = [f.name for f in snap.schema.fields]
    # additive schema evolution passes through: batch columns the pair has
    # not seen yet ride the winners into the current merge (which evolves
    # additively, like every LakeTable merge); history evolves later, when
    # the first CLOSED interval carrying the column lands — closed rows
    # are snapshots of the OLD state, so this epoch's closes stay on the
    # pre-evolution payload by construction
    extras = [c for c in batch.columns
              if c not in payload and c != op_col]

    # one state per key per epoch; materialized once — feeds the bucket
    # collect, the close join, and the current merge, and must not lazily
    # re-read source files across those actions
    winners = lww_dedup(
        batch.select(*payload, *extras, op_col), key_cols, ver_cols
    ).localCheckpoint(eager=True)

    # bucket-pruned point read of the affected open intervals: O(batch
    # keys) rows whatever the history size — the reason current is its
    # own entity-keyed table
    open_rows = current.read(
        buckets=_changed_buckets(current, winners.select(*key_cols),
                                 current.current_version())
    ).join(winners.select(*key_cols), key_cols, "left_semi")

    # close iff the winner strictly advances the key's version; a stale
    # winner loses LWW in current and must not produce a backwards
    # (valid_to < valid_from) interval here
    closed = (
        open_rows.alias("o")
        .join(winners.alias("w"), key_cols, "inner")
        .filter(_ver("w", ver_cols) > _ver("o", ver_cols))
        .select(
            *[F.col(f"o.{c}").alias(c) for c in payload],
            F.col(f"w.{ts_col}").alias(VALID_TO_COL),
            F.lit(epoch).cast("long").alias(SEQ_COL),
            F.lit(False).alias(CURRENT_COL),
            F.lit("U").alias("op"),
        )
    )
    hist_stats = history.merge(
        closed, manifest_key=f"{manifest_prefix}:hist:{epoch}"
    )
    cur_stats = current.merge(
        winners, manifest_key=f"{manifest_prefix}:cur:{epoch}",
        op_col=op_col, delete_op=delete_op,
    )
    return hist_stats, cur_stats


def replay_scd2(
    spark: SparkSession,
    events_dir: str,
    root: str,
    key_cols: list[str],
    version_cols: list[str],
    n_buckets: int = 32,
    table_props: dict[str, str] | None = None,
) -> tuple[LakeTable, LakeTable, list[tuple[MergeStats, MergeStats]]]:
    """End-to-end incremental SCD2 over a landed WAL directory
    (``epoch=N`` subdirs, same layout :func:`~etl_spark.cdc.replay
    .replay_events` consumes). Already-applied epochs are metadata
    no-ops; epochs must be applied in order (the close step reads the
    state the previous epoch left)."""
    sample = spark.read.parquet(events_dir)
    payload = StructType(
        [f for f in sample.schema.fields if f.name not in ("op", "epoch")]
    )
    if LakeTable.exists(os.path.join(root, "current")):
        cur = LakeTable.load(spark, os.path.join(root, "current"))
        hist = LakeTable.load(spark, os.path.join(root, "history"))
    else:
        cur, hist = create_scd2_tables(
            spark, root, payload, key_cols, version_cols,
            n_buckets=n_buckets, props=table_props,
        )
    stats = []
    for e in sorted(
        int(d.split("=")[1])
        for d in os.listdir(events_dir) if d.startswith("epoch=")
    ):
        batch = spark.read.parquet(os.path.join(events_dir, f"epoch={e}"))
        stats.append(apply_scd2(cur, hist, batch.drop("epoch"), e))
    return cur, hist, stats


def purge_scd2(
    current: LakeTable,
    history: LakeTable,
    keys: DataFrame,
    manifest_key: str,
    keep_last: int = 1,
    vacuum_grace_sec: float = 600.0,
) -> dict:
    """Right-to-erasure across the SCD2 pair: physically remove a subject
    key set's payload from BOTH tables — the open interval in ``current``
    and every closed interval in ``history`` — live state, version
    history, and files. The single-table composition (tombstone through
    MERGE → targeted compaction → snapshot expiry → vacuum) and its
    rationale live in :mod:`etl_spark.lake.purge`; this adds the pair
    semantics an SCD2 product needs, because ``history`` is append-only
    with the subject's payload in every closed interval (reference
    context: the versioned-table intent, bd.py:77-84, over sensitive
    SINAN microdata, sinan/violencia.py — exactly the data an LGPD
    erasure request targets).

    History is keyed by entity key + OPENING VERSION, so one subject owns
    many history keys and their bucket ids hash over the full key — an
    entity key set cannot bucket-prune the lookup. Finding the subject's
    intervals therefore costs one map-side scan of history (semi-join
    against the bounded key set, no shuffle); batch erasure requests to
    amortize it. Everything after the lookup is bounded: the tombstone
    merge is O(subject intervals), compaction rewrites only their
    buckets.

    Crash safety: each merge is exactly-once under ``{manifest_key}:hist``
    / ``{manifest_key}:cur``, and the interval lookup reads
    ``include_deleted=True`` — a re-run after a crash between merge and
    compaction still sees the already-tombstoned intervals, so it
    recomputes the same affected buckets and finishes the file-level
    scrub (a live-rows read would return nothing and leave payload bytes
    in the un-compacted files). Mid-purge (history scrubbed, current not
    yet) the view degrades to open-intervals-only for the subject; re-run
    to completion. Tombstone KEYS remain in both tables by design — they
    are what keeps a late duplicate of the purged data suppressed; all
    payload columns are nulled at write time.

    Returns a combined report; both residuals MUST be 0.
    """
    from etl_spark.lake.purge import purge_keys
    from etl_spark.lake.refs import list_refs

    h_pins = list_refs(history.path)
    if h_pins:
        # same refusal as purge_keys (which covers `current`): a ref on
        # the HISTORY table pins pre-purge snapshots whose files
        # expire+vacuum could then never reclaim — silent erasure failure
        raise ValueError(
            f"scd2 purge refused: refs pin history snapshots "
            f"({sorted((r.name, r.version) for r in h_pins.values())}); "
            f"drop_ref()/move_branch() them past the purge first"
        )
    csnap = current.current_snapshot()
    key_cols = csnap.key_cols
    if sorted(keys.columns) != sorted(key_cols):
        raise ValueError(
            f"keys must have exactly the current table's key columns "
            f"{key_cols}, got {keys.columns}"
        )
    keys = keys.select(*key_cols).distinct().localCheckpoint(eager=True)

    hsnap = history.current_snapshot()
    intervals = (
        history.read(include_deleted=True)
        .join(keys, key_cols, "left_semi")
        .select(*hsnap.key_cols, SEQ_COL)
        .localCheckpoint(eager=True)
    )
    h_buckets = sorted(
        r["__b"]
        for r in intervals.select(history.bucket_expr(hsnap).alias("__b"))
        .distinct().collect()
    )
    tomb_h = intervals.select(
        *hsnap.key_cols,
        (F.col(SEQ_COL) + F.lit(1)).cast("long").alias(SEQ_COL),
        F.lit("D").alias("op"),
    )
    h_stats = history.merge(tomb_h, manifest_key=f"{manifest_key}:hist")
    h_compacted = history.compact(buckets=h_buckets)
    h_expired = history.expire_snapshots(keep_last=keep_last)
    h_removed = history.vacuum(older_than_sec=vacuum_grace_sec)
    h_residual = (
        history.read(buckets=h_buckets).join(keys, key_cols, "left_semi")
        .count()
    )
    cur_report = purge_keys(
        current, keys, f"{manifest_key}:cur",
        keep_last=keep_last, vacuum_grace_sec=vacuum_grace_sec,
    )
    return {
        "keys": cur_report["keys"],
        "history_intervals": intervals.count(),
        "history_tombstoned": h_stats.applied,
        "history_buckets_compacted": h_compacted,
        "history_snapshots_expired": len(h_expired),
        "history_files_vacuumed": len(h_removed),
        "history_residual_live": h_residual,
        "current_tombstoned": cur_report["tombstoned"],
        "current_buckets_compacted": cur_report["buckets_compacted"],
        "current_snapshots_expired": cur_report["snapshots_expired"],
        "current_files_vacuumed": cur_report["files_vacuumed"],
        "current_residual_live": cur_report["residual_live"],
    }


def scd2_view(current: LakeTable, history: LakeTable) -> DataFrame:
    """The full SCD2 product: closed intervals from history plus the open
    intervals (current rows, ``valid_to`` NULL, ``is_current`` true).

    Column sets may differ mid-evolution — an additive column reaches
    ``current`` one epoch before the first closed interval carries it into
    ``history`` — so the union aligns by name with NULL backfill: old
    vintages read NULL for columns that postdate them, the same contract
    every evolved LakeTable read has."""
    snap = current.current_snapshot()
    ts_col = snap.version_cols[0]
    ts_type = {f.name: f.dataType for f in snap.schema.fields}[ts_col]
    open_rows = (
        current.read()
        .withColumn(VALID_TO_COL, F.lit(None).cast(ts_type))
        .withColumn(CURRENT_COL, F.lit(True))
    )
    return history.read().drop(SEQ_COL).unionByName(
        open_rows, allowMissingColumns=True
    )
