"""Incremental join-view maintenance: two change feeds → denormalized table.

The reference enriches every fact load with dimension lookups at capture
time (municipality/period attributes joined into each SIA/SIH batch —
/root/reference/src/impulsoetl/comum/geografias.py,
comum/datas.py:periodo_por_data — and re-runs whole slices when either
side changes). At lake scale "re-run the slice" becomes incremental view
maintenance over a JOIN: keep a destination exactly equal to

    fact  LEFT JOIN  dim  ON  fact[dim_on] = dim[key_cols]

as BOTH sides keep changing, touching only what changed. This is the
delta-join decomposition (ΔF ⋈ D′  ∪  F′ ⋈ ΔD) specialized to the
many-to-one enrich shape every CDC pipeline has: a big fact stream, a
small-but-mutable dimension.

Protocol per round (:func:`sync_join`), two cursors, one per upstream:

- **Fact leg** (cursor ``{prefix}F``): ``fact.changes(cursorF, endF)``
  names the changed fact KEYS — never trusted for values (a feed
  post-image may be a late LWW loser). Their true current rows are read
  from the ``endF`` snapshot bucket-pruned (≈ |changed buckets| /
  n_buckets of the fact table), LEFT-joined to the dim's ``endD`` state,
  and merged; fact tombstones become destination tombstones.
- **Dim leg** (cursor ``{prefix}D``): ``dim.changes(cursorD, endD)``
  names the changed dim KEYS (small by contract — it is a dimension).
  Affected fact rows are found with a broadcast semi join on the fact's
  reference columns — a column-pruned scan of the fact state with NO
  shuffle of the fact side — then re-emitted joined to the new dim values
  (read bucket-pruned to exactly the changed dim keys). A deleted dim key
  re-emits its fact rows with NULL dim attributes (LEFT semantics). Rows
  already re-emitted by this round's fact leg are anti-joined away.

Each leg advances its cursor in the same atomic commit that lands its
rows (manifest keys ``{prefix}F:{endF}`` / ``{prefix}D:{endD}``, both
declared monotone so metadata stays bounded). A crash between the legs
leaves one cursor behind; the next round simply replays that leg — LWW
plus the round sequence column make re-application a no-op.

**Versioning.** The destination's LWW version is a single synthetic
column ``_jsync_seq = endF + endD`` — strictly monotone across useful
rounds (each advances at least one upstream version), so a later round's
re-emission of a key always beats an earlier one, and replaying a crashed
leg (same seq) is value-identical. Fact version columns need not be
carried: rounds are totally ordered by the manifest, and within a round
every key is emitted at most once per leg with identical values.

**Honest costs.** The fact leg is O(changed fact keys) — bucket-pruned
point reads, never a scan. The dim leg is O(fact rows referencing the
changed dim keys) and must FIND them: without an index from dim key →
fact rows that is one column-pruned pass over the fact state per round
(broadcast semi join, no shuffle, combinable with AQE). That pass is the
price of denormalization everywhere (Delta/Iceberg MERGE-based refresh
pays the same); it is why dims that churn every row every round should
be joined at read time instead. Dim deletes and late fact events are
handled; upstream ROLLBACKS are not replayable (same contract as
cdc.sync — the guard raises, re-bootstrap fresh).

Bounds: each feed can only start at a snapshot that still exists
upstream; a consumer that lapsed past either retention horizon must
re-bootstrap with ``full_refresh=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_spark.cdc.sync import _guard_upstream, last_synced_version
from etl_spark.lake import LakeTable, MergeStats

__all__ = ["JSYNC_SEQ", "create_join_table", "sync_join"]

JSYNC_SEQ = "_jsync_seq"


def _dim_out_cols(
    fact_cols: list[str], dim: LakeTable, dim_select: dict[str, str] | None
) -> dict[str, str]:
    """dim payload column → output name; validated against collisions."""
    dsnap = dim.current_snapshot()
    payload = [f.name for f in dsnap.schema.fields
               if f.name not in dsnap.key_cols + dsnap.version_cols]
    if dim_select is not None:
        missing = [c for c in dim_select if c not in payload]
        if missing:
            raise ValueError(
                f"dim_select names {missing} that are not dim payload "
                f"columns (payload = schema minus key/version cols: "
                f"{payload})")
        out = dict(dim_select)
    else:
        out = {c: c for c in payload}
    taken = set(fact_cols) | {JSYNC_SEQ}
    clash = [v for v in out.values() if v in taken]
    if clash:
        raise ValueError(
            f"dim output columns {clash} collide with fact columns or "
            f"{JSYNC_SEQ!r}; rename them via dim_select={{dim_col: "
            f"out_name}}")
    if len(set(out.values())) != len(out):
        raise ValueError("dim_select maps two dim columns to the same "
                         "output name")
    return out


def _check_on(fact: LakeTable, dim: LakeTable, dim_on: list[str]) -> None:
    fsnap, dsnap = fact.current_snapshot(), dim.current_snapshot()
    fcols = {f.name for f in fsnap.schema.fields}
    missing = [c for c in dim_on if c not in fcols]
    if missing:
        raise ValueError(f"dim_on columns {missing} not in fact schema")
    if len(dim_on) != len(dsnap.key_cols):
        raise ValueError(
            f"dim_on has {len(dim_on)} columns but the dim is keyed by "
            f"{len(dsnap.key_cols)} ({dsnap.key_cols}); they pair "
            f"positionally")


def create_join_table(
    spark: SparkSession,
    path: str,
    fact: LakeTable,
    dim: LakeTable,
    dim_on: list[str],
    dim_select: dict[str, str] | None = None,
    n_buckets: int = 16,
    prefix: str = "jsync",
    props: dict | None = None,
) -> LakeTable:
    """Create the destination for :func:`sync_join`: fact user columns +
    dim payload columns (optionally renamed via ``dim_select``) +
    ``_jsync_seq``, keyed by the fact's key columns, versioned by the
    round sequence, with both leg cursors pre-declared monotone."""
    _check_on(fact, dim, dim_on)
    fsnap, dsnap = fact.current_snapshot(), dim.current_snapshot()
    fact_cols = [f.name for f in fsnap.schema.fields]
    out_map = _dim_out_cols(fact_cols, dim, dim_select)
    dtypes = {f.name: f.dataType for f in dsnap.schema.fields}
    fields = [StructField(f.name, f.dataType, True)
              for f in fsnap.schema.fields]
    fields += [StructField(out, dtypes[c], True)
               for c, out in out_map.items()]
    fields.append(StructField(JSYNC_SEQ, LongType(), True))
    merged_props = dict(props or {})
    declared = [p.strip() for p in
                merged_props.get("cursor_prefixes", "").split(",")
                if p.strip()]
    for p in (f"{prefix}F", f"{prefix}D"):
        if p not in declared:
            declared.append(p)
    merged_props["cursor_prefixes"] = ",".join(declared)
    return LakeTable.create(
        spark, path, StructType(fields), key_cols=list(fsnap.key_cols),
        version_cols=[JSYNC_SEQ], n_buckets=n_buckets, props=merged_props,
    )


def _changed_buckets(table: LakeTable, keys: DataFrame, version: int) -> list[int]:
    snap = table.snapshot(version)
    return sorted(
        r["__b"]
        for r in keys.select(table.bucket_expr(snap).alias("__b"))
        .distinct().collect()
    )


def sync_join(
    fact: LakeTable,
    dim: LakeTable,
    dst: LakeTable,
    dim_on: list[str],
    dim_select: dict[str, str] | None = None,
    prefix: str = "jsync",
    end_fact: int | None = None,
    end_dim: int | None = None,
    full_refresh: bool = False,
) -> list[MergeStats]:
    """One incremental join-maintenance round; returns the merge stats of
    the legs that ran ([] when both sides are caught up). See the module
    docstring for the protocol."""
    from etl_spark.lake.table import META_DELETED

    for p in (f"{prefix}F", f"{prefix}D"):
        if p not in dst.current_snapshot().cursor_prefixes():
            raise ValueError(
                f"destination does not declare {p!r} a cursor prefix: "
                f"create it with create_join_table (or add it to the "
                f"comma-separated cursor_prefixes prop) so sync cursor "
                f"metadata stays bounded")
    _check_on(fact, dim, dim_on)
    fsnap, dsnap = fact.current_snapshot(), dim.current_snapshot()
    fact_cols = [f.name for f in fsnap.schema.fields]
    fact_keys = list(fsnap.key_cols)
    dim_keys = list(dsnap.key_cols)
    out_map = _dim_out_cols(fact_cols, dim, dim_select)

    recF = last_synced_version(dst, f"{prefix}F")
    recD = last_synced_version(dst, f"{prefix}D")
    endF = fact.current_version() if end_fact is None else end_fact
    endD = dim.current_version() if end_dim is None else end_dim
    _guard_upstream(fact, recF, endF)
    _guard_upstream(dim, recD, endD)
    seq = F.lit(endF + endD).cast("long").alias(JSYNC_SEQ)
    on = [F.col(f"f.{dim_on[i]}").eqNullSafe(F.col(f"d.{k}"))
          for i, k in enumerate(dim_keys)]

    def joined(fact_rows: DataFrame, dim_state: DataFrame, op) -> DataFrame:
        """LEFT-enrich live fact rows and shape the merge batch."""
        return (
            fact_rows.alias("f").join(dim_state.alias("d"), on, "left")
            .select(
                *[F.col(f"f.{c}").alias(c) for c in fact_cols],
                *[F.col(f"d.{c}").alias(o) for c, o in out_map.items()],
                seq,
                op.alias("op"),
            )
        )

    stats: list[MergeStats] = []

    if recF is None or full_refresh:
        if recF is not None and endF <= recF:
            raise RuntimeError(
                f"full_refresh at fact v{endF} would be a manifest no-op: "
                f"the destination already recorded sync through v{recF}; "
                f"for divergence repair recreate the destination")
        # Bootstrap: the fact's LWW winners INCLUDING tombstones (they
        # must keep suppressing late fact events), enriched against the
        # dim's current state. Tombstones carry NULL dim attributes.
        state = fact.read(version=endF, with_meta=True, include_deleted=True)
        live = joined(
            state.filter(~F.col(META_DELETED)).drop(META_DELETED),
            dim.read(version=endD), F.lit("U"))
        dead = (
            state.filter(F.col(META_DELETED)).drop(META_DELETED)
            .select(
                *fact_cols,
                *[F.lit(None).cast(dsnap.schema[c].dataType).alias(o)
                  for c, o in out_map.items()],
                seq,
                F.lit("D").alias("op"),
            )
        )
        stats.append(dst.merge(live.unionByName(dead),
                               manifest_key=f"{prefix}F:{endF}"))
        # pin the dim cursor with a data-less commit so the first
        # incremental round does not replay the dim feed from v0
        empty = dst.spark.createDataFrame(
            [], StructType(list(dst.current_snapshot().schema.fields)
                           + [StructField("op", StringType(), True)]))
        stats.append(dst.merge(empty, manifest_key=f"{prefix}D:{endD}"))
        return stats

    if recD is None:
        raise RuntimeError(
            "destination has a fact cursor but no dim cursor — it was not "
            "bootstrapped by sync_join (or its manifest window was "
            "corrupted); re-bootstrap with full_refresh=True")

    changed_fact_keys = None
    if endF > recF:
        if recF not in set(fact.versions()):
            raise RuntimeError(
                f"fact cursor v{recF} fell past the upstream "
                f"snapshot-retention horizon (oldest kept: "
                f"v{min(fact.versions())}); re-bootstrap with "
                f"full_refresh=True")
        changed_fact_keys = (
            fact.changes(recF, endF).select(*fact_keys).distinct()
            .localCheckpoint(eager=True)
        )
        state = fact.read(
            version=endF,
            buckets=_changed_buckets(fact, changed_fact_keys, endF),
            with_meta=True, include_deleted=True,
        ).join(changed_fact_keys, fact_keys, "left_semi")
        live = joined(
            state.filter(~F.col(META_DELETED)).drop(META_DELETED),
            dim.read(version=endD), F.lit("U"))
        dead = (
            state.filter(F.col(META_DELETED)).drop(META_DELETED)
            .select(
                *fact_cols,
                *[F.lit(None).cast(dsnap.schema[c].dataType).alias(o)
                  for c, o in out_map.items()],
                seq,
                F.lit("D").alias("op"),
            )
        )
        stats.append(dst.merge(live.unionByName(dead),
                               manifest_key=f"{prefix}F:{endF}"))

    if endD > recD:
        if recD not in set(dim.versions()):
            raise RuntimeError(
                f"dim cursor v{recD} fell past the upstream "
                f"snapshot-retention horizon (oldest kept: "
                f"v{min(dim.versions())}); re-bootstrap with "
                f"full_refresh=True")
        changed_dim_keys = (
            dim.changes(recD, endD).select(*dim_keys).distinct()
            .localCheckpoint(eager=True)
        )
        # Affected fact rows: broadcast semi join on the reference columns
        # (dim keys may not be NULL; a NULL fact reference matches nothing,
        # so a plain equi semi join is exact). Column-pruned fact pass, no
        # fact shuffle — see the module docstring for why this pass exists.
        ref_on = [F.col(f"f.{dim_on[i]}") == F.col(f"d.{k}")
                  for i, k in enumerate(dim_keys)]
        affected = (
            fact.read(version=endF).alias("f")
            .join(F.broadcast(changed_dim_keys).alias("d"), ref_on,
                  "left_semi")
        )
        if changed_fact_keys is not None:
            # the fact leg already re-emitted these keys at this seq
            affected = affected.join(changed_fact_keys, fact_keys,
                                     "left_anti")
        # new dim values for exactly the changed keys, bucket-pruned point
        # read; a deleted dim key yields no row → NULL attributes (LEFT)
        dim_new = dim.read(
            version=endD,
            buckets=_changed_buckets(dim, changed_dim_keys, endD),
        ).join(changed_dim_keys, dim_keys, "left_semi")
        batch = joined(affected, dim_new, F.lit("U"))
        stats.append(dst.merge(batch, manifest_key=f"{prefix}D:{endD}"))

    return stats
