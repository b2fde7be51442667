"""Semantic snapshot diff — the audit counterpart of the change feed.

``LakeTable.changes`` replays commit *provenance* (what the merges in a
version range landed); :func:`snapshot_diff` computes the *state* delta
between two snapshots from the data itself, with no reliance on commit
metadata. The two must agree — a disagreement means feed loss or replay
corruption — which makes the diff the independent verifier for CDC-out
consumers (and the recovery path when a feed's snapshots were expired:
diff the states and re-sync from that).

Reference analogue: the reference re-derives "what changed this capture"
by re-querying and comparing aggregated slices
(/root/reference/src/impulsoetl/scripts/geral.py:92-109); this is the
same contract computed engine-side, column-exact.

Scale shape: one union of the two snapshot reads and ONE combinable
aggregate (``max(when(side, payload_struct))`` per side) — no join, the
same partial/final SortAggregate structure as the engine's LWW reads, so
a hot key costs one combine per upstream partition. Unchanged keys are
dropped by a null-safe struct comparison before anything is returned, so
output is O(differing keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.lake.table import LakeTable

__all__ = ["snapshot_diff"]

CHANGE_COL = "change"


def snapshot_diff(
    table: LakeTable,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows whose live state differs between two snapshots: one row per
    key with ``change`` in {'added', 'removed', 'changed'} plus the
    payload as of each side (``old_<col>`` / ``new_<col>``, NULL on the
    side where the key is absent). Keys identical on both sides are not
    returned. Column-level audit = compare the old/new pair."""
    snap = table.snapshot(to_version)
    key_cols = snap.key_cols
    payload = [f.name for f in snap.schema.fields if f.name not in key_cols]
    types = {f.name: f.dataType for f in snap.schema.fields}

    def side(version: int | None, tag: int) -> DataFrame:
        # the from-side may predate additive schema evolution: missing
        # payload columns align as typed NULLs (exactly how evolved reads
        # backfill them)
        df = table.read(version=version)
        have = set(df.columns)
        return df.select(
            *key_cols,
            F.struct(
                *[
                    (F.col(c) if c in have else F.lit(None).cast(types[c])).alias(c)
                    for c in payload
                ]
            ).alias("_p"),
            F.lit(tag).alias("_s"),
        )

    both = side(from_version, 0).unionByName(side(to_version, 1))
    g = both.groupBy(*key_cols).agg(
        F.max(F.when(F.col("_s") == 0, F.col("_p"))).alias("_old"),
        F.max(F.when(F.col("_s") == 1, F.col("_p"))).alias("_new"),
    )
    return (
        g.filter(~F.col("_old").eqNullSafe(F.col("_new")))
        .select(
            *key_cols,
            F.when(F.col("_old").isNull(), F.lit("added"))
            .when(F.col("_new").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias(CHANGE_COL),
            *[F.col(f"_old.{c}").alias(f"old_{c}") for c in payload],
            *[F.col(f"_new.{c}").alias(f"new_{c}") for c in payload],
        )
    )
