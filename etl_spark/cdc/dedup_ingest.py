"""Dedup-gated CDC ingest: near-duplicate filtering as part of the merge.

The reference ingests each capture unit idempotently and relies on the
capture-history ledger to never re-process a slice
(/root/reference/src/impulsoetl/scripts/geral.py:36-116); its QA step
compares raw-vs-transformed aggregates before load
(sisab/relatorio_validacao_producao/verificacao.py:15-44). A
training-data corpus needs the stronger, content-level gate: an incoming
batch must not land documents that already exist (or near-exist) in the
corpus — and the check must be incremental, i.e. never re-read or
re-shingle corpus text.

:func:`dedup_gated_merge` composes the engine's pieces into that gate:

1. **exact dedup within the batch** — keep the min-id row per
   ``md5(text)`` (one hash-partitioned window);
2. **near-dup dedup within the batch** — MinHash → LSH banding →
   candidate pairs (``max_bucket`` skew guard) → exact shingle-set
   Jaccard verification; a doc is dropped iff a verified pair links it
   to a lower id;
3. **near-dup check against the corpus** — the batch's banded keys are
   joined against bucket rows *derived from the stored sketch state*
   (per-row array math over ``(id, sig, sh)`` — no text, no shingling),
   then candidates are verified by Jaccard over the stored shingle-hash
   sets;
4. **exactly-once dual merge** — survivors land in the docs table and
   their sketches in the state table under the SAME manifest key.
   Docs-before-state ordering makes a crash between the two commits
   recoverable: the rerun recomputes the gate against unchanged state
   (deterministically identical survivors), skips the docs merge via
   ``has_applied``, and applies the missing state merge. The reverse
   order would poison the rerun (the batch would match its own sketches).

A batch re-delivered under a *different* manifest key is absorbed too:
same-id re-deliveries pass the gate (an id match is an UPDATE, never a
dup — self-matches are excluded) and are LWW-idempotent in the docs
merge, while the same content re-keyed under new ids near-matches its
corpus twins (Jaccard 1.0) and is dropped.

Scale shape (100 TB corpus): everything per-batch is near-linear in the
batch — sketching is per-row, candidate pairs are bucket-bounded, and
verification touches only candidates. The corpus-side cost is ONE scan
of the sketch state per batch (the banded-key join), never of the
corpus text; deriving band keys from stored signatures is 4 short md5s
per state row. The Jaccard arrays ride along the bucket join — corpus
sketches are shuffled once by (band, bucket), nothing is broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from etl_spark.lake import LakeTable

__all__ = ["DedupIngestStats", "create_dedup_state", "dedup_gated_merge",
           "minhash_sketch"]


@dataclass(frozen=True)
class DedupIngestStats:
    manifest_key: str
    applied: bool                 # False = both tables had already applied
    n_input: int | None           # None when collect_stats=False
    n_after_exact: int | None
    n_after_within: int | None
    n_kept: int | None
    docs_version: int
    state_version: int


def minhash_sketch(
    df: DataFrame, text_col: str, num_hashes: int = 16, shingle_k: int = 3,
    sig_col: str = "sig", sh_col: str = "sh",
) -> DataFrame:
    """Append BOTH the distinct shingle-hash set ``sh`` (array<long>, the
    exact-Jaccard basis) and the MinHash signature ``sig`` derived from it
    (bit-identical to :func:`etl_spark.operators.dedup.minhash_signature`
    — same hash-once XOR family over the same shingle hashes), hashing
    each shingle exactly once. The shingle set is materialized through a
    generator stage so the optimizer cannot inline the tokenization into
    each of the ``num_hashes`` signature slots."""
    from etl_spark.functions.hashing import portable_hash60
    from etl_spark.functions.text import word_shingles
    from etl_spark.operators.dedup import minhash_xor_salt

    row_col = "__sk_row"
    while row_col in df.columns:
        row_col += "_"
    packed = df.select(
        F.inline(
            F.array(
                F.struct(
                    F.struct(*[F.col(c) for c in df.columns]).alias(row_col),
                    F.array_distinct(
                        F.transform(
                            word_shingles(text_col, shingle_k),
                            lambda s: portable_hash60(s),
                        )
                    ).alias(sh_col),
                )
            )
        )
    )

    def _mh(i: int):
        salt = F.lit(minhash_xor_salt(i))
        return F.array_min(
            F.transform(F.col(sh_col), lambda h: h.bitwiseXOR(salt))
        )

    return packed.select(
        *[F.col(row_col).getField(c).alias(c) for c in df.columns],
        F.col(sh_col),
        F.array(*[_mh(i) for i in range(num_hashes)]).alias(sig_col),
    )


def create_dedup_state(
    spark: SparkSession, path: str, id_col: str = "doc_id",
    n_buckets: int = 32, props: dict | None = None,
) -> LakeTable:
    """Create the sketch-state table: one write-once row per surviving
    corpus document — ``(id, sig array<long>, sh array<long>, v)``. Band
    keys are derived from ``sig`` at join time, so the state carries no
    text and no per-band row duplication."""
    schema = StructType([
        StructField(id_col, LongType(), True),
        StructField("sig", ArrayType(LongType()), True),
        StructField("sh", ArrayType(LongType()), True),
        StructField("v", LongType(), True),
    ])
    return LakeTable.create(
        spark, path, schema, key_cols=[id_col], version_cols=["v"],
        n_buckets=n_buckets, props=props or {},
    )


def _jaccard_ok(sh_a, sh_b, threshold: float):
    """size(∩)/size(∪) >= t with the SAME floating ops the DuckDB oracle
    uses (integer sizes, one double division) — bit-identical decisions."""
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(F.array_union(sh_a, sh_b)).cast("double")
    return (inter / union) >= F.lit(threshold)


def dedup_gated_merge(
    docs: LakeTable,
    state: LakeTable,
    batch: DataFrame,
    manifest_key: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str = "op",
    num_hashes: int = 16,
    shingle_k: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    collect_stats: bool = True,
) -> DedupIngestStats:
    """Run the dedup gate over ``batch`` and merge survivors + sketches
    exactly once under ``manifest_key``.

    ``batch`` carries the docs table's key/version/payload columns plus
    ``op_col``; ``state`` must have been created by
    :func:`create_dedup_state` with the same ``id_col``. Deterministic:
    the kept set is a pure function of (batch content, state content),
    so crash-rerun replays converge (see module docstring for why the
    docs merge must commit before the state merge).
    """
    from etl_spark.operators.dedup import (incremental_lsh_matches,
                                           lsh_buckets, lsh_candidate_pairs)

    docs_snap = docs.current_snapshot()
    state_snap = state.current_snapshot()
    if docs_snap.has_applied(manifest_key) and state_snap.has_applied(manifest_key):
        return DedupIngestStats(manifest_key, False, None, None, None, None,
                                docs_snap.version, state_snap.version)

    sk_cols = {"sig", "sh"}
    clash = sk_cols & set(batch.columns)
    if clash:
        raise ValueError(f"batch must not carry sketch columns: {sorted(clash)}")

    # -- 1. exact dedup within the batch (min id per content hash) ------
    w = Window.partitionBy(F.md5(F.col(text_col)))
    exact = (
        batch.withColumn("__min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )

    # sketch once; reused by steps 2-4 (batch-sized, so a local
    # checkpoint beats recomputing tokenization per consumer)
    sketched = minhash_sketch(
        exact, text_col, num_hashes=num_hashes, shingle_k=shingle_k
    ).localCheckpoint(eager=False)
    b_buckets = lsh_buckets(
        sketched.filter(F.size("sh") > 0), id_col, sig_col="sig",
        bands=bands, rows_per_band=rows_per_band,
    )

    # -- 2. near-dup dedup within the batch -----------------------------
    pairs = lsh_candidate_pairs(b_buckets, id_col, max_bucket=max_bucket)
    sh_of = sketched.select(F.col(id_col), F.col("sh"))
    verified_within = (
        pairs.join(sh_of.select(F.col(id_col).alias("a"),
                                F.col("sh").alias("__sh_a")), "a")
        .join(sh_of.select(F.col(id_col).alias("b"),
                           F.col("sh").alias("__sh_b")), "b")
        .filter(_jaccard_ok(F.col("__sh_a"), F.col("__sh_b"), threshold))
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    within = sketched.join(verified_within, id_col, "left_anti")

    # -- 3. near-dup check against the corpus sketch state --------------
    # Band keys derived per-row from stored signatures: the corpus text
    # is never touched, and the sh arrays ride the same bucketed join.
    corpus = state.read().select(F.col(id_col), "sig", "sh")
    c_buckets = lsh_buckets(
        corpus.filter(F.size("sh") > 0), id_col, sig_col="sig",
        bands=bands, rows_per_band=rows_per_band,
    )
    w_buckets = b_buckets.join(
        within.select(id_col), id_col, "left_semi"
    )
    matches = incremental_lsh_matches(
        w_buckets, c_buckets, id_col, max_bucket=max_bucket
    )
    verified_cross = (
        matches.join(sh_of.select(F.col(id_col).alias("new_id"),
                                  F.col("sh").alias("__sh_a")), "new_id")
        .join(corpus.select(F.col(id_col).alias("dup_id"),
                            F.col("sh").alias("__sh_b")), "dup_id")
        .filter(_jaccard_ok(F.col("__sh_a"), F.col("__sh_b"), threshold))
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    kept = within.join(verified_cross, id_col, "left_anti") \
                 .localCheckpoint(eager=False)

    n_input = n_exact = n_within = n_kept = None
    if collect_stats:
        n_input = batch.count()
        n_exact = sketched.count()
        n_within = within.count()
        n_kept = kept.count()

    # -- 4. exactly-once dual merge (docs BEFORE state) -----------------
    d_stats = docs.merge(kept.drop("sig", "sh"), manifest_key, op_col=op_col)
    # State rows version with the docs commit version (monotone across
    # batches): a same-id re-delivery with CHANGED text is an update — its
    # new sketch must WIN the state LWW, not tie with the stale one. (On a
    # crash-window rerun d_stats.version is the already-committed current
    # version; the sketch content is identical either way, so the higher
    # v only re-asserts the same winner. Callers serialize batches — the
    # streaming face does by construction.)
    s_stats = state.merge(
        kept.select(F.col(id_col), "sig", "sh",
                    F.lit(d_stats.version).cast("long").alias("v"),
                    F.lit("I").alias(op_col)),
        manifest_key, op_col=op_col,
    )
    return DedupIngestStats(
        manifest_key, d_stats.applied or s_stats.applied,
        n_input, n_exact, n_within, n_kept,
        d_stats.version, s_stats.version,
    )
