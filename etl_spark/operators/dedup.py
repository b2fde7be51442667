"""Deduplication suite for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection, all as
declarative DataFrame plans over a ``documents``-shaped table
(id, text, ...). Every hash is :func:`etl_spark.functions.hashing.
portable_hash60`, so a pure-SQL DuckDB oracle reproduces the results
bit-for-bit (the correctness gate).

Scale design (100 TB corpus):
- Exact dedup is one hash-groupBy with map-side partial aggregation.
- MinHash signatures are per-row expressions — no shuffle at all.
- LSH banding replaces the O(n²) pair space with a groupBy on band keys;
  candidate pairs come from *within buckets only*. Bucket skew (a viral
  boilerplate shingle set) is bounded by ``max_bucket`` guard.
- SimHash is per-row + one self-join on the 16-bit prefix for candidates.
- Exact Jaccard runs only on LSH candidates, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.functions.hashing import portable_hash60
from etl_spark.functions.text import tokens, word_shingles

__all__ = [
    "exact_dedup_groups", "minhash_signature", "lsh_buckets",
    "lsh_candidate_pairs", "incremental_lsh_matches", "ngram_jaccard_pairs",
    "eval_contamination", "simhash", "simhash_groups",
    "connected_components", "connected_components_star",
]


def exact_dedup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """One row per distinct content hash: canonical (min) id + member count.
    The classic exact-dedup reduce — one shuffle on the hash, partial
    (map-side) combine."""
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def minhash_xor_salt(i: int) -> int:
    """Deterministic 60-bit XOR constant for min-hash family member ``i``
    (golden-ratio Weyl sequence — reproducible as a SQL literal)."""
    return (i * 0x9E3779B97F4A7C15 + 0x5851F42D4C957F2D) % (1 << 60)


def minhash_signature(
    df: DataFrame, text_col: str, num_hashes: int = 16, shingle_k: int = 3,
    out_col: str = "minhash",
) -> DataFrame:
    """Append an array<long> MinHash signature per row.

    Each distinct shingle is md5-hashed ONCE (``portable_hash60``); family
    member i is the XOR-permutation ``h ⊕ salt_i`` (the standard
    cheap-family construction — one cryptographic hash per shingle instead
    of ``num_hashes``, which measured 16× less hashing on long documents).
    signature[i] = min over the document's shingles. Pure per-row
    expression: no shuffle, embarrassingly parallel, and bit-reproducible
    in the DuckDB oracle (xor of the same 60-bit values).

    Both the shingle array and its hashed form are materialized once per
    row through a generator stage — a bare Project alias would be inlined
    into every one of the ``num_hashes`` consuming expressions by the
    optimizer, re-tokenizing the document N times."""
    row_col, hs_col = "__mh_row", "__mh_hs"
    while row_col in df.columns:
        row_col += "_"
    while hs_col in df.columns:
        hs_col += "_"
    packed = df.select(
        F.inline(
            F.array(
                F.struct(
                    F.struct(*[F.col(c) for c in df.columns]).alias(row_col),
                    F.transform(
                        word_shingles(text_col, shingle_k),
                        lambda s: portable_hash60(s),
                    ).alias(hs_col),
                )
            )
        )
    )

    def _minhash(i: int):
        salt = F.lit(minhash_xor_salt(i))
        # one-arg closure (a `i=i` default would make pyspark treat the
        # lambda as binary and feed the array index as `i`)
        return F.array_min(
            F.transform(F.col(hs_col), lambda h: h.bitwiseXOR(salt))
        )

    sig = F.array(*[_minhash(i) for i in range(num_hashes)])
    # getField (not "a.b" string paths): user column names may contain dots
    return packed.select(
        *[F.col(row_col).getField(c).alias(c) for c in df.columns],
        sig.alias(out_col),
    )


def lsh_buckets(
    df: DataFrame, id_col: str, sig_col: str = "minhash",
    bands: int = 4, rows_per_band: int = 4,
) -> DataFrame:
    """Explode each signature into ``bands`` band-bucket keys
    (band id + md5 of that band's signature slice). Docs sharing any bucket
    are near-dup candidates."""
    band_rows = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.element_at(F.col(sig_col), b * rows_per_band + r + 1).cast("string")
                      for r in range(rows_per_band)],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return df.select(F.col(id_col), F.explode(F.array(*band_rows)).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_candidate_pairs(
    buckets: DataFrame, id_col: str, max_bucket: int = 1000
) -> DataFrame:
    """Distinct candidate (a, b) pairs (a < b) from shared LSH buckets.

    ``max_bucket`` drops degenerate buckets (boilerplate that hashes half the
    corpus together) — the skew guard that keeps the within-bucket self-join
    quadratic blowup bounded; dropped buckets should be logged upstream.

    The guard is a COUNT-ONLY aggregate (combinable partials) followed by
    a semi-join — never a ``collect_list``: a viral bucket must be
    droppable without ever materializing its member list in an
    aggregation buffer (at corpus scale that buffer is the OOM)."""
    ok = (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("band", "bucket")
    )
    guarded = buckets.join(ok, ["band", "bucket"])
    a = guarded.select(F.col(id_col).alias("a"), "band", "bucket")
    b = guarded.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def incremental_lsh_matches(
    new_buckets: DataFrame,
    corpus_buckets: DataFrame,
    id_col: str = "doc_id",
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup candidates of an incoming batch against the already-ingested
    corpus — the CDC-flavored dedup gate. The corpus's LSH bucket rows
    ``(band, bucket, id)`` are *state* (reference analogue: the capture
    ledger that makes re-ingest incremental, scripts/geral.py:92-109):
    computed once per document at ingest time and stored in a lake table
    bucketed by ``(band, bucket)``, so at 100 TB an incremental batch never
    re-shingles or re-scans the corpus — it joins its own banded keys
    (per-row, no shuffle to produce) against the co-located state.

    Returns distinct ``(new_id, dup_id)`` pairs where ``dup_id`` is a
    corpus doc sharing at least one band bucket with the new doc. The
    ``max_bucket`` guard bounds degenerate (boilerplate) corpus buckets
    with a COUNT-ONLY aggregate (combinable partials) and a semi-join —
    a viral bucket is dropped without ever materializing its member list
    in an aggregation buffer (same contract as
    :func:`lsh_candidate_pairs`; at corpus scale the sizes are cached
    per vintage alongside the bucket table itself).
    """
    ok = (
        corpus_buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_bucket)
        .select("band", "bucket")
    )
    nb = new_buckets.select(
        F.col(id_col).alias("new_id"), "band", "bucket"
    )
    cb = corpus_buckets.join(ok, ["band", "bucket"]).select(
        F.col(id_col).alias("dup_id"), "band", "bucket"
    )
    return (
        nb.join(cb, ["band", "bucket"])
        .filter(F.col("new_id") != F.col("dup_id"))
        .select("new_id", "dup_id")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.0,
    restrict_to_candidates: bool = True,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    ``pairs`` has columns (a, b); the shingle sets are joined in twice
    (broadcast when small). Output: (a, b, jaccard) with jaccard rounded to
    6 dp for engine-portable comparison.

    ``restrict_to_candidates`` (default) semi-joins the corpus down to ids
    that appear in ``pairs`` BEFORE computing the (expensive, wide) shingle
    arrays — candidates are a near-linear sliver of the corpus, so the
    exact-verification stage shouldn't tokenize everything. Callers should
    pass a materialized ``pairs`` (e.g. localCheckpoint) — it is consumed
    three times here."""
    src = df
    if restrict_to_candidates:
        ids = (
            pairs.select(F.col("a").alias(id_col))
            .unionByName(pairs.select(F.col("b").alias(id_col)))
            .distinct()
        )
        src = df.join(ids, id_col, "left_semi")
    sets_ = src.select(
        F.col(id_col).alias("__id"), word_shingles(text_col, shingle_k).alias("__sh")
    )
    j = (
        pairs.join(sets_.withColumnRenamed("__id", "a").withColumnRenamed("__sh", "sh_a"), "a")
        .join(sets_.withColumnRenamed("__id", "b").withColumnRenamed("__sh", "sh_b"), "b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.round(F.when(union == 0, F.lit(0.0)).otherwise(inter / union), 6)
    return (
        j.select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(
    pairs: DataFrame, a: str = "a", b: str = "b", max_iter: int = 50
) -> DataFrame:
    """Near-dup clusters: connected components over candidate pairs.

    Iterative min-label propagation (the standard large-graph approach —
    each round every node adopts the smallest label among itself and its
    neighbours; converges in O(diameter) rounds). Each round is one
    broadcast-or-shuffle join + a combinable min aggregate; the driver only
    checks the converged-bit, so the data plane stays distributed.

    Raises ``RuntimeError`` if labels have not converged after ``max_iter``
    rounds (a silently-unconverged result would split one component into
    several clusters); near-dup graphs have tiny diameters, so hitting the
    cap means the input is not the candidate-pair graph this is for.

    Returns (node, component) where component = min node id reachable.
    """
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    changed = 1
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component"))
                .alias("__changed"),
            )
        )
        # one small action per round: did any label improve?
        changed = updated.filter(F.col("__changed")).limit(1).count()
        # truncate lineage each round or the plan grows exponentially
        labels = updated.drop("__changed").localCheckpoint(eager=True)
        if not changed:
            break
    if changed:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter"
        )
    return labels


def connected_components_star(
    pairs: DataFrame, a: str = "a", b: str = "b", max_rounds: int = 30
) -> DataFrame:
    """Connected components by alternating **large-star / small-star
    contraction** (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — converges in O(log n) rounds regardless of graph diameter,
    where min-label propagation needs O(diameter). Use this when component
    chains can be long (transitive near-dup chains at corpus scale);
    :func:`connected_components` remains for small-diameter graphs.

    Each round is two groupBy-min + join passes over the edge set, with
    the edge set shrinking toward star graphs (every node pointing at its
    component minimum). The driver only checks an (edge-count, checksum)
    fixpoint per round; lineage is truncated with localCheckpoint.

    Returns (node, component) where component = min node id reachable.
    """
    # materialize the input ONCE: the candidate-pair pipeline feeding this
    # is often the most expensive stage of the whole job, and it is
    # consumed by the node universe, and twice per round (both edge
    # orientations) — deriving those from separate lazy references would
    # re-run it each time
    raw = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).localCheckpoint(
        eager=True
    )
    # node universe BEFORE dropping self-loops: a node whose only pair is
    # reflexive is a singleton component, not absent (parity with
    # connected_components)
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    e = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)

    def _sig(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent, overflow-free under ANSI mode
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    prev = None
    for _ in range(max_rounds):
        # LARGE-STAR: per node u, attach every strictly-larger neighbour
        # to m = min(Γ(u) ∪ {u})
        nbrs = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = nbrs.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("mv", F.col("u")).alias("m")
        )
        e = (
            nbrs.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # SMALL-STAR: per node u, attach u and its ≤-neighbours to their min
        le = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = le.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            le.join(mins, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("v"),
                    F.col("u").alias("self"))
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("x").alias("u"), F.col("v")),
                        F.struct(F.col("self").alias("u"), F.col("v")),
                    )
                ).alias("ed")
            )
            .select(F.col("ed.u").alias("u"), F.col("ed.v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _sig(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    # fixpoint: e is a star forest (u -> component min); roots map to selves
    labels = e.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("component")
    )
    return (
        all_nodes.join(labels, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )


def simhash(df: DataFrame, text_col: str, bits: int = 16, out_col: str = "simhash") -> DataFrame:
    """Append a ``bits``-bit SimHash of the whitespace tokens.

    bit b of the fingerprint = 1 iff sum over tokens of ±1 (sign of bit b of
    the token's portable hash) is positive. Pure per-row array aggregation —
    no explode, no shuffle."""
    ts = tokens(text_col)
    hs = F.transform(ts, lambda t: portable_hash60(t))

    # ONE aggregate pass with a struct-of-counters accumulator: the token
    # hash `h` is a bound lambda variable, so md5 runs once per token (a
    # per-bit aggregate formulation re-hashes every token `bits` times).
    def _merge(acc, h):
        return F.struct(
            *[
                (acc[f"v{b}"] + F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))).alias(f"v{b}")
                for b in range(bits)
            ]
        )

    zero = F.struct(*[F.lit(0).cast("long").alias(f"v{b}") for b in range(bits)])
    votes = F.aggregate(hs, zero, _merge)
    fp = None
    for b in range(bits):
        term = F.when(votes[f"v{b}"] > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return df.withColumn(out_col, fp)


def simhash_groups(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Docs sharing an identical SimHash (near-dup clusters at this bit
    width): fingerprint → canonical id + member count."""
    withfp = simhash(df, text_col, bits)
    return (
        withfp.groupBy(F.col("simhash"))
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_members"))
    )


def eval_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    k-word shingle with an evaluation set, with the count of distinct
    overlapping shingles per flagged doc (``n_hits``).

    Scale shape: the eval side of the join is the *benchmark suite* —
    thousands of documents, millions of shingles at worst — so its
    distinct shingle set is broadcast; the training corpus streams
    through one codegen'd explode + broadcast semi-join + combinable
    groupBy. The corpus is never shuffled by shingle, so a hot shingle
    ('the end of') cannot skew the join. For an eval set too large to
    broadcast, drop the explicit hint and let AQE pick the join side.
    """
    keep = keep_cols or []
    ev = (
        eval_df.select(F.explode(word_shingles(F.col(text_col), shingle_k)).alias("s"))
        .distinct()
    )
    tr = train.select(
        id_col, *keep, F.explode(word_shingles(F.col(text_col), shingle_k)).alias("s")
    )
    # plain count == count(distinct s) here: word_shingles is
    # array_distinct per document and the eval side is distinct, so the
    # join cannot duplicate a (doc, shingle) pair — and count is purely
    # combinable (map-side partials), avoiding the extra dedup exchange
    # a count_distinct plan inserts.
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy(id_col, *keep)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
