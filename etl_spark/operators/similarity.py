"""Similarity search over an embedding column (array<float>).

Two paths, both declarative:

- **Brute-force top-k** (the exactness baseline): cross-join query × corpus
  with the corpus *broadcast* (queries stream past it — no shuffle of the
  big side), cosine via higher-order array functions (JVM-side, codegen'd,
  no Python), then per-query argmax-k via map-side-combinable aggregation.
  At 100 TB of corpus this inverts: broadcast the (small) query set and
  stream the corpus, which is the same plan with roles swapped.
- **LSH-bucketed ANN** (the scale path): sign-bit random-hyperplane sketch
  computed from deterministic per-dimension weights (portable hashes, so the
  partitioning is reproducible), candidates restricted to same-bucket rows —
  turning the all-pairs product into a bucketed equi-join.

Similarities are rounded (4 dp) before ranking with an id tiebreak so
results are engine-portable (the DuckDB oracle reproduces them exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.functions.hashing import portable_hash60

__all__ = ["cosine", "bounded_topk", "brute_force_topk", "hyperplane_bucket",
           "lsh_ann_topk", "lsh_ann_topk_multiprobe", "ivf_ann_topk",
           "kmeans_spherical"]


def cosine(a, b):
    """Cosine similarity of two array<numeric> columns (double math)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def bounded_topk(
    cand: DataFrame,
    q_id: str,
    c_id: str,
    k: int,
    fanout: int = 32,
) -> DataFrame:
    """Per-query top-k of (q_id, c_id, sim) candidates with BOUNDED memory
    at every stage — the piece that must survive a corpus-scale candidate
    set (an unbounded per-query ``collect_list`` buffers the whole corpus
    for a hot query and OOMs; a single per-query sort window serializes it
    into one task).

    Two phases:

    1. partial top-k per ``(q_id, salt)`` — candidates salted into
       ``fanout`` deterministic shards, ranked with ``row_number`` over a
       *spillable* external sort (SortExec spills to disk; a collect_list
       buffer cannot), keeping ≤ k rows per shard;
    2. final combine per ``q_id`` over ≤ k·fanout survivors — small enough
       to collect, sort and slice exactly.

    Ranking key = (sim desc, c_id asc); with sims pre-rounded the result is
    deterministic and engine-portable."""
    from pyspark.sql.window import Window

    salt = F.pmod(F.xxhash64(F.col(c_id)), F.lit(fanout))
    w = Window.partitionBy(q_id, "__salt").orderBy(
        F.col("sim").desc(), F.col(c_id).asc()
    )
    partial = (
        cand.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )
    return (
        partial.groupBy(q_id)
        .agg(F.slice(F.array_sort(F.collect_list(
            F.struct((-F.col("sim")).alias("neg"), F.col(c_id).alias("cid")))),
            1, k).alias("top"))
        .select(F.col(q_id), F.posexplode("top").alias("pos", "t"))
        .select(
            F.col(q_id),
            F.col("t.cid").alias(c_id),
            (-F.col("t.neg")).alias("sim"),
            (F.col("pos") + 1).cast("int").alias("rank"),
        )
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    exclude_self: bool = True,
    fanout: int = 32,
    broadcast: str = "corpus",
) -> DataFrame:
    """Exact top-k neighbours per query: (q_id, c_id, sim, rank).

    Ranking key = (sim desc, c_id asc) with sim rounded to 4 dp →
    deterministic across engines. The per-query reduction is the two-phase
    :func:`bounded_topk` — no stage ever buffers more than k·fanout rows
    per query in memory, so the plan holds when the corpus (and therefore
    the candidate set per query) is 100×.

    ``broadcast`` picks which side ships to every executor: ``"corpus"``
    (default — right for a bounded corpus probed by a query stream) or
    ``"queries"`` (the 100 TB inversion: the corpus never fits an
    executor, so the bounded query set broadcasts and the corpus streams
    past it map-side — same plan, roles swapped, still zero shuffle of
    the big side). Results are identical either way."""
    if broadcast not in ("corpus", "queries"):
        raise ValueError(f"broadcast must be 'corpus' or 'queries', "
                         f"got {broadcast!r}")
    if broadcast == "corpus":
        joined = queries.crossJoin(F.broadcast(corpus))
    else:
        joined = F.broadcast(queries).crossJoin(corpus)
    if exclude_self:
        joined = joined.filter(F.col(q_id) != F.col(c_id))
    sim = F.round(cosine(F.col(q_vec), F.col(c_vec)), 4)
    cand = joined.select(F.col(q_id), F.col(c_id), sim.alias("sim"))
    return bounded_topk(cand, q_id, c_id, k, fanout)


def hyperplane_bucket(vec, n_bits: int = 8, seed: int = 7):
    """Sign-bit LSH sketch of an array<numeric>: bit b = sign of
    Σ_d w(b,d)·vec[d] where w(b,d) ∈ {-1,+1} derives from a portable hash of
    (seed, b, d). Deterministic, engine-portable, per-row only."""
    def _weights(b: int):
        # one-arg closure: a `b=b` default arg would be miscounted by
        # pyspark's lambda introspection as the array-index parameter.
        return lambda d: F.when(
            portable_hash60(d.cast("string"), salt=seed * 1000 + b)
            .bitwiseAND(F.lit(1)) == 1,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))

    bucket = None
    for b in range(n_bits):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1), _weights(b)),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        term = F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("int")


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    n_bits: int = 8,
    seed: int = 7,
    max_bucket: int | None = None,
    fanout: int = 32,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's hyperplane
    bucket (equi-join on the sketch — prunes ~2^n_bits× of the pair space),
    then exact cosine rank within candidates via the bounded two-phase
    :func:`bounded_topk`. Recall trades off with n_bits; multi-probe =
    union over several seeds.

    ``max_bucket`` is the skew guard (mirrors dedup.lsh_candidate_pairs):
    a degenerate bucket capturing a constant-ish region of the embedding
    space would otherwise re-create the quadratic blowup the sketch exists
    to avoid; corpus rows in over-full buckets are dropped from the
    candidate side (callers should log the drop).

    Measured recall@5 at n_bits=4 (gates in test_ann_recall.py): 0.62 on
    clustered data (20 planted clusters, dim 32), 0.10 on structure-less
    random vectors — the theoretical worst case (neighbours at cos≈0.3
    collide per bit with p≈0.6). Single-table is the cheap/low dial; use
    :func:`lsh_ann_topk_multiprobe` when recall matters."""
    qb = queries.withColumn("__bkt", hyperplane_bucket(F.col(q_vec), n_bits, seed))
    cb = corpus.withColumn("__bkt", hyperplane_bucket(F.col(c_vec), n_bits, seed))
    if max_bucket is not None:
        sizes = cb.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__n"))
        cb = cb.join(
            F.broadcast(sizes.filter(F.col("__n") <= max_bucket).drop("__n")),
            "__bkt",
        )
    joined = qb.join(cb, "__bkt").filter(F.col(q_id) != F.col(c_id))
    sim = F.round(cosine(F.col(q_vec), F.col(c_vec)), 4)
    cand = joined.select(F.col(q_id), F.col(c_id), sim.alias("sim"))
    return bounded_topk(cand, q_id, c_id, k, fanout)


def lsh_ann_topk_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    n_bits: int = 4,
    seeds: tuple[int, ...] = (7, 8),
    max_bucket: int | None = None,
    fanout: int = 32,
) -> DataFrame:
    """Multi-probe ANN top-k: one hyperplane table per seed, candidates =
    the UNION of same-bucket pairs across tables (deduped), exact cosine
    rank via :func:`bounded_topk`. Single-table sign-bit LSH misses even
    high-cosine neighbours with probability (θ/π)·n_bits-ish; T independent
    tables drive the miss rate down exponentially at T× the candidate cost
    — the standard recall/cost dial for corpus-scale ANN.

    ``max_bucket`` drops over-full buckets per (table, bucket) — the same
    skew guard as :func:`lsh_ann_topk`.

    Measured recall@5 at n_bits=4 (gates in test_ann_recall.py), clustered
    / worst-case random data: 2 tables 0.89 / 0.27, 4 tables 0.99 / 0.45
    — each added table buys recall at linear candidate cost."""
    def _tables(df, id_col, vec_col):
        parts = [
            df.select(
                F.col(id_col),
                F.lit(t).alias("__band"),
                hyperplane_bucket(F.col(vec_col), n_bits, seed).alias("__bkt"),
            )
            for t, seed in enumerate(seeds)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    qt = _tables(queries, q_id, q_vec)
    ct = _tables(corpus, c_id, c_vec)
    if max_bucket is not None:
        sizes = ct.groupBy("__band", "__bkt").agg(F.count(F.lit(1)).alias("__n"))
        ct = ct.join(
            F.broadcast(sizes.filter(F.col("__n") <= max_bucket).drop("__n")),
            ["__band", "__bkt"],
        )
    cand_ids = (
        qt.join(ct, ["__band", "__bkt"])
        .filter(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id)
        .distinct()   # a pair colliding in several tables scores once
    )
    sim = F.round(cosine(F.col(q_vec), F.col(c_vec)), 4)
    # Candidate-vector resolution must NOT broadcast the corpus: at corpus
    # scale the full (c_id, c_vec) relation never fits an executor, while the
    # candidate-id set is near-linear (bounded by max_bucket × tables). A
    # shuffle hash join keyed on c_id ships only the candidate sliver of the
    # corpus to each reducer; the hint pins the plan so AQE can't "helpfully"
    # re-broadcast at test scale and mask the production shape.
    cand = (
        cand_ids.join(queries.select(q_id, q_vec), q_id)
        .join(corpus.select(c_id, c_vec).hint("shuffle_hash"), c_id)
        .select(F.col(q_id), F.col(c_id), sim.alias("sim"))
    )
    return bounded_topk(cand, q_id, c_id, k, fanout)


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    seed: int = 11,
    max_cell: int | None = None,
    fanout: int = 32,
) -> DataFrame:
    """IVF-flat ANN top-k (the inverted-file alternative to the hyperplane
    sketch): a deterministic coarse quantizer — ``n_centroids`` corpus
    vectors picked by smallest portable hash of their id, the
    random-sampling centroid init every IVF build starts from — assigns
    each corpus row to its best cell (one broadcast of the tiny centroid
    set + one combinable ``max_by`` aggregate, O(N·C) work, no shuffle of
    the corpus); a query probes its ``n_probe`` nearest cells and ranks
    exact cosine only within them via the bounded two-phase
    :func:`bounded_topk`.

    Scale shape: centroid selection is a top-C reduction (C is fixed and
    tiny), assignment is per-row, the probe join is an equi-join on the
    cell id, and ``max_cell`` guards a degenerate cell exactly like
    ``max_bucket`` does for LSH. Recall dials: ``n_probe`` (cells per
    query) and ``n_centroids`` (cell granularity — grow it with corpus
    size, √N is the usual rule). All arithmetic is rounded (4 dp) with id
    tie-breaks, so a DuckDB oracle reproduces cells, probes and ranking
    exactly.

    Measured recall@5 at n_centroids=16 (gates in test_ann_recall.py):
    clustered data 0.83 / 0.95 / 1.00 at n_probe 1 / 2 / 4; worst-case
    random vectors 0.27 / 0.51 / 1.00 at n_probe 1 / 4 / 16 — probing
    every cell is exact by construction."""
    h = portable_hash60(F.col(c_id).cast("string"), salt=seed)
    centroids = (
        corpus.select(F.col(c_id), F.col(c_vec), h.alias("__h"))
        .orderBy(F.col("__h").asc(), F.col(c_id).asc())
        .limit(n_centroids)
        .select(F.col(c_id).alias("__cent_id"), F.col(c_vec).alias("__cent_vec"))
        # materialized once: the selection (corpus scan + top-C) feeds BOTH
        # the assignment and the probe subplans — without this each re-runs it
        .localCheckpoint(eager=True)
    )
    csim = F.round(cosine(F.col(c_vec), F.col("__cent_vec")), 4)
    assign = (
        corpus.crossJoin(F.broadcast(centroids))
        .select(F.col(c_id), F.col(c_vec), F.col("__cent_id"), csim.alias("__s"))
        .groupBy(c_id)
        .agg(
            # min over (-sim, cent_id) = max sim with ascending-id tiebreak;
            # min_by keeps the id un-negated so string centroid ids work
            # (every sibling LSH operator supports them)
            F.min_by(
                F.col("__cent_id"),
                F.struct((-F.col("__s")).alias("__ns"), F.col("__cent_id")),
            ).alias("__cell"),
            F.any_value(F.col(c_vec)).alias(c_vec),
        )
    )
    if max_cell is not None:
        sizes = assign.groupBy("__cell").agg(F.count(F.lit(1)).alias("__n"))
        assign = assign.join(
            F.broadcast(sizes.filter(F.col("__n") <= max_cell).drop("__n")),
            "__cell",
        )
    from pyspark.sql.window import Window

    qsim = F.round(cosine(F.col(q_vec), F.col("__cent_vec")), 4)
    # top-n_probe cells per query: the window partition holds exactly
    # n_centroids rows per query (C is a fixed constant), never corpus-sized
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(F.col(q_id), F.col(q_vec), F.col("__cent_id"), qsim.alias("__s"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(q_id).orderBy(
                    F.col("__s").desc(), F.col("__cent_id").asc()
                )
            ),
        )
        .filter(F.col("__rn") <= n_probe)
        .select(F.col(q_id), F.col(q_vec), F.col("__cent_id").alias("__cell"))
    )
    joined = probes.join(assign, "__cell").filter(F.col(q_id) != F.col(c_id))
    sim = F.round(cosine(F.col(q_vec), F.col(c_vec)), 4)
    cand = joined.select(F.col(q_id), F.col(c_id), sim.alias("sim"))
    return bounded_topk(cand, q_id, c_id, k, fanout)


def kmeans_spherical(
    points: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "c_id",
    vec_col: str = "c_vec",
    seed: int = 23,
    telemetry: list | None = None,
) -> DataFrame:
    """Spherical k-means (Lloyd's on cosine similarity) over an embedding
    column — the corpus-clustering step of a training-data pipeline
    (domain discovery, cluster-balanced mixing, IVF index builds).
    Deterministic end to end, so a SQL oracle replays it exactly:

    - **init** = the ``k`` vectors with the smallest portable hash of
      their id (the random-sample init every k-means build starts from,
      made replay-stable); the seed row's id IS its cluster id;
    - **assignment** = argmax cosine (rounded 4 dp, ascending-cluster-id
      tiebreak) against the broadcast centroid set;
    - **update** = element-wise mean of member vectors, rounded 6 dp so
      the next round's similarities are bit-identical in any engine
      (cosine normalizes, so the mean needs no re-normalization). A
      cluster that loses every member drops out — deterministically in
      both engines.

    Scale shape per iteration: one broadcast of k·dim doubles, a
    corpus × k crossJoin reduced by a combinable ``min_by`` argmax (per-row
    work — the corpus is never shuffled), and a (cluster, dim)-keyed
    average whose group count is the constant k·dim (``posexplode`` →
    partial-aggregating ``avg`` → re-assembled array). Centroids are
    ``localCheckpoint``-ed per round: k rows, cuts the re-execution
    lineage that would otherwise re-run every prior round per subplan.

    Returns one row per point: ``(id_col, cluster, sim)`` for the final
    assignment.

    ``telemetry`` (a list) collects one dict per centroid UPDATE —
    ``{"iter", "clusters", "dropped", "max_movement"}`` where
    ``max_movement`` is the largest per-dimension centroid shift of the
    round — so a curation user can SEE non-convergence (movement not
    shrinking) or cluster collapse (dropped > 0) instead of trusting a
    fixed ``iters``. Collecting it costs one k-row collect per round
    against the already-checkpointed centroid set (control-plane-sized:
    k·dim doubles)."""
    pts = points.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    h = portable_hash60(F.col(id_col).cast("string"), salt=seed)
    rnd6 = lambda x: F.round(x, 6)  # noqa: E731 — one-arg HOF closure
    cents = (
        pts.select(F.col(id_col).alias("__cl"), F.col("__v"), h.alias("__h"))
        .orderBy(F.col("__h").asc(), F.col("__cl").asc())
        .limit(k)
        .select("__cl", F.transform("__v", rnd6).alias("__cv"))
        .localCheckpoint(eager=True)
    )
    assign = None
    for it in range(iters):
        sim = F.round(cosine(F.col("__v"), F.col("__cv")), 4)
        assign = (
            pts.crossJoin(F.broadcast(cents))
            .select(F.col(id_col), F.col("__v"), F.col("__cl"), sim.alias("__s"))
            .groupBy(id_col)
            .agg(
                # min over (-sim, cl) = max sim, ascending-cluster tiebreak
                F.min_by(
                    F.col("__cl"),
                    F.struct((-F.col("__s")).alias("__ns"), F.col("__cl")),
                ).alias("cluster"),
                F.max("__s").alias("sim"),  # ties share the same sim
                F.any_value("__v").alias("__v"),
            )
        )
        if it < iters - 1:
            new_cents = (
                assign.select("cluster", F.posexplode("__v").alias("__d", "__x"))
                .groupBy("cluster", "__d")
                .agg(rnd6(F.avg("__x")).alias("__m"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("__d", "__m"))).alias("__p"))
                .select(
                    F.col("cluster").alias("__cl"),
                    F.transform("__p", lambda s: s["__m"]).alias("__cv"),
                )
                .localCheckpoint(eager=True)
            )
            if telemetry is not None:
                old = {r["__cl"]: r["__cv"] for r in cents.collect()}
                new = {r["__cl"]: r["__cv"] for r in new_cents.collect()}
                moved = [
                    max((abs(a - b) for a, b in zip(old[cl], vec)),
                        default=0.0)
                    for cl, vec in new.items() if cl in old
                ]
                telemetry.append({
                    "iter": it,
                    "clusters": len(new),
                    "dropped": len(old) - len(new),
                    "max_movement": max(moved, default=0.0),
                })
            cents = new_cents
    return assign.select(F.col(id_col), F.col("cluster"), F.col("sim"))
