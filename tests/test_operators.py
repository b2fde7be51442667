"""M2/M7 operator tests: joins (broadcast / range / as-of / anti-fill),
reshape (melt / group-nest / fan-out), dedup suite, similarity search."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_spark.operators import (
    anti_join_fill,
    asof_join,
    broadcast_lookup,
    brute_force_topk,
    exact_dedup_groups,
    group_nest_sorted,
    lsh_ann_topk,
    lsh_buckets,
    lsh_candidate_pairs,
    melt,
    minhash_signature,
    ngram_jaccard_pairs,
    param_fanout,
    range_join,
    simhash_groups,
)


def test_broadcast_lookup_plan_is_broadcast(spark):
    fact = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("k"))
    dim = spark.createDataFrame([(i, f"n{i}") for i in range(5)], ["k", "name"])
    out = broadcast_lookup(fact, dim, "k")
    assert out.count() == 100
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_range_join_period_lookup(spark):
    periods = spark.createDataFrame(
        [(dt.date(2024, 1, 1), dt.date(2024, 1, 31), "2024.M1"),
         (dt.date(2024, 2, 1), dt.date(2024, 2, 29), "2024.M2")],
        ["start", "end", "period"],
    )
    facts = spark.createDataFrame(
        [(1, dt.date(2024, 1, 15)), (2, dt.date(2024, 2, 29)), (3, dt.date(2024, 3, 1))],
        ["id", "d"],
    )
    out = range_join(facts, periods, F.col("d"), F.col("start"), F.col("end"))
    got = {r["id"]: r["period"] for r in out.collect()}
    assert got == {1: "2024.M1", 2: "2024.M2", 3: None}


def test_asof_join_backward(spark):
    rules = spark.createDataFrame(
        [("ind", dt.date(2020, 1, 1), "v1"), ("ind", dt.date(2022, 1, 1), "v2")],
        ["name", "valid_from", "rule"],
    )
    facts = spark.createDataFrame(
        [(1, "ind", dt.date(2021, 6, 1)), (2, "ind", dt.date(2023, 1, 1)),
         (3, "ind", dt.date(2019, 1, 1))],
        ["id", "name", "d"],
    )
    out = asof_join(facts, rules, ["name"], ["name"], "d", "valid_from")
    got = {r["id"]: r["rule"] for r in out.collect()}
    assert got == {1: "v1", 2: "v2", 3: None}


def test_anti_join_fill(spark):
    keys = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    detail = spark.createDataFrame([(1, "a"), (3, "c")], ["k", "v"])
    out = anti_join_fill(keys, detail, ["k"]).orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "a"), (2, None), (3, "c")]


def test_melt(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0)], ["id", "m1", "m2"])
    out = melt(df, ["id"], var_name="metric", value_name="qty").orderBy("metric")
    assert [(r["metric"], r["qty"]) for r in out.collect()] == [("m1", 10.0), ("m2", 20.0)]


def test_group_nest_sorted(spark):
    df = spark.createDataFrame(
        [("e1", "TUE", "8-12"), ("e1", "MON", "8-12"), ("e2", "MON", "9-17")],
        ["est", "day", "hours"],
    )
    out = {r["est"]: r["nested"]
           for r in group_nest_sorted(df, ["est"], ("day", "hours")).collect()}
    assert out == {"e1": "MON:8-12;TUE:8-12", "e2": "MON:9-17"}


def test_param_fanout(spark):
    out = param_fanout(spark, uf=["SP", "RJ"], month=[1, 2, 3])
    assert out.count() == 6
    assert set(out.columns) == {"uf", "month"}


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], ["doc_id", "text"]
    )
    out = {r["canonical_id"]: r["n_members"]
           for r in exact_dedup_groups(df, "doc_id", "text").collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely different words here now")],
        ["doc_id", "text"],
    )
    sig = minhash_signature(docs, "text", num_hashes=16, shingle_k=2)
    pairs = lsh_candidate_pairs(lsh_buckets(sig, "doc_id", bands=8, rows_per_band=2), "doc_id")
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) not in got

    jac = ngram_jaccard_pairs(docs, pairs, "doc_id", "text", shingle_k=2)
    row = [r for r in jac.collect() if (r["a"], r["b"]) == (1, 2)][0]
    assert row["jaccard"] > 0.5


def test_simhash_groups(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c"), (3, "z q w")], ["doc_id", "text"])
    out = simhash_groups(df, "doc_id", "text").collect()
    by_canon = {r["canonical_id"]: r["n_members"] for r in out}
    assert by_canon[1] == 2


def _vec_df(spark, name_id, name_vec, rows):
    return spark.createDataFrame(rows, [name_id, name_vec])


def test_brute_force_topk(spark):
    corpus = _vec_df(spark, "c_id", "c_vec", [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]),
    ])
    queries = _vec_df(spark, "q_id", "q_vec", [(10, [1.0, 0.0])])
    out = brute_force_topk(queries, corpus, k=2, exclude_self=False).collect()
    assert [(r["c_id"], r["rank"]) for r in out] == [(1, 1), (2, 2)]
    assert out[0]["sim"] == pytest.approx(1.0)


def test_lsh_ann_matches_brute_force_mostly(spark):
    import random

    rnd = random.Random(5)
    corpus = _vec_df(
        spark, "c_id", "c_vec",
        [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(60)],
    )
    queries = corpus.selectExpr("c_id as q_id", "c_vec as q_vec").limit(5)
    ann = lsh_ann_topk(queries, corpus, k=3, n_bits=2)
    # sanity: every result is a valid corpus id, ranked 1..k, not self
    rows = ann.collect()
    assert rows and all(1 <= r["rank"] <= 3 and r["q_id"] != r["c_id"] for r in rows)


def test_connected_components(spark):
    from etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)], ["a", "b"]
    )
    got = {r["node"]: r["component"]
           for r in connected_components(pairs).collect()}
    # {1,2,3,8,9} all collapse to 1; {5,6} to 5
    assert got == {1: 1, 2: 1, 3: 1, 8: 1, 9: 1, 5: 5, 6: 5}


def test_asof_join_plan_has_no_fact_side_aggregate(spark):
    """Scale shape of the as-of join: the fact table is never shuffled,
    aggregated or windowed — the only aggregate in the plan builds the
    (broadcast) per-key version arrays on the dim side, i.e. it appears
    BELOW the broadcast join in the plan tree, never above it."""
    import datetime as dt

    from etl_spark.operators import asof_join

    fact = spark.range(0, 1000).select(
        F.col("id").alias("fid"), (F.col("id") % 5).alias("k"),
        F.timestamp_add("DAY", (F.col("id") % 90).cast("int"),
                        F.to_timestamp(F.lit("2024-01-01"))).alias("ft"),
    )
    dim = spark.range(0, 50).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("rule"),
        F.timestamp_add("DAY", (F.col("id") * 2).cast("int"),
                        F.to_timestamp(F.lit("2024-01-01"))).alias("vfrom"),
    )
    out = asof_join(fact, dim, ["k"], ["k"], "ft", "vfrom")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    head = plan.split("BroadcastHashJoin")[0]
    assert "Aggregate" not in head and "Window" not in head

    # semantics: greatest vfrom <= ft per key. fid=7 => k=2, ft=2024-01-08;
    # k=2 versions start at +2*id days (id=2,7,12,...) => winner id=2
    # (vfrom 2024-01-05; the next, id=7, starts 2024-01-15 > ft)
    row = out.filter(F.col("fid") == 7).collect()[0]
    assert row["rule"] == 2
    assert row["vfrom"] == dt.datetime(2024, 1, 5)


def test_multiprobe_resolves_vectors_without_corpus_broadcast(spark):
    """Regression pin for the corpus-scale contract: multiprobe ANN must
    resolve candidate corpus vectors with a SHUFFLED hash join on c_id —
    never by broadcasting the full corpus-vector relation (which cannot
    fit an executor at the scale the operator targets)."""
    from pyspark.sql import functions as F

    from etl_spark.operators.similarity import lsh_ann_topk_multiprobe

    e = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (d + 3)).cast("float") for d in range(8)])
        .alias("embedding"),
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    df = lsh_ann_topk_multiprobe(queries, corpus, k=3, n_bits=4, seeds=(7, 8))
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "ShuffledHashJoin [c_id" in plan, plan[:2000]


# ------------------------------------------------------- sampling / splits

def test_hash_sample_deterministic_and_unbiased(spark):
    from etl_spark.operators import hash_sample

    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    a = hash_sample(df, "doc_id", 300)
    b = hash_sample(df, "doc_id", 300)
    ra = sorted(r["doc_id"] for r in a.collect())
    assert ra == sorted(r["doc_id"] for r in b.collect())  # replay-stable
    assert 0.25 < len(ra) / 4000 < 0.35  # ~30% within tolerance
    # a lower rate selects a strict subset (threshold semantics)
    sub = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 100).collect())
    assert set(sub) <= set(ra)


def test_stratified_sample_rates_and_default(spark):
    from etl_spark.operators import stratified_sample

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "zh")
        .otherwise("sw").alias("lang"),
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 200, "zh": 500})
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.13 < got["en"] / 1000 < 0.27
    assert 0.42 < got["zh"] / 1000 < 0.58
    assert got["sw"] == 1000  # default keeps everything


def test_hash_split_total_and_disjoint(spark):
    from etl_spark.operators import hash_split

    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    out = hash_split(df, "doc_id", [("train", 800), ("val", 100), ("test", 100)])
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 5000  # total assignment, no row dropped
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.07 < counts["val"] / 5000 < 0.13
    assert 0.07 < counts["test"] / 5000 < 0.13
    # independent of the sampling draw: correlation between "sampled" and
    # "test" membership stays near the product of their rates
    from etl_spark.operators import hash_sample

    sampled_test = hash_sample(
        out.filter(F.col("split") == "test"), "doc_id", 300
    ).count()
    assert 0.2 < sampled_test / counts["test"] < 0.4


def test_hash_split_rejects_bad_weights(spark):
    from etl_spark.operators import hash_split

    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", [("a", 500), ("b", 400)])


# --------------------------------------------- decontamination / packing

def test_eval_contamination_flags_shared_shingles(spark):
    from etl_spark.operators.dedup import eval_contamination

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different words here nothing shared at all"),
         (3, "quick brown fox appears in this one too")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "watch the quick brown fox jumps today")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["n_hits"] for r in
           eval_contamination(train, ev, "doc_id", "text").collect()}
    # doc 1 shares "the quick brown", "quick brown fox", "brown fox jumps";
    # doc 3 shares "quick brown fox"; doc 2 is clean (absent)
    assert got == {1: 3, 3: 1}


def test_pack_budget_contract(spark):
    from etl_spark.operators.reshape import pack_budget

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 * 100 + 50).alias("sz"),
    )
    out = pack_budget(df, "doc_id", "sz", budget=1000, n_buckets=4).collect()
    by_bucket: dict = {}
    for r in sorted(out, key=lambda r: (r["pack_bucket"], r["doc_id"])):
        by_bucket.setdefault(r["pack_bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for rows in by_bucket.values():
        cum = 0
        shards = []
        for r in rows:
            assert r["pack_shard"] == cum // 1000  # greedy cut by cum-before
            cum += r["sz"]
            shards.append(r["pack_shard"])
        # shards are non-decreasing and start at 0
        assert shards[0] == 0 and shards == sorted(shards)
        # cumulative contract: shards 0..s together hold >= (s+1)*budget
        # for every non-final shard s (a shard may undershoot only because
        # its predecessor overshot past the boundary)
        import collections

        sums = collections.Counter()
        for r in rows:
            sums[r["pack_shard"]] += r["sz"]
        last = max(sums)
        running = 0
        for s in sorted(sums):
            running += sums[s]
            if s != last:
                assert running >= 1000 * (s + 1)


# ------------------------------------------- repetition / incremental dedup

def test_repetition_signals_known_values(spark):
    from etl_spark.operators.quality import repetition_signals

    df = spark.createDataFrame(
        [
            # 4 lines, "dup dup" twice -> dup_line_frac 0.5; dup chars
            # 14 of 21; 7 tokens -> 6 bigrams, top (dup,dup) x2 -> 2/6
            (1, "dup dup\nab cd\ndup dup\nxy"),
            (2, "one two three four five six"),  # all-distinct bigrams
            (3, ""),                        # empty doc: zeros, keep
            (4, "go go go go go go"),       # one bigram repeated 5x
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in
           repetition_signals(df, "doc_id", "text").collect()}
    r1 = got[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac"] == 0.25  # 4 lines, 3 distinct
    assert r1["dup_line_char_frac"] == round(14 / 21, 6)
    assert r1["top_bigram_frac"] == round(2 / 6, 6)
    r2 = got[2]
    # 5 distinct bigrams -> top occupancy 1/5, exactly at the 0.20 gate
    assert (r2["dup_line_frac"], r2["top_bigram_frac"]) == (0.0, 0.2)
    assert r2["keep"] is True
    r3 = got[3]
    assert (r3["n_lines"], r3["dup_line_frac"], r3["keep"]) == (0, 0.0, True)
    r4 = got[4]
    assert r4["top_bigram_frac"] == 1.0 and r4["keep"] is False


def test_incremental_lsh_matches_batch_vs_corpus(spark):
    from etl_spark.operators.dedup import incremental_lsh_matches

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the wide open field all day")
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tonight"),   # near-dups of each other
         (3, "completely different content with no shared shingles here "
             "at all in any window of three words")],
        ["doc_id", "text"],
    )
    sig = minhash_signature(docs, "text", num_hashes=16, shingle_k=3)
    buckets = lsh_buckets(sig, "doc_id", bands=4, rows_per_band=4)
    newb = buckets.filter(F.col("doc_id") == 2)
    corpus = buckets.filter(F.col("doc_id") != 2)
    got = incremental_lsh_matches(newb, corpus, "doc_id").collect()
    assert {(r["new_id"], r["dup_id"]) for r in got} == {(2, 1)}

    # max_bucket guard: cap of 1 excludes every corpus bucket with >1 member
    # (here all corpus buckets have 1 member, so the match survives); cap 0
    # excludes everything
    none = incremental_lsh_matches(newb, corpus, "doc_id", max_bucket=0)
    assert none.count() == 0


# ----------------------------------------------- salient terms / mix sample

def test_topk_salient_terms_ranking(spark):
    from etl_spark.operators.quality import topk_salient_terms

    df = spark.createDataFrame(
        [(1, "apple apple banana cherry"), (2, "banana cherry cherry date")],
        ["doc_id", "text"],
    )
    out = topk_salient_terms(df, "doc_id", "text", k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["doc_freq"])
           for r in out}
    # d1: apple wins on tf; banana beats cherry on term asc (doc_freq tied)
    assert got[(1, 1)] == ("apple", 2, 1)
    assert got[(1, 2)] == ("banana", 1, 2)
    # d2: cherry wins on tf; date (doc_freq 1) beats banana (doc_freq 2)
    assert got[(2, 1)] == ("cherry", 2, 2)
    assert got[(2, 2)] == ("date", 1, 1)
    import math
    apple = [r for r in out if r["term"] == "apple"][0]
    assert apple["score"] == round(2 * math.log(2 / 1), 4)


def test_mix_rates_permille():
    from etl_spark.operators.sampling import mix_rates_permille

    # b is binding (50/0.5=100 < 100/0.5=200): keeps all; a halves
    assert mix_rates_permille({"a": 100, "b": 50}, {"a": 0.5, "b": 0.5}) \
        == {"a": 500, "b": 1000}
    # missing group in counts -> loud failure
    import pytest as _pytest
    with _pytest.raises(ValueError):
        mix_rates_permille({"a": 10}, {"a": 0.5, "zz": 0.5})


def test_mix_sample_deterministic_and_scoped(spark):
    from etl_spark.operators.sampling import mix_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "fr").otherwise("en").alias("lang"),
    )
    shares = {"en": 0.5, "fr": 0.5}
    a = {r["doc_id"] for r in
         mix_sample(df, "doc_id", "lang", shares).collect()}
    b = {r["doc_id"] for r in
         mix_sample(df, "doc_id", "lang", shares).collect()}
    assert a == b                       # replay-stable membership
    out = mix_sample(df, "doc_id", "lang", shares)
    by = {r["lang"]: r["n"] for r in
          out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # fr (250 rows) binds at share .5 -> keeps all; en downsamples to ~250
    assert by["fr"] == 250
    assert abs(by["en"] - 250) < 50     # hash-uniform within tolerance


def test_chunk_documents_windows(spark):
    from etl_spark.operators.reshape import chunk_documents

    words = " ".join(f"w{i}" for i in range(1, 11))  # 10 tokens
    df = spark.createDataFrame(
        [(1, words), (2, "a b"), (3, "")], ["doc_id", "text"])
    out = chunk_documents(df, "doc_id", "text", size=8, overlap=4).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 1,5 (step 4; start 9 would be wholly inside chunk 1's
    # coverage 5-10, so it is NOT emitted) -> chunks of 8 and 6 tokens
    c1 = sorted(by[1], key=lambda r: r["chunk_id"])
    assert [(r["chunk_id"], r["n_tokens"]) for r in c1] == [(0, 8), (1, 6)]
    assert c1[0]["chunk_text"].split() == [f"w{i}" for i in range(1, 9)]
    assert c1[1]["chunk_text"].split() == [f"w{i}" for i in range(5, 11)]
    # coverage reaches the last token with no pure-duplicate tail chunk
    assert c1[-1]["chunk_text"].split()[-1] == "w10"
    # short doc: one partial chunk; empty doc: none
    assert [(r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in by[2]] \
        == [(0, 2, "a b")]
    assert 3 not in by

    import pytest as _p
    with _p.raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=4, overlap=4)


def test_kmeans_spherical_contract(spark):
    # two well-separated groups on orthogonal axes: k=2 must split them
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        axis = i % 2
        v = [rng.uniform(0.8, 1.0) if d == axis else rng.uniform(0.0, 0.05)
             for d in range(8)]
        rows.append((i, v))
    from etl_spark.operators.similarity import kmeans_spherical

    df = spark.createDataFrame(rows, ["c_id", "c_vec"])
    out = kmeans_spherical(df, k=2, iters=3).collect()
    assert len(out) == 40                      # every point assigned once
    by_axis = {0: set(), 1: set()}
    for r in out:
        by_axis[r["c_id"] % 2].add(r["cluster"])
    # each geometric group lands in exactly one cluster, and they differ
    assert len(by_axis[0]) == 1 and len(by_axis[1]) == 1
    assert by_axis[0] != by_axis[1]
    assert all(r["sim"] > 0.9 for r in out)    # tight, well-separated groups
    # deterministic: a rerun yields the identical assignment
    again = kmeans_spherical(df, k=2, iters=3).collect()
    assert sorted((r["c_id"], r["cluster"]) for r in out) == \
        sorted((r["c_id"], r["cluster"]) for r in again)

    # convergence telemetry: one record per centroid update, movement
    # shrinking on well-separated groups, no cluster collapse
    telem = []
    kmeans_spherical(df, k=2, iters=3, telemetry=telem).collect()
    assert [t["iter"] for t in telem] == [0, 1]
    assert all(t["clusters"] == 2 and t["dropped"] == 0 for t in telem)
    assert telem[1]["max_movement"] <= telem[0]["max_movement"]
    assert telem[1]["max_movement"] < 0.05  # converged on this geometry


def test_scrub_pii_patterns(spark):
    from etl_spark.functions.pii import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex.org and 10.1.2.3 then 123456789 end"),
         (2, "no pii here"),
         (3, "x@y.io x@y.io 1.2.3.4 ip inside num 1234567890123456")],
        ["id", "t"],
    )
    got = {r["id"]: r for r in
           df.select("id", scrub_pii("t").alias("p")).select("id", "p.*").collect()}
    assert got[1]["clean"] == "mail <EMAIL> and <IP> then <NUM> end"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_longnum"]) == (1, 1, 1)
    assert got[2]["clean"] == "no pii here"
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_longnum"]) == (0, 0, 0)
    # two emails counted; the 16-digit run is a number, not an IP; and a
    # replaced <IP> token never merges with neighbours into a false <NUM>
    assert got[3]["clean"] == "<EMAIL> <EMAIL> <IP> ip inside num <NUM>"
    assert (got[3]["n_email"], got[3]["n_ipv4"], got[3]["n_longnum"]) == (2, 1, 1)
