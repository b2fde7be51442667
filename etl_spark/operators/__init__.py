from etl_spark.operators.dedup import (
    eval_contamination,
    exact_dedup_groups,
    incremental_lsh_matches,
    lsh_buckets,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_groups,
)
from etl_spark.operators.joins import (
    anti_join_fill,
    asof_join,
    broadcast_lookup,
    period_lead,
    range_join,
)
from etl_spark.operators.quality import (
    repetition_signals,
    topk_salient_terms,
)
from etl_spark.operators.reshape import (
    chunk_documents,
    group_nest_sorted,
    melt,
    pack_budget,
    param_fanout,
)
from etl_spark.operators.sampling import (
    hash_permille,
    hash_sample,
    hash_split,
    mix_rates_permille,
    mix_sample,
    stratified_sample,
)
from etl_spark.operators.similarity import (
    bounded_topk,
    brute_force_topk,
    cosine,
    hyperplane_bucket,
    lsh_ann_topk,
)

__all__ = [
    "anti_join_fill", "asof_join", "broadcast_lookup", "period_lead", "range_join",
    "chunk_documents", "group_nest_sorted", "melt", "pack_budget", "param_fanout",
    "eval_contamination", "exact_dedup_groups", "incremental_lsh_matches",
    "lsh_buckets", "lsh_candidate_pairs",
    "minhash_signature", "ngram_jaccard_pairs", "simhash", "simhash_groups",
    "repetition_signals", "topk_salient_terms",
    "bounded_topk", "brute_force_topk", "cosine", "hyperplane_bucket", "lsh_ann_topk",
    "hash_permille", "hash_sample", "hash_split",
    "mix_rates_permille", "mix_sample", "stratified_sample",
]
