from etl_spark.operators.dedup import (
    eval_contamination,
    exact_dedup_groups,
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
from etl_spark.operators.reshape import (
    group_nest_sorted,
    melt,
    pack_budget,
    param_fanout,
)
from etl_spark.operators.sampling import (
    hash_permille,
    hash_sample,
    hash_split,
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
    "group_nest_sorted", "melt", "pack_budget", "param_fanout",
    "eval_contamination", "exact_dedup_groups", "lsh_buckets", "lsh_candidate_pairs",
    "minhash_signature", "ngram_jaccard_pairs", "simhash", "simhash_groups",
    "bounded_topk", "brute_force_topk", "cosine", "hyperplane_bucket", "lsh_ann_topk",
    "hash_permille", "hash_sample", "hash_split", "stratified_sample",
]
