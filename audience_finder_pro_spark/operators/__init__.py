"""Composite operators the engine adds on top of raw pyspark.sql.

Each is a plan *fragment builder*: DataFrame in → DataFrame out, fully
declarative so Catalyst can optimize across the boundary.
"""

from audience_finder_pro_spark.operators.keyword_match import (
    keyword_theta_join,
    first_match_wins,
    all_matches_agg,
)
from audience_finder_pro_spark.operators.topk import top_k_per_group
from audience_finder_pro_spark.operators.asof import asof_join, range_join
from audience_finder_pro_spark.operators.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_buckets,
    simhash_candidate_pairs,
)
from audience_finder_pro_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    ivf_build_index,
    ivf_probe_indexed,
    ivf_topk,
    lsh_bucketed_topk,
)
from audience_finder_pro_spark.operators.sessionize import sessionize
from audience_finder_pro_spark.operators.skew import salted_agg
from audience_finder_pro_spark.operators.keyword_match import (
    all_matches_expr,
    first_match_expr,
)
from audience_finder_pro_spark.operators.dedup import minhash_signatures
from audience_finder_pro_spark.operators.graph import connected_components, dedup_clusters
from audience_finder_pro_spark.operators.sampling import (
    hash_bucket,
    hash_split,
    mixture_sample,
)
from audience_finder_pro_spark.operators.packing import (
    pack_sequences,
    pack_sequences_tight,
)
from audience_finder_pro_spark.operators.decontaminate import (
    exact_decontaminate,
    ngram_contamination,
    ngram_decontaminate,
)

__all__ = [
    "keyword_theta_join",
    "first_match_wins",
    "all_matches_agg",
    "top_k_per_group",
    "asof_join",
    "range_join",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_buckets",
    "simhash_candidate_pairs",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "sessionize",
    "salted_agg",
    "all_matches_expr",
    "first_match_expr",
    "minhash_signatures",
    "cosine_neardup_pairs",
    "ivf_topk",
    "connected_components",
    "dedup_clusters",
    "hash_bucket",
    "hash_split",
    "mixture_sample",
    "pack_sequences",
    "pack_sequences_tight",
    "exact_decontaminate",
    "ngram_contamination",
    "ngram_decontaminate",
    "ivf_build_index",
    "ivf_probe_indexed",
]
