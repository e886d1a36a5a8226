from arachne_spark.functions.dedup import (
    exact_dup_groups,
    expand_pairs_to_cliques,
    minhash_bands,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from arachne_spark.functions.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_assign,
    ivf_topk,
    kmeans_fit,
)
from arachne_spark.functions.text import (
    langid,
    quality_features,
    token_counts,
    fingerprint,
)

__all__ = [
    "exact_dup_groups",
    "expand_pairs_to_cliques",
    "minhash_bands",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_neardup_pairs",
    "cosine_neardup_pairs",
    "cosine_topk",
    "ivf_assign",
    "ivf_topk",
    "kmeans_fit",
    "langid",
    "quality_features",
    "token_counts",
    "fingerprint",
]
