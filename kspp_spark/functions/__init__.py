from kspp_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_metrics,
    token_count,
    tokenize,
)
from kspp_spark.functions.dedup import (
    exact_dedup,
    minhash_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from kspp_spark.functions.similarity import cosine_topk, lsh_ann_topk

__all__ = [
    "doc_fingerprint",
    "language_id",
    "quality_metrics",
    "token_count",
    "tokenize",
    "exact_dedup",
    "minhash_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "lsh_ann_topk",
]
