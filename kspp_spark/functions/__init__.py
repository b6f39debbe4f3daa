from kspp_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_metrics,
    token_count,
    tokenize,
)
from kspp_spark.functions.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from kspp_spark.functions.similarity import cosine_topk, ivf_ann_topk, lsh_ann_topk
from kspp_spark.functions.pipeline import curate_documents
from kspp_spark.functions.text import bpe_token_estimate

__all__ = [
    "doc_fingerprint",
    "language_id",
    "quality_metrics",
    "token_count",
    "tokenize",
    "embedding_dup_pairs",
    "exact_dedup",
    "minhash_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "ivf_ann_topk",
    "lsh_ann_topk",
    "curate_documents",
    "bpe_token_estimate",
]
