from kspp_spark.functions.text import (
    bpe_token_estimate,
    doc_fingerprint,
    language_id,
    quality_metrics,
    repetition_stats,
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
from kspp_spark.functions.packing import pack_sequences, pack_stats
from kspp_spark.functions.sampling import (
    hash_bucket,
    sample_fraction,
    split_assign,
    stratified_sample,
    topk_per_stratum,
)

__all__ = [
    "bpe_token_estimate",
    "doc_fingerprint",
    "language_id",
    "quality_metrics",
    "repetition_stats",
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
    "pack_sequences",
    "pack_stats",
    "hash_bucket",
    "sample_fraction",
    "split_assign",
    "stratified_sample",
    "topk_per_stratum",
]
