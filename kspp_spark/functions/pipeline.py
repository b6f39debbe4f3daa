"""End-to-end training-data curation pipeline.

The composite shape every LLM-data pipeline runs over a 100 TB corpus:

    quality gate -> language gate -> exact dedup -> stats

All stages are single-pass Column expressions plus ONE hash shuffle
(the dedup window on the 128-bit fingerprint) — no Python per row, no
driver-side state. Near-dup removal (minhash/simhash/embedding) chains
after this via functions.dedup on the survivors.

Gates use integer comparisons (n*2 > m rather than ratios) so the
decision boundary is exact and engine-reproducible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

from kspp_spark.functions.text import (
    doc_fingerprint,
    language_id,
    token_count,
)


def curate_documents(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
) -> DataFrame:
    """Curated corpus: docs that pass token-length and alphabetic-
    density gates, in an accepted language, keeping the lowest id per
    exact-content fingerprint. Returns (id, lang_pred, n_tokens,
    n_chars, n_dups) for survivors."""
    t = F.col(text)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_chars = F.length(t)
    gated = (
        df.select(
            F.col(id_col),
            language_id(t).alias("lang_pred"),
            token_count(t).alias("n_tokens"),
            n_chars.alias("n_chars"),
            n_alpha.alias("n_alpha"),
            doc_fingerprint(t).alias("_fp"),
        )
        .filter(F.col("n_tokens") >= min_tokens)
        .filter(F.col("n_alpha") * 2 > F.col("n_chars"))  # >50% alphabetic
        .filter(F.col("lang_pred").isin(*langs))
    )
    # One aggregation, not a window: min_by keeps the lowest-id
    # survivor per fingerprint and count gives n_dups, with map-side
    # partial aggregation (a row_number window would force a full
    # post-shuffle sort and aggregate nothing early).
    agg = gated.groupBy("_fp").agg(
        F.min_by(
            F.struct(id_col, "lang_pred", "n_tokens", "n_chars"), F.col(id_col)
        ).alias("_keep"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    return agg.select(
        F.col(f"_keep.{id_col}").alias(id_col),
        F.col("_keep.lang_pred").alias("lang_pred"),
        F.col("_keep.n_tokens").alias("n_tokens"),
        F.col("_keep.n_chars").alias("n_chars"),
        "n_dups",
    )
