"""Round-10 curation tier end to end (beyond-reference): Unicode NFC
canonicalization -> intra-document paragraph dedup -> Wilson-bound
per-source quality ranking -> Count-Min token-frequency sketch with
one-sided estimates — the normalize/clean/rank/count spine a corpus
builder runs before the heavy dedup passes.
"""

import os

from pyspark.sql import functions as F

from kspp_spark.functions.dedup import dedup_paragraphs
from kspp_spark.functions.sketch import cms_build, cms_estimate
from kspp_spark.functions.text import (
    normalize_unicode,
    token_count,
    tokenize,
    wilson_lower_bound,
)
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_quality_rank")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. canonicalize (Arrow-batched unicodedata; map-only)
    norm = docs.select(
        "doc_id",
        "source",
        normalize_unicode(F.col("text")).alias("text"),
    )

    # 2. intra-document paragraph dedup (map-only JVM HOF)
    deduped = dedup_paragraphs(norm.select("doc_id", "text")).join(
        norm.select("doc_id", "source"), "doc_id"
    )
    deduped.select("doc_id", "n_units", "n_kept").show(5)

    # 3. Wilson-bound source ranking (one agg + scalar projection)
    ranked = (
        deduped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(token_count("text") >= 40, 1).otherwise(0)
            ).alias("n_pass"),
        )
        .select(
            "source",
            "n_docs",
            "n_pass",
            wilson_lower_bound(F.col("n_pass"), F.col("n_docs")).alias(
                "wilson_lb"
            ),
        )
        .orderBy(F.col("wilson_lb").desc())
    )
    ranked.show(10)

    # 4. bounded-state token counting: sketch + one-sided estimates
    toks = deduped.select(F.explode(tokenize("text")).alias("term"))
    sketch = cms_build(toks, col="term", width=64, depth=3)
    est = cms_estimate(
        sketch, toks.distinct(), col="term", width=64, depth=3
    )
    top = est.orderBy(F.col("est").desc()).limit(5).collect()
    print("top estimated terms:", [(r["term"], r["est"]) for r in top])
    spark.stop()


if __name__ == "__main__":
    main()
