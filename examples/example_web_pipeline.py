"""The full modern web-corpus curation pipeline (beyond-reference),
stage by stage, in the order production pipelines run them:

    1. boilerplate removal   (CCNet / RefinedWeb line dedup —
                              corpus-frequent units stripped in place)
    2. Gopher quality gate   (Rae et al. 2021 Table A1, integer-exact)
    3. exact + near dedup    (fingerprint min-by, then MinHash-LSH)
    4. per-source mix stats

Every stage is DataFrame-native: the boilerplate detector shuffles
md5 digests only and rewrites map-side against a one-row broadcast
set; the Gopher gate is a single codegen'd projection; dedup is one
aggregation per tier. Document text never crosses a shuffle outside
the near-dup verify joins.

For a CONTINUOUS crawl, stage 1 runs as the streaming frequency fold
(streaming/boilerplate_incremental): the live boilerplate set tracks
re-crawls and deletes, and remove_boilerplate_with_set strips each
batch against it without recounting the corpus — see
example_live_index.py for the shared changelog-fold mechanics.
"""

import os

from pyspark.sql import functions as F

from kspp_spark.functions.dedup import minhash_candidates, minhash_signatures
from kspp_spark.functions.text import (
    doc_fingerprint,
    gopher_counters,
    gopher_keep,
    remove_boilerplate,
)
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_web_pipeline")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. boilerplate removal: units repeating across >= 3 docs vanish
    #    (10-token windows here; real web text passes
    #    split_pattern='\\n' to strip shared footers/banners per line)
    cleaned = remove_boilerplate(docs, min_docs=3, n_tokens=10).join(
        docs.select("doc_id", "lang", "source"), "doc_id"
    )
    n_rewritten = cleaned.filter("n_kept < n_units").count()

    # 2. Gopher gate over the CLEANED text (corpus-matched lexicon)
    c = gopher_counters("clean_text", stopwords=["the", "a", "of", "and", "to"])
    gated = cleaned.filter(gopher_keep(c))
    n1 = gated.count()

    # 3a. exact dedup: lowest doc_id survives per content fingerprint
    survivors = (
        gated.groupBy(doc_fingerprint("clean_text").alias("_fp"))
        .agg(F.min_by(F.struct("doc_id", "clean_text", "source"), "doc_id").alias("_k"))
        .select("_k.doc_id", "_k.clean_text", "_k.source")
    )
    n2 = survivors.count()

    # 3b. near dedup: MinHash-LSH candidate pairs over the survivors
    #     (banded signatures — never a corpus self-join)
    sigs = minhash_signatures(survivors, text="clean_text", id_col="doc_id")
    cands = minhash_candidates(sigs, id_col="doc_id")
    n_near = cands.count()

    # 4. training-mix stats per source
    print(f"input {n0} | boilerplate-rewritten {n_rewritten} | ")
    print(f"gopher-kept {n1} | exact-unique {n2} | near-dup pairs {n_near}")
    survivors.groupBy("source").count().orderBy("source").show()
    spark.stop()


if __name__ == "__main__":
    main()
