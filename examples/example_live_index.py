"""Continuously-maintained search index over a document CHANGELOG —
the retrieval analog of the reference's ktable materialization
(krecord tombstone rule, krecord.h:23-25; LWW, mem_store.h:64-83):

1. bootstrap the positional index + doc-length fold from an existing
   corpus (epoch=-1, one batch tokenize pass);
2. stream changelog batches on top — new docs append, re-emitted
   doc_ids SUPERSEDE their old postings, NULL-text tombstones DELETE;
3. serve phrase search and BM25 straight off the folded snapshots —
   the corpus is never re-tokenized at query time, and a deleted doc
   can never be returned;
4. compact the accumulated epochs into a fresh single-epoch state.
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from kspp_spark.functions.text import bm25_indexed, phrase_search_indexed
from kspp_spark.session import get_spark
from kspp_spark.streaming.index_incremental import (
    compact_index_state,
    doc_lengths_snapshot,
    index_bootstrap,
    positional_index_snapshot,
    positional_partials_batch,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_live_index")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    state = tempfile.mkdtemp(prefix="live_idx_")
    dlen = tempfile.mkdtemp(prefix="live_dlen_") + "/d"
    try:
        # 1. bootstrap from the existing corpus
        index_bootstrap(docs, state, positional=True, doclen_dir=dlen)

        # 2. one changelog batch: an update + a tombstone + an insert
        some_id = docs.agg(F.min("doc_id")).collect()[0][0]
        gone_id = docs.agg(F.max("doc_id")).collect()[0][0]
        changes = spark.createDataFrame(
            [
                (some_id, "completely rewritten document about spark scans"),
                (gone_id, None),  # tombstone: delete from the index
                (10_000_000, "brand new document spark scans arrive late"),
            ],
            "doc_id long, text string",
        )
        positional_partials_batch(changes, 0, state, doclen_dir=dlen)

        # 3. serve queries off the folded snapshots
        snap = positional_index_snapshot(spark, state)
        dl = doc_lengths_snapshot(spark, dlen)
        hits = phrase_search_indexed(snap, ["spark", "scans"]).collect()
        print(f"phrase 'spark scans': {sorted(r.doc_id for r in hits)}")
        assert {some_id, 10_000_000} <= {r.doc_id for r in hits}
        top = bm25_indexed(snap, dl, ["spark", "scans"], k=3).collect()
        print("bm25 top-3:", [(r.doc_id, round(r.score, 3)) for r in top])
        assert gone_id not in {r.doc_id for r in top}, "tombstoned doc served!"

        # 4. compact: superseded/deleted postings physically disappear
        compacted = tempfile.mkdtemp(prefix="live_idx_c_") + "/c"
        compact_index_state(spark, state, compacted)
        n_before = spark.read.parquet(state).count()
        n_after = spark.read.parquet(compacted).count()
        print(f"compaction: {n_before} partial rows -> {n_after}")
        assert n_after < n_before
        shutil.rmtree(os.path.dirname(compacted), ignore_errors=True)
    finally:
        shutil.rmtree(state, ignore_errors=True)
        shutil.rmtree(os.path.dirname(dlen), ignore_errors=True)


if __name__ == "__main__":
    main()
