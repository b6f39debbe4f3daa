"""Incremental inverted-index maintenance for document streams.

The streaming face of functions/text.inverted_index, on the same
epoch-idempotent fold convention as streaming/rollup and
streaming/scd2: each micro-batch writes its own (term, doc_id, tf)
partial postings under epoch=<id> (overwrite => checkpoint-recovery
replays are safe); the queryable index materializes on read by
merging partials — counts sum, posting lists union — so per-trigger
work is O(batch), never a re-tokenization of the accumulated corpus.

Assumes an append-only document stream (each doc_id ingested once) —
the standard corpus-building shape. Re-ingesting a doc_id would sum
its term frequencies twice; route updates through a dedup stage
(streaming/core.dedup_stream) first.

Reference: no kspp equivalent — beyond-reference north-star operator
(the retrieval complement of the BM25/keyword-search surface).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from kspp_spark.functions.text import tokenize


def index_partials_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """foreachBatch body: tokenize ONLY the micro-batch and write its
    (term, doc_id, tf) partial postings under epoch=<id>."""
    toks = batch_df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    partial = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    partial.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"epoch={int(epoch_id)}")
    )


def index_stream(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire a document stream into the index fold. Returns the started
    StreamingQuery; `index_snapshot` serves the current index."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        index_partials_batch(
            batch_df, epoch_id, state_dir, id_col=id_col, text_col=text_col
        )

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def index_snapshot(
    spark,
    state_dir: str,
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Current inverted index from the accumulated partials — same
    schema and vocabulary bounds as the batch inverted_index:
    (term, df, n_occ, postings)."""
    partials = spark.read.parquet(state_dir).drop("epoch")
    agg = partials.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("n_occ"),
        F.sort_array(F.collect_list(F.col(id_col))).alias("_postings"),
    )
    out = agg.filter(F.col("df") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out.select(
        "term",
        "df",
        "n_occ",
        F.concat_ws(
            ",", F.transform(F.col("_postings"), lambda x: x.cast("string"))
        ).alias("postings"),
    )


def positional_partials_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    doclen_dir: str | None = None,
) -> None:
    """foreachBatch body for the POSITIONAL index: tokenize only the
    micro-batch and write its (term, doc_id, tf, positions) partial
    postings under epoch=<id> — the streaming producer of the
    positional_index artifact phrase_search_indexed / bm25_indexed
    consume. With `doclen_dir`, the per-doc token lengths fold too
    (BM25's side table — docs are append-only, so each epoch's
    lengths are final). Same epoch-overwrite idempotency as the
    tf-only fold; same append-only doc_id assumption."""
    pos = batch_df.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    partial = pos.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    partial.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"epoch={int(epoch_id)}")
    )
    if doclen_dir is not None:
        from kspp_spark.functions.text import doc_lengths

        doc_lengths(batch_df, id_col=id_col, text_col=text_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(doclen_dir, f"epoch={int(epoch_id)}"))


def doc_lengths_snapshot(spark, doclen_dir: str) -> DataFrame:
    """Current doc-length table from the accumulated per-epoch folds —
    the streaming-maintained form of functions/text.doc_lengths, fed
    straight into bm25_indexed."""
    return spark.read.parquet(doclen_dir).drop("epoch")


def positional_index_stream(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    doclen_dir: str | None = None,
):
    """Wire a document stream into the positional-index fold. Returns
    the started StreamingQuery; `positional_index_snapshot` (and
    `doc_lengths_snapshot` when doclen_dir is set) serve the current
    artifacts."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        positional_partials_batch(
            batch_df, epoch_id, state_dir, id_col=id_col, text_col=text_col,
            doclen_dir=doclen_dir,
        )

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def positional_index_snapshot(
    spark,
    state_dir: str,
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Current positional index from the accumulated partials — the
    exact schema of the batch functions/text.positional_index
    ((term, doc_id, tf, df, positions)), so the indexed query
    operators run unchanged against a streaming-maintained index.
    Since docs are append-only, each (term, doc) lives in exactly one
    epoch: the merge is a per-term df count joined back (plain join —
    AQE broadcasts the tiny df side, so the position arrays never
    re-shuffle; same plan shape as the batch positional_index)."""
    partials = spark.read.parquet(state_dir).drop("epoch")
    dfreq = partials.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    out = partials.join(dfreq, "term")
    return out.select("term", id_col, "tf", "df", "positions")


def index_bootstrap(
    corpus_df: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    positional: bool = False,
    doclen_dir: str | None = None,
) -> None:
    """Bootstrap the incremental index from an EXISTING corpus (same
    epoch=-1 convention as the scd2/rollup bootstraps): one batch
    tokenize pass lands as the epoch=-1 partial; a fresh stream's
    epochs then accumulate on top through the normal merge-on-read
    snapshot. positional=True writes the positional partials (and the
    doc-length fold when doclen_dir is set). Refuses non-fresh
    directories; the append-only doc_id assumption extends across the
    bootstrap boundary (streamed docs must be NEW doc_ids)."""
    spark = corpus_df.sparkSession
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath) and any(
        st.getPath().getName().startswith("epoch=")
        for st in fs.listStatus(jpath)
    ):
        raise ValueError(
            "index_bootstrap: state_dir already contains epochs — "
            "bootstrap only initializes fresh directories"
        )
    if positional:
        positional_partials_batch(
            corpus_df, -1, state_dir, id_col=id_col, text_col=text_col,
            doclen_dir=doclen_dir,
        )
    else:
        index_partials_batch(
            corpus_df, -1, state_dir, id_col=id_col, text_col=text_col
        )
