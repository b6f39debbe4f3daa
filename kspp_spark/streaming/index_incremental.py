"""Incremental inverted-index maintenance for document CHANGELOGS.

The streaming face of functions/text.inverted_index, on the same
epoch-idempotent fold convention as streaming/rollup and
streaming/scd2: each micro-batch writes its own (term, doc_id, tf)
partial postings under epoch=<id> (overwrite => checkpoint-recovery
replays are safe); the queryable index materializes on read by
merging partials — so per-trigger work is O(batch), never a
re-tokenization of the accumulated corpus.

CHANGELOG SEMANTICS (krecord.h:23-25 — NULL value = tombstone;
mem_store.h:64-83 — last write wins per key): a re-emitted doc_id
SUPERSEDES its older postings, and a tombstone (NULL text) REMOVES
them. The mechanism is latest-epoch-wins per doc_id:

- every epoch writes, besides its postings, one SENTINEL row
  (term NULL, tf 0) per doc_id the batch touched — so tombstoned and
  empty documents still register their presence in that epoch;
- the snapshot keeps only each doc's newest epoch's rows (a per-doc
  max-epoch map — (doc_id, int) pairs, orders of magnitude smaller
  than the postings — joined back on doc_id), then drops sentinels.
  A deleted doc's newest epoch holds only its sentinel => no
  postings survive; an updated doc's older postings lose the
  max-epoch comparison. df counts and posting lists are computed
  AFTER superseding, so they never count ghosts.

A doc_id must appear at most once per micro-batch (the standard
compacted-changelog shape); pass `seq_col` to let the fold resolve
within-batch collisions last-write-wins by that column instead — AND
to make the cross-epoch merge EVENT-ordered: with seq_col, the
winning version per doc is max (seq, epoch), so a late-arriving
STALE update or delete (lower seq in a later epoch) is ignored —
the reference's stale-update/stale-delete rule (mem_store.h:64-83).
Use one seq mode consistently across bootstrap, stream, and
compaction (compaction preserves winning seqs).

Scale shape: per trigger, only the batch tokenizes; on read, only
integer/term triples shuffle (text never does), and the doc->epoch
map is a tiny aggregate the join side can broadcast. Snapshot cost
grows with the number of retained epochs — `compact_index_state`
rewrites the accumulated fold as a single epoch when triggers pile
up.

Reference: no kspp equivalent — beyond-reference north-star operator
(the retrieval complement of the BM25/keyword-search surface), with
delete/update propagation matching the reference's table semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from kspp_spark.functions.text import per_doc_term_stats, tokenize
from kspp_spark.streaming.epochs import (
    epoch_dirs as _epoch_dirs,
    guard_epoch_monotonic as _guard_epoch_monotonic,
)


def _lww_batch(batch_df: DataFrame, id_col: str, text_col: str, seq_col: str | None):
    """Resolve within-batch doc_id collisions last-write-wins by
    seq_col (max_by — the mem_store LWW rule applied inside one
    trigger), keeping the winning seq as `_seq` so the CROSS-epoch
    merge is event-ordered too (see module docstring). Without
    seq_col the batch is trusted to be compacted (one row per
    doc_id) and the merge falls back to arrival (epoch) order."""
    if seq_col is None:
        return batch_df
    # _seq is pinned to BIGINT: epochs written from differently-typed
    # seq sources (int literals vs long columns) must merge-read
    return batch_df.groupBy(id_col).agg(
        F.max_by(F.col(text_col), F.col(seq_col)).alias(text_col),
        F.max(seq_col).cast("long").alias("_seq"),
    )


def index_partials_batch(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_col: str | None = None,
    unitize=None,
) -> None:
    """foreachBatch body: tokenize ONLY the micro-batch and write its
    (term, doc_id, tf) partial postings under epoch=<id>, plus one
    NULL-term sentinel per touched doc_id (the changelog presence
    marker — see module docstring).

    `unitize` (Column -> array<string> Column, default whitespace
    tokenize) generalizes what a "term" is: the boilerplate fold
    (streaming/boilerplate_incremental) passes md5'd text units, so
    the same changelog machinery maintains a unit-frequency state."""
    _guard_epoch_monotonic(
        batch_df.sparkSession, state_dir, epoch_id, "index_partials_batch"
    )
    batch = _lww_batch(batch_df, id_col, text_col, seq_col)
    seq_cols = [F.col("_seq")] if seq_col else []
    units = (unitize or tokenize)(F.col(text_col))
    # MAP-ONLY per-doc tf (r13-opt): the (term, doc) groups all come
    # from one changelog row (a doc_id appears at most once per batch
    # — the fold's documented contract, enforced by _lww_batch in seq
    # mode), so the old explode + groupBy shuffled every token of
    # every trigger to compute a per-row quantity. _seq passes
    # through — it is per-doc constant after _lww_batch.
    partial = per_doc_term_stats(
        batch, units, id_col=id_col,
        passthrough=("_seq",) if seq_col else (),
    )
    sentinels = batch.select(
        F.lit(None).cast("string").alias("term"),
        F.col(id_col),
        F.lit(0).cast("long").alias("tf"),
        *seq_cols,
    )
    partial.unionByName(sentinels).write.mode("overwrite").parquet(
        os.path.join(state_dir, f"epoch={int(epoch_id)}")
    )


def index_stream(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_col: str | None = None,
):
    """Wire a document changelog into the index fold. Returns the
    started StreamingQuery; `index_snapshot` serves the current
    index."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        index_partials_batch(
            batch_df, epoch_id, state_dir, id_col=id_col, text_col=text_col,
            seq_col=seq_col,
        )

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _winning_rows(
    spark, state_dir: str, id_col: str, keep_seq: bool = False
) -> DataFrame:
    """The winning version's rows per doc (SENTINELS INCLUDED) from
    the accumulated partials. The doc->winner map is a tiny (id,
    version) aggregate — orders of magnitude smaller than the
    postings — joined back on the id (AQE broadcasts the map side at
    moderate scale).

    Without a _seq column the winner is the newest epoch (arrival
    order). With _seq (the fold ran with seq_col) the winner is max
    (seq, epoch) — EVENT-ordered LWW (mem_store.h:64-83): a
    late-arriving STALE update or delete loses the merge. Rows with
    NULL _seq (epochs folded before seq_col was adopted, surfaced via
    mergeSchema) rank BELOW every real seq — struct-max NULLS FIRST
    plus a null-safe join — so migrating a seq-less state to seq mode
    is well-defined: every seq-ed write supersedes the legacy rows,
    and seq-less-only docs keep serving by epoch order."""
    partials = spark.read.option("mergeSchema", "true").parquet(state_dir)
    if "_seq" in partials.columns:
        latest = partials.groupBy(F.col(id_col).alias("_lid")).agg(
            F.max(F.struct("_seq", "epoch")).alias("_w")
        )
        return (
            partials.join(
                latest,
                (F.col(id_col) == F.col("_lid"))
                & F.col("_seq").eqNullSafe(F.col("_w._seq"))
                & (F.col("epoch") == F.col("_w.epoch")),
            )
            .drop("_lid", "_w", "epoch", *([] if keep_seq else ["_seq"]))
        )
    latest = partials.groupBy(F.col(id_col).alias("_lid")).agg(
        F.max("epoch").alias("_e")
    )
    return (
        partials.join(
            latest,
            (F.col(id_col) == F.col("_lid")) & (F.col("epoch") == F.col("_e")),
        )
        .drop("_lid", "_e", "epoch")
    )


def _live_rows(spark, state_dir: str, id_col: str) -> DataFrame:
    """Winning postings only: the merge of _winning_rows minus the
    NULL-term presence sentinels (a deleted doc's winner is its
    sentinel alone, so nothing of it survives here)."""
    return _winning_rows(spark, state_dir, id_col).filter(
        F.col("term").isNotNull()
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
    (term, df, n_occ, postings). Superseded and tombstoned documents
    are invisible: df/n_occ/postings are computed after the
    latest-epoch-wins merge."""
    live = _live_rows(spark, state_dir, id_col)
    agg = live.groupBy("term").agg(
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
    seq_col: str | None = None,
) -> None:
    """foreachBatch body for the POSITIONAL index: tokenize only the
    micro-batch and write its (term, doc_id, tf, positions) partial
    postings under epoch=<id> — the streaming producer of the
    positional_index artifact phrase_search_indexed / bm25_indexed
    consume — plus the NULL-term sentinel per touched doc (changelog
    presence marker). With `doclen_dir`, the per-doc token lengths
    fold too (BM25's side table): every touched doc writes its length
    each epoch (0 for tombstones), and the snapshot takes the newest.
    Same epoch-overwrite idempotency as the tf-only fold."""
    spark = batch_df.sparkSession
    _guard_epoch_monotonic(spark, state_dir, epoch_id, "positional_partials_batch")
    if doclen_dir is not None:
        _guard_epoch_monotonic(
            spark, doclen_dir, epoch_id, "positional_partials_batch(doclen)"
        )
    batch = _lww_batch(batch_df, id_col, text_col, seq_col)
    seq_cols = [F.col("_seq")] if seq_col else []
    # MAP-ONLY per-doc (tf, positions) — same r13-opt rationale as
    # index_partials_batch: nothing in the first index aggregation
    # ever needs to leave its changelog row.
    partial = per_doc_term_stats(
        batch, tokenize(F.col(text_col)), id_col=id_col, positional=True,
        passthrough=("_seq",) if seq_col else (),
    )
    sentinels = batch.select(
        F.lit(None).cast("string").alias("term"),
        F.col(id_col),
        F.lit(0).cast("long").alias("tf"),
        F.array().cast("array<int>").alias("positions"),
        *seq_cols,
    )
    partial.unionByName(sentinels).write.mode("overwrite").parquet(
        os.path.join(state_dir, f"epoch={int(epoch_id)}")
    )
    if doclen_dir is not None:
        # directly (not via text.doc_lengths, which drops dl=0 rows):
        # tombstoned/empty docs must register a 0 length so their
        # stale lengths lose the latest-epoch-wins merge
        lengths = batch.select(
            F.col(id_col),
            F.coalesce(
                F.size(tokenize(F.col(text_col))), F.lit(0)
            ).cast("long").alias("dl"),
            *seq_cols,
        )
        lengths.write.mode("overwrite").parquet(
            os.path.join(doclen_dir, f"epoch={int(epoch_id)}")
        )


def doc_lengths_snapshot(
    spark, doclen_dir: str, id_col: str = "doc_id"
) -> DataFrame:
    """Current doc-length table from the accumulated per-epoch folds —
    the streaming-maintained form of functions/text.doc_lengths, fed
    straight into bm25_indexed. Latest-epoch-wins per doc; dl=0 rows
    (tombstoned/empty docs) drop out, matching the batch operator's
    dl > 0 contract. `id_col` must match the fold's (explicit, like
    every sibling snapshot — never inferred from physical column
    order, which schema merges could reshuffle)."""
    # partials write (id_col, dl[, _seq]) + epoch; same winner rule as
    # the postings merge (shared _winning_rows)
    cols = spark.read.parquet(doclen_dir).columns
    if id_col not in cols:
        raise ValueError(
            f"doc_lengths_snapshot: id_col {id_col!r} not in doclen "
            f"state columns {cols} — pass the id_col the fold ran with"
        )
    return _winning_rows(spark, doclen_dir, id_col).filter(F.col("dl") > 0)


def positional_index_stream(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    doclen_dir: str | None = None,
    seq_col: str | None = None,
):
    """Wire a document changelog into the positional-index fold.
    Returns the started StreamingQuery; `positional_index_snapshot`
    (and `doc_lengths_snapshot` when doclen_dir is set) serve the
    current artifacts."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        positional_partials_batch(
            batch_df, epoch_id, state_dir, id_col=id_col, text_col=text_col,
            doclen_dir=doclen_dir, seq_col=seq_col,
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
    The latest-epoch-wins merge supersedes updated docs and erases
    tombstoned ones BEFORE df counts, so the served index equals a
    fresh batch index over the corpus's current logical state. The
    merge joins only the tiny doc->epoch map; the df side broadcasts
    via AQE, so the position arrays never re-shuffle (same plan shape
    as the batch positional_index)."""
    live = _live_rows(spark, state_dir, id_col)
    dfreq = live.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    out = live.join(dfreq, "term")
    return out.select("term", id_col, "tf", "df", "positions")


def index_bootstrap(
    corpus_df: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    positional: bool = False,
    doclen_dir: str | None = None,
    seq_col: str | None = None,
) -> None:
    """Bootstrap the incremental index from an EXISTING corpus (same
    epoch=-1 convention as the scd2/rollup bootstraps): one batch
    tokenize pass lands as the epoch=-1 partial; a fresh stream's
    epochs then accumulate on top through the normal merge-on-read
    snapshot. positional=True writes the positional partials (and the
    doc-length fold when doclen_dir is set). Refuses non-fresh
    directories — BOTH state_dir and doclen_dir (a doclen_dir with
    retained epochs would shadow the bootstrap lengths and skew
    BM25's N/avgdl). Streamed doc_ids may update or tombstone
    bootstrapped ones — the changelog merge supersedes across the
    bootstrap boundary like any other epoch. seq mode must be
    CONSISTENT across bootstrap and stream: if the stream folds with
    seq_col, bootstrap with one too (a seq column is synthesizable as
    F.lit(0) when the corpus has none — every real stream seq then
    supersedes it)."""
    spark = corpus_df.sparkSession
    for d, label in [(state_dir, "state_dir")] + (
        [(doclen_dir, "doclen_dir")] if doclen_dir is not None else []
    ):
        if _epoch_dirs(spark, d):
            raise ValueError(
                f"index_bootstrap: {label} already contains epochs — "
                "bootstrap only initializes fresh directories"
            )
    if positional:
        positional_partials_batch(
            corpus_df, -1, state_dir, id_col=id_col, text_col=text_col,
            doclen_dir=doclen_dir, seq_col=seq_col,
        )
    else:
        index_partials_batch(
            corpus_df, -1, state_dir, id_col=id_col, text_col=text_col,
            seq_col=seq_col,
        )


def compact_index_state(
    spark,
    state_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    positional: bool = True,
) -> None:
    """Rewrite an accumulated fold as a single epoch=-1 partial in a
    FRESH out_dir: the winning-version merge runs once at compaction
    instead of on every snapshot read, and superseded postings
    physically disappear. The winners' SENTINEL rows are kept — in
    seq mode a tombstoned doc's only surviving row is its sentinel
    carrying the delete's seq, and dropping it would let a late STALE
    update resurrect the deleted doc (the sentinel is what makes the
    stale write lose the merge). Point the stream at out_dir with a
    fresh checkpoint afterwards (the epoch guard enforces the
    fresh-dir discipline)."""
    if _epoch_dirs(spark, out_dir):
        raise ValueError(
            "compact_index_state: out_dir already contains epochs — "
            "compaction writes a fresh directory"
        )
    winners = _winning_rows(spark, state_dir, id_col, keep_seq=True)
    cols = ["term", id_col, "tf"] + (["positions"] if positional else [])
    if "_seq" in winners.columns:
        cols.append("_seq")
    winners.select(*cols).write.mode("overwrite").parquet(
        os.path.join(out_dir, "epoch=-1")
    )
