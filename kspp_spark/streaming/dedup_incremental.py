"""Incremental near-duplicate detection for document streams.

The ingestion-pipeline form of MinHash/LSH dedup: each micro-batch of
new documents is checked against the ACCUMULATED corpus — not just
within itself — by joining its banded signatures against a persisted
band-bucket state table, then appending them to it. This is the
pattern a production corpus builder runs: "is this incoming document a
near-copy of anything we already have?"

Batch dedup over the full corpus is functions/dedup.py
(minhash_signatures + minhash_candidates); this module reuses the same
signature/banding code so streaming and batch agree exactly.

Scale notes: state holds (id, band, band_hash) — fixed width, ~bands
rows per document, far smaller than text. The per-batch probe is an
equi-join on (band, band_hash): broadcast when the batch is small,
shuffle otherwise (Spark's planner picks). At very large corpus sizes,
persist the state bucketed by band_hash (io.write_bucketed) so the
probe join is shuffle-free on the state side. No driver-side state
anywhere; recovery is Spark checkpointing — the state appends are
idempotent per epoch via overwrite-by-epoch directory naming.

Reference: no kspp equivalent (beyond-reference north-star operator).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from kspp_spark.functions.dedup import minhash_signatures, srp_signatures


def srp_banded_signatures(
    df: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 32,
    dims: int = 64,
    bands: int = 4,
    seed: int = 0,
) -> DataFrame:
    """(id, band, bhash) banded SRP signatures — the dedup-state row
    format for EMBEDDING streams (the streaming face of the hyperplane
    LSH tier, functions/dedup.srp_signatures): band b's bhash is the
    b-th bit-slice of the packed signature, so two vectors share a
    bucket iff that slice matches — identical semantics to the batch
    path's simhash_candidates(sim_col="srp") banding. Pass as
    `banded_fn` to probe_and_update / incremental_near_dedup."""
    from kspp_spark.functions.dedup import signature_band_slices

    sigs = srp_signatures(
        df, vec=vec, id_col=id_col, planes=planes, dims=dims, seed=seed
    )
    return signature_band_slices(
        sigs, id_col=id_col, sim_col="srp", bands=bands, bits=planes, out_id="id"
    )


def banded_signatures(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
) -> DataFrame:
    """(id, band, bhash) banded-signature relation — the dedup state
    row format. rows_per_band = num_hashes // bands."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, text=text, id_col=id_col, num_hashes=num_hashes, shingle_n=shingle_n
    )
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    )
    return banded.select("id", "bb.band", "bb.bhash")


def probe_and_update(
    batch_df: DataFrame,
    epoch_id: int,
    state_dir: str,
    pairs_dir: str,
    text: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    banded_fn=None,
) -> None:
    """foreachBatch body: emit (new_id, dup_of) candidate pairs for the
    micro-batch — against the accumulated state AND within the batch —
    then append the batch's banded signatures to the state.

    `banded_fn` (batch DataFrame -> (id, band, bhash)) swaps the
    signature family: default is the MinHash text path
    (banded_signatures); pass srp_banded_signatures for embedding
    streams. The probe/update machinery is family-agnostic.

    CHANGELOG SEMANTICS (same rules as the index folds,
    krecord.h:23-25 / mem_store.h:64-83, arrival-ordered): a
    re-emitted id SUPERSEDES its older signatures — the probe only
    matches each doc's newest epoch's bands, so stale content stops
    pairing — and a tombstone (NULL text/vector, which produces no
    signature rows) deletes the doc from the probe-able state. Every
    epoch writes one band=-1 presence SENTINEL per touched id to
    register updates/deletes; ids must be unique within a batch (the
    compacted-changelog shape). Pairs already emitted to pairs_dir
    are an append log of PAST observations — consumers joining pairs
    against the live corpus drop pairs whose members died later.

    Epoch-named state files make replays after a checkpoint recovery
    overwrite rather than double-append (idempotent at-least-once)."""
    spark = batch_df.sparkSession
    if banded_fn is None:
        # NULL text must yield NO signature rows (the tombstone
        # contract) — unfiltered, _shingles' concat_ws fallback turns
        # NULL into the empty-string signature and every tombstone
        # would near-dup-match every other tombstone.
        new = banded_signatures(
            batch_df.filter(F.col(text).isNotNull()),
            text=text, id_col=id_col, num_hashes=num_hashes,
            shingle_n=shingle_n, bands=bands,
        ).cache()
    else:
        # contract for custom families: banded_fn must emit no rows
        # for NULL payloads (srp_banded_signatures does — verified)
        new = banded_fn(batch_df).cache()
    sentinels = batch_df.select(
        F.col(id_col).alias("id"),
        F.lit(-1).alias("band"),
        F.lit(0).cast("long").alias("bhash"),
    ).distinct()

    # within-batch pairs: same bucket, smaller id first
    left = new.select("band", "bhash", F.col("id").alias("a"))
    right = new.select("band", "bhash", F.col("id").alias("b"))
    within = (
        left.join(right, ["band", "bhash"])
        .filter(F.col("a") < F.col("b"))
        .select(F.col("b").alias("new_id"), F.col("a").alias("dup_of"))
    )
    pairs = within
    # Detect existing state by attempting the read (works for any
    # filesystem scheme — local, hdfs://, s3a:// — unlike os.path checks,
    # which silently disable the probe on remote state dirs). ONLY a
    # missing/empty path means "first epoch"; any other failure
    # (transient S3/HDFS error, permissions, corrupt footer) must
    # re-raise — swallowing it would silently drop all accumulated LSH
    # state and miss every cross-batch duplicate for this micro-batch.
    from pyspark.errors import AnalysisException

    try:
        state = spark.read.parquet(state_dir)
    except AnalysisException as e:
        msg = str(e)
        if any(
            tag in msg
            for tag in (
                "PATH_NOT_FOUND",
                "Path does not exist",
                "UNABLE_TO_INFER_SCHEMA",
                "Unable to infer schema",
            )
        ):
            state = None  # first epoch: no accumulated state yet
        else:
            raise
    if state is not None:
        # epoch=N directory naming surfaces as a discovered partition
        # column: exclude the CURRENT epoch so a checkpoint-recovery
        # replay (which already wrote this epoch's state) doesn't emit
        # the within-batch pairs a second time in (a,b)+(b,a) form.
        if "epoch" in state.columns:
            state = state.filter(F.col("epoch") != F.lit(int(epoch_id)))
            # latest-epoch-wins: only each doc's NEWEST epoch's bands
            # are probe-able (superseded content and tombstoned docs —
            # whose newest epoch holds only the band=-1 sentinel —
            # stop matching). The id->max-epoch map is a tiny
            # aggregate relative to the band state.
            latest = state.groupBy(F.col("id").alias("_lid")).agg(
                F.max("epoch").alias("_e")
            )
            state = state.join(
                latest,
                (F.col("id") == F.col("_lid"))
                & (F.col("epoch") == F.col("_e")),
            ).filter(F.col("band") >= 0)
        # docs re-emitted or tombstoned IN THIS BATCH: their prior
        # epochs' bands are superseded as of this trigger, but the
        # current-epoch exclusion above (replay safety) would leave
        # them probe-able — anti-join them out; the within-batch pass
        # already covers their NEW content.
        state = state.join(sentinels.select("id"), "id", "left_anti")
        state = state.select("id", "band", "bhash")
        cross = (
            new.join(state.withColumnRenamed("id", "dup_of"), ["band", "bhash"])
            .select(F.col("id").alias("new_id"), "dup_of")
            # belt-and-braces: never pair a document with itself
            .filter(F.col("new_id") != F.col("dup_of"))
        )
        pairs = within.unionByName(cross)
    (
        pairs.distinct()
        .write.mode("overwrite")
        .parquet(os.path.join(pairs_dir, f"epoch={epoch_id}"))
    )
    new.unionByName(sentinels).write.mode("overwrite").parquet(
        os.path.join(state_dir, f"epoch={epoch_id}")
    )
    new.unpersist()


def incremental_near_dedup(
    stream_df: DataFrame,
    state_dir: str,
    pairs_dir: str,
    checkpoint: str,
    **kwargs,
):
    """Wire a document stream into the probe-and-update loop. Returns
    the started StreamingQuery; near-dup pairs accumulate under
    pairs_dir/epoch=*/ as (new_id, dup_of)."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        probe_and_update(
            batch_df, epoch_id, state_dir=state_dir, pairs_dir=pairs_dir, **kwargs
        )

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_dedup_state(spark, state_dir: str, out_dir: str) -> None:
    """Rewrite the accumulated band state as a single epoch=-1 in a
    FRESH out_dir, keeping only each id's winning (newest-epoch) rows
    — superseded bands physically disappear, so per-trigger probe
    cost tracks the live corpus instead of total update history.
    Tombstoned ids' sentinels are kept (same policy as the index
    fold's compaction). Point the stream at out_dir with a fresh
    checkpoint afterwards."""
    import os as _os

    from kspp_spark.streaming.epochs import epoch_dirs as _epoch_dirs

    if _epoch_dirs(spark, out_dir):
        raise ValueError(
            "compact_dedup_state: out_dir already contains epochs — "
            "compaction writes a fresh directory"
        )
    state = spark.read.parquet(state_dir)
    latest = state.groupBy(F.col("id").alias("_lid")).agg(
        F.max("epoch").alias("_e")
    )
    winners = state.join(
        latest,
        (F.col("id") == F.col("_lid")) & (F.col("epoch") == F.col("_e")),
    ).select("id", "band", "bhash")
    winners.write.mode("overwrite").parquet(_os.path.join(out_dir, "epoch=-1"))
