"""The STREAMING web-corpus curation pipeline — the continuous-ingest
form of example_web_pipeline.py, closing the loop VERDICT r6 item #7
asked for: a document CHANGELOG (inserts, updates, a stale late
arrival, tombstones — krecord.h:23-25 / mem_store.h:64-83 semantics,
event-ordered by `seq`) flows through

    1. the boilerplate-frequency fold   (streaming/boilerplate_incremental)
    2. the near-dup probe-and-update    (streaming/dedup_incremental,
       seq-mode changelog + signature-verify stage)

and each batch is gated AS IT ARRIVES against the state so far (the
production ingest shape). At the end, the folded states must agree
EXACTLY with the batch pipeline over the corpus's final logical
state:

    * boilerplate set snapshot == batch boilerplate_units recount
    * re-scored live streaming pairs == batch MinHash-LSH verified pairs
    * the gated curated doc_id set == the batch pipeline's output

The pairs log is append-only history; the equivalence filter (both
members live, re-scored against CURRENT winning signatures) is the
documented way to read it. A pair whose near-dup-ness arises only
from updates applied AFTER both members' probes would be absent from
the log — production systems re-probe after compaction to close that
window; this changelog (like most crawls: the duplicate arrives after
its target) doesn't hit it.
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from kspp_spark.functions.dedup import minhash_candidates, minhash_signatures
from kspp_spark.functions.text import (
    boilerplate_units,
    gopher_counters,
    gopher_keep,
    remove_boilerplate_with_set,
)
from kspp_spark.session import get_spark
from kspp_spark.streaming.boilerplate_incremental import (
    boilerplate_partials_batch,
    boilerplate_set_snapshot,
)
from kspp_spark.streaming.dedup_incremental import (
    dedup_sigs_snapshot,
    probe_and_update,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
N_TOKENS = 10  # boilerplate unit width (single-line synthetic corpus)
MIN_DOCS = 3
MIN_SCORE = 0.5
STOPWORDS = ["the", "a", "of", "and", "to"]


def main() -> None:
    spark = get_spark("example_streaming_web_pipeline")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    half = ids[len(ids) // 2]
    upd_id, dead_id = ids[0], ids[-1]
    dup_target = ids[1]
    target_text = docs.filter(F.col("doc_id") == dup_target).first().text

    # ---- the changelog: 3 epochs with update / stale / tombstone ----
    first = docs.filter(F.col("doc_id") <= half).withColumn("seq", F.lit(1))
    second = docs.filter(F.col("doc_id") > half).withColumn("seq", F.lit(1))
    batch1 = second.unionByName(
        spark.createDataFrame(
            [
                # UPDATE: upd_id becomes a near-copy of dup_target
                (upd_id, target_text + " trailing crawl artifact", 2),
                (dead_id, None, 2),  # TOMBSTONE
            ],
            "doc_id long, text string, seq long",
        )
    )
    batch2 = spark.createDataFrame(
        [
            # STALE late arrival for the tombstoned doc: seq 1 < 2 —
            # the reference's stale-update rule says IGNORE, so the
            # doc stays dead
            (dead_id, "zombie content that must never resurface", 1),
        ],
        "doc_id long, text string, seq long",
    )

    bl_state = tempfile.mkdtemp(prefix="web_bl_") + "/s"
    nd_state = tempfile.mkdtemp(prefix="web_nd_") + "/s"
    pairs_dir = tempfile.mkdtemp(prefix="web_pairs_") + "/p"
    try:
        for epoch, batch in enumerate([first, batch1, batch2]):
            # fold 1: boilerplate unit frequencies (changelog-aware)
            boilerplate_partials_batch(
                batch, epoch, bl_state, n_tokens=N_TOKENS, seq_col="seq"
            )
            # fold 2: near-dup probe against the accumulated corpus,
            # verified pairs out (MinHash estimate >= MIN_SCORE)
            probe_and_update(
                batch, epoch, nd_state, pairs_dir,
                seq_col="seq", verify=True, min_score=MIN_SCORE,
            )
            # per-batch ingest gate with the state SO FAR: strip
            # against the current set, Gopher-gate, count near-dups
            bl_now = boilerplate_set_snapshot(spark, bl_state, min_docs=MIN_DOCS)
            live_batch = batch.filter(F.col("text").isNotNull())
            cleaned = remove_boilerplate_with_set(
                live_batch, bl_now, n_tokens=N_TOKENS
            )
            c = gopher_counters("clean_text", stopwords=STOPWORDS)
            kept = cleaned.filter(gopher_keep(c)).count()
            ep_pairs = spark.read.parquet(
                os.path.join(pairs_dir, f"epoch={epoch}")
            ).filter("verified")
            print(
                f"epoch {epoch}: {batch.count()} changelog rows, "
                f"{kept} pass the gate now, "
                f"{ep_pairs.count()} verified near-dup pairs"
            )

        # ---- end-state equivalence vs the BATCH pipeline ----
        # the corpus's final logical state: seq-LWW per doc, minus
        # tombstones
        changelog = first.unionByName(batch1).unionByName(batch2)
        live = (
            changelog.groupBy("doc_id")
            .agg(F.max_by("text", "seq").alias("text"))
            .filter(F.col("text").isNotNull())
        )

        # 1. the folded boilerplate set == a batch recount
        stream_set = {
            r.unit_digest
            for r in boilerplate_set_snapshot(
                spark, bl_state, min_docs=MIN_DOCS
            ).collect()
        }
        batch_set = {
            r.unit_digest
            for r in boilerplate_units(
                live, n_tokens=N_TOKENS, min_docs=MIN_DOCS, keep_unit=False
            ).collect()
        }
        assert stream_set == batch_set, "boilerplate fold diverged from batch"

        # 2. live streaming pairs, re-scored on CURRENT winning
        #    signatures, == batch MinHash-LSH verified pairs
        sigs_now = dedup_sigs_snapshot(spark, nd_state + "_sigs")
        raw_pairs = (
            spark.read.parquet(pairs_dir)
            .select("new_id", "dup_of")
            .distinct()
        )
        rescored = (
            raw_pairs.join(
                sigs_now.select(
                    F.col("id").alias("new_id"), F.col("sig").alias("_sa")
                ),
                "new_id",
            )
            .join(
                sigs_now.select(
                    F.col("id").alias("dup_of"), F.col("sig").alias("_sb")
                ),
                "dup_of",
            )
            .withColumn(
                "score",
                F.size(
                    F.filter(
                        F.zip_with("_sa", "_sb", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(64.0),
            )
            .filter(F.col("score") >= MIN_SCORE)
        )
        stream_pairs = {
            frozenset((r.new_id, r.dup_of)) for r in rescored.collect()
        }
        bsigs = minhash_signatures(live)
        bcands = minhash_candidates(bsigs)
        bverified = (
            bcands.join(
                bsigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("_sa")),
                "a",
            )
            .join(
                bsigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("_sb")),
                "b",
            )
            .withColumn(
                "score",
                F.size(
                    F.filter(
                        F.zip_with("_sa", "_sb", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(64.0),
            )
            .filter(F.col("score") >= MIN_SCORE)
        )
        batch_pairs = {frozenset((r.a, r.b)) for r in bverified.collect()}
        assert stream_pairs == batch_pairs, (
            f"near-dup pairs diverged: stream-only "
            f"{stream_pairs - batch_pairs}, batch-only "
            f"{batch_pairs - stream_pairs}"
        )
        assert any(frozenset((upd_id, dup_target)) == p for p in stream_pairs)

        # 3. the full gated output: strip -> Gopher -> drop the
        #    later-arriving member of each verified pair
        def curate(corpus, bl_set, drop_ids):
            cleaned = remove_boilerplate_with_set(
                corpus, bl_set, n_tokens=N_TOKENS
            )
            c = gopher_counters("clean_text", stopwords=STOPWORDS)
            return {
                r.doc_id
                for r in cleaned.filter(gopher_keep(c)).collect()
            } - drop_ids

        stream_drop = {max(p) for p in stream_pairs}
        batch_drop = {max(p) for p in batch_pairs}
        bl_set_df = boilerplate_set_snapshot(spark, bl_state, min_docs=MIN_DOCS)
        curated_stream = curate(live, bl_set_df, stream_drop)
        curated_batch = curate(
            live,
            boilerplate_units(
                live, n_tokens=N_TOKENS, min_docs=MIN_DOCS, keep_unit=False
            ),
            batch_drop,
        )
        assert curated_stream == curated_batch, "curated output diverged"
        assert dead_id not in curated_stream, "tombstoned doc resurfaced"
        print(
            f"curated corpus: {len(curated_stream)} docs "
            f"(streaming == batch), {len(stream_pairs)} near-dup pairs, "
            f"{len(stream_set)} boilerplate units"
        )
    finally:
        for d in (bl_state, nd_state, pairs_dir):
            shutil.rmtree(os.path.dirname(d), ignore_errors=True)
        shutil.rmtree(nd_state + "_sigs", ignore_errors=True)


if __name__ == "__main__":
    main()
