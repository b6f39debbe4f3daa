"""STREAMING crawl ingestion end-to-end — VERDICT r7 item #6: WARC
segments consumed AS THEY LAND (Structured Streaming file source, one
segment per micro-batch) flow through the full curation path

    read_warc_stream             (sources/warc.py)
      -> warc_to_documents        (charset-aware body decode)
      -> robots_gate              (RFC 9309, stream-static join)
      -> crawl_dedup_stream       (canonical-URL LWW ktable changelog)
      -> foreachBatch:
           html_to_text           (JVM regexp chain)
           boilerplate fold       (streaming/boilerplate_incremental)
           near-dup probe+verify  (streaming/dedup_incremental, seq-mode)

and the end state must agree EXACTLY with the batch pipeline
(example_warc_ingest's shape) over the same segments read all at once:

    * the LWW winner per canonical URL (a stale re-crawl arriving
      LAST, with an OLDER warc_date, must not supersede — every stage
      keys on event time, so the result is arrival-order independent)
    * the folded boilerplate set == a batch recount on the live corpus
    * re-scored streaming near-dup pairs == batch MinHash-LSH pairs
    * the final curated doc set (strip -> Gopher -> drop the
      higher-id member of each verified pair)
"""

import gzip
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from kspp_spark.functions.dedup import minhash_candidates, minhash_signatures
from kspp_spark.functions.robots import robots_gate
from kspp_spark.functions.text import (
    boilerplate_units,
    gopher_counters,
    gopher_keep,
    remove_boilerplate_with_set,
)
from kspp_spark.functions.web import crawl_dedup_stream, html_to_text
from kspp_spark.session import get_spark
from kspp_spark.sources.warc import (
    read_warc,
    read_warc_stream,
    warc_to_documents,
)
from kspp_spark.streaming.boilerplate_incremental import (
    boilerplate_partials_batch,
    boilerplate_set_snapshot,
)
from kspp_spark.streaming.dedup_incremental import (
    dedup_sigs_snapshot,
    probe_and_update,
)

LINE_SPLIT = r"\n+"  # html_to_text output is line-structured
MIN_DOCS = 3
MIN_SCORE = 0.5
STOPWORDS = ["the", "a", "of", "and", "to"]

NAV = "<div>home products about contact login search help news</div>"
FOOT = "<div>copyright example site all rights reserved privacy terms</div>"
# each page gets its OWN prose — shared text across pages would make
# everything a near-dup of everything and drown the intended b~c pair
PROSE_A = (
    "the quick brown fox jumps over the lazy dog while birds watch "
    "from above and a small animal hides under thick roots near the "
    "old stone wall by a winding river as the evening sun sets slowly "
    "behind tall green quiet hills and all of the forest goes still "
)
PROSE_B = (
    "a narrow harbor town wakes early to the sound of gulls and rope "
    "on wood as fishing boats slip out past the breakwater into cold "
    "grey water and the bakery lights come on one by one along the "
    "crooked street where carts of bread roll to the morning market "
)
PROSE_X = (
    "deep in the archive a librarian sorts faded letters into boxes "
    "by year and by hand noting each seal and stamp while dust moves "
    "through a beam of light from the high window above the long oak "
    "tables where readers turn pages slowly and the clock ticks on "
)


def _page(body: str) -> str:
    return f"<html><body>{NAV}<p>{body}</p>{FOOT}</body></html>"


def _record(headers: dict, block: bytes) -> bytes:
    h = "".join(f"{k}: {v}\r\n" for k, v in headers.items())
    return (
        b"WARC/1.0\r\n" + h.encode()
        + f"Content-Length: {len(block)}\r\n\r\n".encode()
        + block + b"\r\n\r\n"
    )


def _response(uri: str, date: str, body: str) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        + body.encode()
    )
    return _record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{abs(hash((uri, date)))}>",
            "WARC-Target-URI": uri,
            "WARC-Date": date,
            "Content-Type": "application/http;msgtype=response",
        },
        http,
    )


def main() -> None:
    spark = get_spark("example_warc_stream")
    work = tempfile.mkdtemp(prefix="warc_stream_")
    crawl = os.path.join(work, "crawl")
    os.makedirs(crawl)
    bl_state = os.path.join(work, "bl", "s")
    nd_state = os.path.join(work, "nd", "s")
    pairs_dir = os.path.join(work, "pairs")
    changelog = os.path.join(work, "changelog")
    ckpt = os.path.join(work, "ckpt")

    a_v1 = PROSE_A * 2 + "version one marker alpha beta gamma"
    a_v2 = PROSE_A * 2 + "version two marker delta epsilon zeta"
    b_txt = PROSE_B * 2 + "page b closing words maple cedar willow oak"
    c_txt = b_txt + " tiny trailing extra"  # near-dup of /b

    segments = [
        # seg0: first captures (+ a robots-disallowed URL)
        _response("http://site.example.com/a?x=1&y=2",
                  "2026-01-01T00:00:00Z", _page(a_v1))
        + _response("http://site.example.com/b",
                    "2026-01-01T00:00:01Z", _page(b_txt))
        + _response("http://site.example.com/blocked",
                    "2026-01-01T00:00:02Z", _page(PROSE_X * 2)),
        # seg1: /a re-crawled NEWER under a trivially-different URL
        # (case/port/param order), plus the near-dup of /b
        _response("http://site.EXAMPLE.com:80/a?y=2&x=1",
                  "2026-02-01T00:00:00Z", _page(a_v2))
        + _response("http://site.example.com/c",
                    "2026-02-01T00:00:01Z", _page(c_txt)),
        # seg2: a STALE /a re-arrival (older than seg1's capture —
        # must not supersede) and a too-short page (Gopher-gated)
        _response("http://site.example.com/a?x=1&y=2",
                  "2026-01-15T00:00:00Z", _page(a_v1))
        + _response("http://site.example.com/tiny",
                    "2026-03-01T00:00:00Z", _page("too short")),
    ]
    for i, seg in enumerate(segments):
        with open(os.path.join(crawl, f"seg-{i:05d}.warc.gz"), "wb") as f:
            f.write(gzip.compress(seg))

    robots = spark.createDataFrame(
        [("site.example.com", "User-agent: *\nDisallow: /blocked\n")],
        "domain string, robots_txt string",
    )

    try:
        # ---- the streaming pipeline ----
        records = read_warc_stream(spark, crawl, max_files_per_trigger=1)
        docs = warc_to_documents(records, with_date=True)
        gated = robots_gate(docs, robots, agent="corpusbot").filter(
            "robots_allowed"
        ).select("doc_id", "url", "warc_date", "text")
        winners = crawl_dedup_stream(gated, url_col="url",
                                     date_col="warc_date")

        def fold(batch_df, epoch_id):
            # shape the changed winners into a document changelog:
            # stable logical id per canonical URL, event-time seq
            shaped = batch_df.select(
                F.xxhash64("canon_url").alias("doc_id"),
                F.col("canon_url"),
                F.unix_timestamp(
                    "warc_date", "yyyy-MM-dd'T'HH:mm:ssX"
                ).alias("seq"),
                html_to_text(F.col("text")).alias("text"),
            ).localCheckpoint()  # folds + changelog read it 3x
            boilerplate_partials_batch(
                shaped, epoch_id, bl_state,
                split_pattern=LINE_SPLIT, seq_col="seq",
            )
            probe_and_update(
                shaped, epoch_id, nd_state, pairs_dir,
                seq_col="seq", verify=True, min_score=MIN_SCORE,
            )
            shaped.write.mode("overwrite").parquet(
                os.path.join(changelog, f"epoch={epoch_id}")
            )
            print(f"micro-batch {epoch_id}: "
                  f"{shaped.count()} updated canonical URLs")

        q = (
            winners.writeStream.foreachBatch(fold)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        # ---- the batch reference over the same segments ----
        bdocs = warc_to_documents(read_warc(spark, crawl), with_date=True)
        bgated = robots_gate(bdocs, robots, agent="corpusbot").filter(
            "robots_allowed"
        )
        from kspp_spark.functions.web import latest_capture_per_url

        blatest = latest_capture_per_url(
            bgated, url_col="url", date_col="warc_date",
            tiebreak_col="doc_id",
        )
        live = blatest.select(
            F.xxhash64("canon_url").alias("doc_id"),
            "canon_url",
            "warc_date",
            html_to_text(F.col("text")).alias("text"),
        ).localCheckpoint()

        # 1. LWW end state: stream changelog's last word per URL ==
        #    batch latest-capture (the stale seg2 /a must have lost)
        stream_state = {
            (r.canon_url, r.text)
            for r in spark.read.parquet(changelog)
            .groupBy("canon_url")
            .agg(F.max_by("text", "seq").alias("text"))
            .collect()
        }
        batch_state = {(r.canon_url, r.text) for r in live.collect()}
        assert stream_state == batch_state, "LWW end state diverged"
        a_final = {t for u, t in stream_state if "/a?" in u}
        assert len(a_final) == 1 and "version two marker" in next(iter(a_final))
        print(f"canonical URLs        : {len(stream_state)} "
              "(stale re-crawl correctly lost)")

        # 2. folded boilerplate set == batch recount on the live corpus
        stream_set = {
            r.unit_digest
            for r in boilerplate_set_snapshot(
                spark, bl_state, min_docs=MIN_DOCS
            ).collect()
        }
        bl_batch = boilerplate_units(
            live, split_pattern=LINE_SPLIT, min_docs=MIN_DOCS,
            keep_unit=False,
        )
        assert stream_set == {r.unit_digest for r in bl_batch.collect()}
        print(f"boilerplate units     : {len(stream_set)} (nav + footer)")

        # 3. near-dup pairs: re-scored live stream pairs == batch LSH
        sigs_now = dedup_sigs_snapshot(spark, nd_state + "_sigs")
        raw_pairs = (
            spark.read.parquet(pairs_dir)
            .select("new_id", "dup_of").distinct()
        )
        score = (
            F.size(F.filter(
                F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda m: m,
            )) / F.lit(64.0)
        )
        rescored = (
            raw_pairs
            .join(sigs_now.select(F.col("id").alias("new_id"),
                                  F.col("sig").alias("_sa")), "new_id")
            .join(sigs_now.select(F.col("id").alias("dup_of"),
                                  F.col("sig").alias("_sb")), "dup_of")
            .filter(score >= MIN_SCORE)
        )
        stream_pairs = {
            frozenset((r.new_id, r.dup_of)) for r in rescored.collect()
        }
        bsigs = minhash_signatures(live)
        bver = (
            minhash_candidates(bsigs)
            .join(bsigs.select(F.col("doc_id").alias("a"),
                               F.col("sig").alias("_sa")), "a")
            .join(bsigs.select(F.col("doc_id").alias("b"),
                               F.col("sig").alias("_sb")), "b")
            .filter(score >= MIN_SCORE)
        )
        batch_pairs = {frozenset((r.a, r.b)) for r in bver.collect()}
        assert stream_pairs == batch_pairs, (
            f"pairs diverged: {stream_pairs ^ batch_pairs}"
        )
        ids = {
            u.split("/")[-1].split("?")[0]: i
            for i, u in ((r.doc_id, r.canon_url) for r in live.collect())
        }
        assert stream_pairs == {frozenset((ids["b"], ids["c"]))}
        print(f"near-dup pairs        : {len(stream_pairs)} (b ~ c)")

        # 4. curated output: strip -> Gopher -> drop one pair member
        def curate(bl_set_df, drop_ids):
            cleaned = remove_boilerplate_with_set(
                live, bl_set_df, split_pattern=LINE_SPLIT
            )
            c = gopher_counters("clean_text", stopwords=STOPWORDS)
            return {
                r.doc_id for r in cleaned.filter(gopher_keep(c)).collect()
            } - drop_ids

        curated_stream = curate(
            boilerplate_set_snapshot(spark, bl_state, min_docs=MIN_DOCS),
            {max(p) for p in stream_pairs},
        )
        curated_batch = curate(bl_batch, {max(p) for p in batch_pairs})
        assert curated_stream == curated_batch, "curated output diverged"
        expected = {ids["a"], ids["b"], ids["c"]} - {
            max(ids["b"], ids["c"])
        }
        assert curated_stream == expected  # tiny gated, blocked robots'd
        print(f"curated corpus        : {len(curated_stream)} docs "
              "(streaming == batch)")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
