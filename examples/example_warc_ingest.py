"""Raw crawl to curation-ready corpus (beyond-reference): WARC
segments (ISO 28500, the Common Crawl container) -> distributed
record parse -> HTTP body extraction -> robots.txt compliance gate
(RFC 9309) -> URL-level dedup (canonical form, latest capture wins)
-> HTML -> text -> the text curation tiers' front door.

The WARC segments here are synthesized in-script (this sandbox has no
crawl), exercising the real read path: plain + member-per-record gzip
files, one file per task, payloads never on the driver."""

import gzip
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from kspp_spark.functions.text import gopher_counters, gopher_keep
from kspp_spark.functions.robots import robots_gate
from kspp_spark.functions.web import (
    cdx_index,
    html_to_text,
    latest_capture_per_url,
)
from kspp_spark.session import get_spark
from kspp_spark.sources.warc import read_warc, warc_to_documents


def _record(headers: dict, block: bytes) -> bytes:
    h = "".join(f"{k}: {v}\r\n" for k, v in headers.items())
    return (
        b"WARC/1.0\r\n" + h.encode()
        + f"Content-Length: {len(block)}\r\n\r\n".encode()
        + block + b"\r\n\r\n"
    )


def _response(uri: str, date: str, body: str) -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body.encode()
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


PAGE = (
    "the quick brown fox jumps over the lazy dog while birds watch "
    "from above and a small animal hides under thick roots near the "
    "old stone wall by a winding river as the evening sun sets slowly "
    "behind tall green quiet hills and all of the forest goes still "
)


def main() -> None:
    spark = get_spark("example_warc_ingest")
    crawl = tempfile.mkdtemp(prefix="warc_demo_")
    try:
        # two segments; /a is re-crawled under a trivially-different
        # URL (param order + default port) with NEWER content
        seg0 = _response(
            "http://site.example.com/a?x=1&y=2",
            "2026-01-01T00:00:00Z", PAGE * 2 + "OLD CAPTURE",
        ) + _response(
            "http://site.example.com/b", "2026-01-01T00:00:00Z", PAGE * 2
        )
        seg1 = _response(
            "http://site.EXAMPLE.com:80/a?y=2&x=1",
            "2026-02-01T00:00:00Z", PAGE * 2 + "NEW CAPTURE",
        ) + _response(
            "http://site.example.com/tiny", "2026-02-01T00:00:00Z", "too short"
        )
        with open(os.path.join(crawl, "seg-00000.warc"), "wb") as f:
            f.write(seg0)
        with open(os.path.join(crawl, "seg-00001.warc.gz"), "wb") as f:
            f.write(gzip.compress(seg1))

        records = read_warc(spark, crawl)
        print(f"response records      : {records.count()}")

        # CDX-style capture index: surt-keyed, range-partitioned,
        # sorted within partitions — the archive lookup layout (a
        # domain's captures cluster contiguously; at scale this is
        # the parquet layout per-domain reads prune on)
        cdx = cdx_index(
            records.select(F.col("target_uri").alias("url"), "warc_date"),
            num_partitions=2,
        )
        keys = [r.surt for r in cdx.collect()]
        print(f"cdx index             : {len(keys)} captures, "
              f"first key {keys[0]}")
        assert all(k.startswith("com,example,site)") for k in keys)

        docs = warc_to_documents(records).join(
            records.select(
                F.col("target_uri").alias("url"), "warc_date"
            ).distinct(),
            "url",
        )
        # robots.txt compliance first (RFC 9309): the crawl captured
        # a policy disallowing /b for everyone
        robots = spark.createDataFrame(
            [("site.example.com", "User-agent: *\nDisallow: /b\n")],
            "domain string, robots_txt string",
        )
        permitted = robots_gate(docs, robots, agent="corpusbot").filter(
            "robots_allowed"
        )
        print(
            f"robots-permitted      : {permitted.count()} of {docs.count()} "
            "captures (/b disallowed)"
        )

        latest = latest_capture_per_url(
            permitted, url_col="url", date_col="warc_date", tiebreak_col="doc_id"
        )
        n_urls = latest.count()
        print(f"canonical URLs        : {n_urls}")
        winner = latest.filter(F.col("canon_url").contains("/a?")).first()
        assert winner.n_captures == 2 and "NEW CAPTURE" in winner.text
        assert latest.filter(F.col("canon_url").contains("/b")).count() == 0

        # HTML -> text (JVM regexp chain), then the quality gate
        extracted = latest.withColumn("text", html_to_text(F.col("text")))
        c = gopher_counters("text", stopwords=["the", "a", "of", "and", "to"])
        kept = extracted.filter(gopher_keep(c))
        print(f"pass the quality gate : {kept.count()} (the 'tiny' page drops)")
        assert kept.count() == 1  # /a survives; /b robots-blocked, tiny gated
    finally:
        shutil.rmtree(crawl, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
