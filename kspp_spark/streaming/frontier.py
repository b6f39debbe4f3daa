"""Streaming crawl-frontier discovery — the continuous face of the
batch frontier chain (robots Sitemap seeds -> sitemap parses ->
outlink extraction -> canonical keys -> anti-join seen set, see
examples/example_frontier.py and the sitemap_frontier graded query).

A frontier's contract is FIRST-seen-wins: every canonical URL is
emitted exactly once, the first time ANY source (a sitemap entry, an
outlink, a seed list) discovers it — the dual of
web.crawl_dedup_stream's latest-capture LWW. In Structured Streaming
that is exactly stateful dropDuplicates on the canonical key: the
seen set IS the state, one fixed-width row per canonical URL, and it
is unbounded BY DESIGN (a frontier remembers what it crawled; use the
RocksDB state-store provider — kspp_spark.streaming.core's session
default — for crawl-scale key counts, and the documented state-store
snapshot/compaction machinery for retention policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kspp_spark.functions.web import canonicalize_url, surt_key


def frontier_stream(
    discovered: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Discovered-URL stream -> the new-frontier stream: canonicalize
    (so trivially-different variants collapse BEFORE touching state),
    stateful first-seen dedup on the canonical key, then the surt key
    for downstream queue range-ordering. Append output mode — each
    canonical URL is emitted in exactly one micro-batch, ever.

    The canonicalization runs map-side BEFORE dropDuplicates, so the
    state key width is the canonical URL and permuted-param /
    default-port / fragment re-discoveries of a known page cost a
    state LOOKUP, not a state row."""
    keyed = discovered.withColumn("canon_url", canonicalize_url(url_col))
    first_seen = keyed.dropDuplicates(["canon_url"])
    return first_seen.withColumn("surt", surt_key(F.col("canon_url")))
