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
is unbounded BY DESIGN (a frontier remembers what it crawled). For
crawl-scale key counts, opt the session into the RocksDB state-store
provider EXPLICITLY — call kspp_spark.streaming.core.use_rocksdb_state
(spark) before starting the query; the session default is the
HDFS-backed heap store, which an unbounded seen set will eventually
exhaust. Callers who want TTL'd re-discovery instead of a permanent
seen set should use frontier_stream_ttl below.
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


def frontier_stream_ttl(
    discovered: DataFrame,
    horizon: str,
    url_col: str = "url",
    ts_col: str = "ts",
) -> DataFrame:
    """The TTL'd frontier: same canonicalize-before-state first-seen
    dedup, but the seen set EXPIRES — a canonical URL re-emits (gets
    re-discovered and re-crawled) once `horizon` of event time has
    passed since its last retained sighting, and not before. State is
    BOUNDED: dropDuplicatesWithinWatermark evicts each key when the
    watermark passes its event time + horizon, so steady-state state
    size is (discovery rate x horizon), independent of crawl lifetime.

    Which contract to use:
      * frontier_stream — a crawl LEDGER: each page fetched exactly
        once, ever. Correct for one-shot corpus construction; state
        grows with the corpus (use use_rocksdb_state).
      * frontier_stream_ttl — a RE-CRAWL schedule: horizon = the
        freshness interval (e.g. '30 days'); correct for continuous
        crawling where pages must be revisited and state must not
        grow without bound.

    `ts_col` is the discovery event time (timestamp); `horizon` any
    Spark interval string. Late discoveries older than the watermark
    are dropped by the watermark itself, as in every watermarked op."""
    keyed = discovered.withColumn("canon_url", canonicalize_url(url_col))
    first_seen = keyed.withWatermark(
        ts_col, horizon
    ).dropDuplicatesWithinWatermark(["canon_url"])
    return first_seen.withColumn("surt", surt_key(F.col("canon_url")))
