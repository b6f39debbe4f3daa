"""Streaming frontier discovery: first-seen-wins semantics across
micro-batches, canonical-key state width, and batch/stream agreement."""

import pytest

from pyspark.sql import functions as F

from kspp_spark.streaming.frontier import frontier_stream

SCHEMA = "url string, via string"


@pytest.fixture
def in_dir(tmp_path):
    return str(tmp_path / "frontier_in")


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_frontier_stream_first_seen_across_batches(spark, in_dir):
    """Two micro-batches (maxFilesPerTrigger=1): batch 1 discovers /a
    (sitemap) and /b; batch 2 RE-discovers /a under a trivially-
    different variant (param order + default port + fragment) via an
    outlink, plus new /c. The frontier must emit /a exactly once —
    the variant collapses onto the canonical state key — and emit /c
    from batch 2. Append mode: nothing is ever re-emitted."""
    _write(
        spark,
        in_dir,
        [
            ("https://shop.example.com/a?x=1&y=2", "sitemap"),
            ("https://shop.example.com/b", "sitemap"),
        ],
    )
    _write(
        spark,
        in_dir,
        [
            ("https://SHOP.example.com:443/a?y=2&x=1#frag", "outlink"),
            ("https://shop.example.com/c", "outlink"),
        ],
    )
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = frontier_stream(src)
    q = (
        out.writeStream.format("memory")
        .queryName("frontier_t1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2  # genuinely two micro-batches
    rows = spark.sql("SELECT * FROM frontier_t1").collect()
    got = {r.canon_url: r for r in rows}
    assert len(rows) == 3 and len(got) == 3, rows
    assert set(got) == {
        "https://shop.example.com/a?x=1&y=2",
        "https://shop.example.com/b",
        "https://shop.example.com/c",
    }
    # first discovery wins: /a came from the sitemap batch
    assert got["https://shop.example.com/a?x=1&y=2"].via == "sitemap"
    assert all(r.surt.startswith("com,example,shop)") for r in rows)


def test_frontier_stream_matches_batch_anti_join(spark, in_dir):
    """Stream/batch equivalence: the streaming frontier over all
    batches equals the batch canonical-distinct (first row per key in
    discovery order is implementation detail; the KEY SET is the
    contract)."""
    rows1 = [(f"https://s.ex.com/p{i}?b=2&a=1", "seed") for i in range(10)]
    rows2 = [
        (f"https://s.ex.com/p{i}/?a=1&b=2", "re") for i in range(5)
    ] + [(f"https://s.ex.com/q{i}", "new") for i in range(4)]
    _write(spark, in_dir, rows1)
    _write(spark, in_dir, rows2)
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        frontier_stream(src)
        .writeStream.format("memory")
        .queryName("frontier_t2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_keys = {
        r.canon_url for r in spark.sql("SELECT * FROM frontier_t2").collect()
    }
    from kspp_spark.functions.web import canonicalize_url

    batch_keys = {
        r.k
        for r in spark.createDataFrame(rows1 + rows2, SCHEMA)
        .select(canonicalize_url("url").alias("k"))
        .distinct()
        .collect()
    }
    assert stream_keys == batch_keys
    # p0..p9 trailing-slash re-discoveries collapsed; q0..q3 new
    assert len(stream_keys) == 14


TTL_SCHEMA = "url string, via string, ts timestamp"


def _write_ts(spark, path, rows):
    spark.createDataFrame(rows, TTL_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_frontier_stream_ttl_reemits_after_horizon(spark, tmp_path):
    """The TTL'd contract: a canonical URL re-emits once the
    watermark passes its sighting + horizon, and NOT for
    re-discoveries inside the horizon. 10-minute horizon; four
    micro-batches:
      b1  A @ 10:00            -> emits (first seen)
      b2  A @ 10:05 (+filler)  -> DROPPED (inside horizon)
      b3  filler @ 10:30       -> max event time now past A's expiry
      b4  filler @ 10:31       -> wm (10:20) > expiry: A's state evicts
      b5  A @ 11:00            -> EMITS again (state gone)
    (b4 exists because the watermark for batch N comes from batch
    N-1's max event time, and eviction runs at batch completion — so
    the batch AFTER the advancing one is the first whose eviction
    pass can drop the key.) The unbounded frontier_stream would emit
    A exactly once."""
    import datetime as dt

    from kspp_spark.streaming.frontier import frontier_stream_ttl

    t = lambda m: dt.datetime(2026, 3, 1, 10, 0, 0) + dt.timedelta(minutes=m)
    in_dir = str(tmp_path / "ttl_in")
    a = "https://shop.example.com/a"
    _write_ts(spark, in_dir, [(a, "b1", t(0))])
    _write_ts(
        spark,
        in_dir,
        [(a + "?", "b2", t(5)), ("https://shop.example.com/f1", "b2", t(5))],
    )
    _write_ts(spark, in_dir, [("https://shop.example.com/f2", "b3", t(30))])
    _write_ts(spark, in_dir, [("https://shop.example.com/f3", "b4", t(31))])
    _write_ts(spark, in_dir, [(a + "#x", "b5", t(60))])
    src = (
        spark.readStream.schema(TTL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        frontier_stream_ttl(src, "10 minutes")
        .writeStream.format("memory")
        .queryName("frontier_ttl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 5
    rows = spark.sql("SELECT * FROM frontier_ttl").collect()
    a_rows = sorted(
        (r.via for r in rows if r.canon_url == a)
    )
    # emitted at first sight and after expiry; the in-horizon
    # re-discovery (b2) was deduplicated against state
    assert a_rows == ["b1", "b5"], rows
    assert {r.canon_url for r in rows} == {
        a,
        "https://shop.example.com/f1",
        "https://shop.example.com/f2",
        "https://shop.example.com/f3",
    }
    assert all(r.surt.startswith("com,example,shop)") for r in rows)
