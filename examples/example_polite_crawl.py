"""Per-host crawl politeness (beyond-reference composition): the
reference's token-bucket rate limiter (rate_limiter.h:12-87, the kspp
core primitive) applied per HOST with each host's own robots.txt
Crawl-delay as the refill rate — the piece that turns a frontier
(example_frontier.py) into a polite fetch schedule.

    1. robots.txt per host -> crawl_delay(body, agent) seconds
       (group selection mirrors allow/disallow; smallest wins)
    2. delay -> token bucket: capacity 1, one token per delay
       (rate_limiter.h semantics: accept if a token is available,
       else drop — dropped fetches requeue next cycle)
    3. rate_limit_batch keyed by host: deterministic per-key replay
       ordered by request time; hosts sharing a delay value run in
       one limiter pass (few delay classes; each pass is one
       applyInPandas over its keys)

Hosts without a Crawl-delay fall back to a default politeness. The
limiter is the SAME operator the reference applies to Kafka streams —
one state row per key, Arrow-batched replay, no driver loop; see
rate_limit_stream for the continuous form.
"""

import datetime

from pyspark.sql import functions as F

from kspp_spark.functions.robots import parse_robots_meta
from kspp_spark.functions.web import url_host
from kspp_spark.session import get_spark
from kspp_spark.streaming.stateful import rate_limit_batch

ROBOTS = {
    "slow.example.com": "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n",
    "fast.example.com": "User-agent: *\nCrawl-delay: 1\n",
    "nolimit.example.com": "User-agent: *\nDisallow: /private\n",
}
DEFAULT_DELAY_S = 2.0
AGENT = "corpusbot"


def main() -> None:
    spark = get_spark("example_polite_crawl")

    # 1. per-host delay via the Arrow parse path (parse_robots_meta
    #    — the corpus-scale form; robots bodies parse executor-side).
    #    Only the tiny (host, delay) frame is collected, and only to
    #    build the delay CLASSES below — a bounded per-domain control
    #    plane, never the URL stream.
    robots_df = spark.createDataFrame(
        list(ROBOTS.items()), "domain string, robots_txt string"
    )
    meta = parse_robots_meta(robots_df, AGENT)
    delays = {
        r.domain: (
            r.crawl_delay if r.crawl_delay is not None else DEFAULT_DELAY_S
        )
        for r in meta.select("domain", "crawl_delay").collect()
    }
    print(f"crawl delays         : {delays}")
    assert delays["slow.example.com"] == 10.0
    assert delays["nolimit.example.com"] == DEFAULT_DELAY_S

    # 2. a burst of frontier URLs: 1 per second per host for 30s
    t0 = datetime.datetime(2026, 3, 1, 0, 0, 0)
    rows = []
    for s in range(30):
        for h in ROBOTS:
            rows.append(
                (f"https://{h}/page{s}", t0 + datetime.timedelta(seconds=s))
            )
    reqs = spark.createDataFrame(
        rows, "url string, req_time timestamp"
    ).withColumn("host", url_host("url"))

    # 3. one token bucket per host; refill = 1 token / delay. Hosts
    #    sharing a delay class share a limiter pass.
    accepted = None
    for delay_s in sorted({*delays.values()}):
        hosts = [h for h, v in delays.items() if v == delay_s]
        limited = rate_limit_batch(
            reqs.filter(F.col("host").isin(hosts)),
            key="host",
            event_time="req_time",
            filltime_ms=int(delay_s * 1000),
            capacity=1,
        )
        accepted = limited if accepted is None else accepted.unionByName(limited)

    per_host = {
        r.host: r.n
        for r in accepted.groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"accepted per host    : {per_host}")
    # 30s of 1/s requests: delay 10 -> 3-4 accepted, delay 1 -> all
    # 30, default 2.0 -> 15-16
    assert per_host["fast.example.com"] == 30
    assert 3 <= per_host["slow.example.com"] <= 4
    assert 15 <= per_host["nolimit.example.com"] <= 16
    print("polite schedule      : token bucket per host, reference semantics")
    spark.stop()


if __name__ == "__main__":
    main()
