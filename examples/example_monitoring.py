"""Monitoring tier end-to-end (beyond-reference): the daily-spend
series through the round-12/13 monitor stack — EWMA smoothing, CUSUM
changepoints, median/MAD robust outliers, Theil-Sen robust trend —
all integer-exact / engine-portable forms, plus the streaming-twin
pointer (ewma_stream/cusum_stream share these finalizes verbatim;
tests/test_streaming.py asserts trigger-boundary invisibility)."""

import os

from pyspark.sql import functions as F

from kspp_spark.functions.timeseries import (
    cusum_changepoints,
    ewma,
    mad_outliers,
    theil_sen_trend,
)
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_monitoring")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )

    print("== EWMA (alpha=0.3, window 8) ==")
    ewma(daily, ("event_type",), "d", "cents").orderBy(
        "event_type", "d"
    ).show(5)

    print("== CUSUM changepoints (slack 500, threshold 50k cents) ==")
    cu = cusum_changepoints(
        daily, ("event_type",), "d", "cents", slack=500, threshold=50_000
    )
    cu.where("alarm").orderBy("event_type", "d").show(5)
    print("alarm days:", cu.where("alarm").count())

    print("== median/MAD robust outliers (Hampel 3-sigma-equiv) ==")
    mo = mad_outliers(daily, ("event_type",), "cents")
    mo.where("outlier").orderBy("event_type", "d").show(5)
    print("flagged days:", mo.where("outlier").count())

    print("== Theil-Sen robust trend (micro-cents/day) ==")
    theil_sen_trend(daily, ("event_type",), "d", "cents").orderBy(
        "event_type"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
