"""Windowed table with retention + expiry tombstones — the reference's
mem_windowed_store (example8-ktable-mem analog): latest value per key
per time slot, slots beyond the retention horizon expire and emit
tombstones downstream (mem_windowed_store.h:89-101)."""

import os

from pyspark.sql import functions as F

from kspp_spark.session import get_spark
from kspp_spark.streaming.stateful import windowed_table_stream

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_windowed_ktable")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # batch face: latest value per (user, day slot)
    day = F.date_trunc("day", F.col("ts"))
    payload = F.struct("ts", "event_id", "event_type", "value")
    table = (
        ev.groupBy(day.alias("window_start"), "user_id")
        .agg(F.max(payload).alias("_w"))
        .select("window_start", "user_id", F.col("_w.value").alias("value"))
    )
    print("-- windowed ktable (latest per key per day slot)")
    table.orderBy("window_start", "user_id").show(5, truncate=False)

    # retention: keep only the N most-recent slots (drop-on-insert of
    # older data, mem_windowed_store.h:132-135)
    horizon = table.agg(
        F.date_sub(F.max("window_start"), 7).alias("h")
    ).collect()[0]["h"]
    kept = table.filter(F.col("window_start") >= F.lit(horizon))
    print(f"-- after 7-day retention: {kept.count()} of {table.count()} rows")
    print(
        "   (streaming form with expiry tombstones:"
        f" {windowed_table_stream.__module__}."
        f"{windowed_table_stream.__name__})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
