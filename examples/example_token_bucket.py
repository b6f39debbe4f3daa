"""Per-key token-bucket rate limiting — the reference's
example7-token-bucket (admit within capacity, count rejections)."""

import os

from pyspark.sql import functions as F

from kspp_spark.session import get_spark
from kspp_spark.streaming.stateful import rate_limit_batch

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_token_bucket")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("value"),
        F.col("ts").alias("event_time"),
    )
    total = events.count()
    # capacity 3, one token per day: a month of per-user traffic gets
    # throttled to ~capacity + elapsed_days admissions
    admitted = rate_limit_batch(
        events, key="key", event_time="event_time",
        filltime_ms=86_400_000, capacity=3,
    ).count()
    print(f"events   : {total}")
    print(f"admitted : {admitted}")
    print(f"rejected : {total - admitted}")
    spark.stop()


if __name__ == "__main__":
    main()
