"""The kspp join golden vectors (test8_join.cpp:133-354) as a
runnable walkthrough: changelogs with (key, value, event_time) where a
NULL value is a tombstone. The stream-table replay pairs each stream
event with the table's LWW state AT that event; the table-table
replays emit on BOTH sides' changes with old-semantics tombstones."""

import os

from pyspark.sql import functions as F

from kspp_spark.operators.joins import (
    changelog_stream_table_join,
    changelog_table_table_join,
)
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def changelog(spark, rows):
    df = spark.createDataFrame(rows, "key string, value string, t int")
    sec = F.lpad(F.col("t").cast("string"), 2, "0")
    return df.select(
        "key",
        "value",
        F.concat(F.lit("2024-01-01 00:00:"), sec).cast("timestamp").alias("event_time"),
    )


def main() -> None:
    spark = get_spark("example_join_semantics")
    # stream: two events for A (before/after the table update), one for B
    stream = changelog(spark, [("A", "s1", 1), ("B", "s2", 2), ("A", "s3", 5)])
    # table changelog: A set then updated; B set then DELETED (tombstone)
    table = changelog(
        spark, [("A", "a1", 0), ("B", "b1", 0), ("B", None, 3), ("A", "a2", 4)]
    )

    print("-- kstream-ktable left (misses kept, state as-of the event)")
    changelog_stream_table_join(stream, table, how="left").orderBy(
        "event_time", "key"
    ).show(truncate=False)
    print("-- kstream-ktable inner (misses dropped)")
    changelog_stream_table_join(stream, table, how="inner").orderBy(
        "event_time", "key"
    ).show(truncate=False)
    for how in ("left", "inner", "outer"):
        print(f"-- ktable-ktable {how} (emits on both sides' changes)")
        changelog_table_table_join(stream, table, how=how).orderBy(
            "event_time", "key"
        ).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
