"""After-the-fact CDC from daily extracts (beyond-reference): the
reference's postgres source reads a keyset window and emits changes
live (postgres_read_cursor.cpp:77-95); when all you have is
yesterday's and today's full extracts, functions/pipeline.
snapshot_diff reconstructs that change stream — then only the
changed/added keys flow into the SCD2 dimension history, and the
removed keys close their intervals as tombstones. The 100-TB point:
the expensive side (history rebuild) touches the CHANGE SET, never
the full snapshot."""

import os

from pyspark.sql import functions as F

from kspp_spark.functions.pipeline import snapshot_diff
from kspp_spark.operators.aggregates import scd2_history
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_snapshot_cdc")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    # two "daily extracts" of the orders dimension, with churn:
    # keys % 89 dropped (deletes), % 97 status-flipped (updates)
    day1 = orders.filter(F.col("o_orderdate") < "1997-01-01")
    day2 = (
        orders.filter(
            (F.col("o_orderdate") < "1997-07-01")
            & (F.col("o_orderkey") % 89 != 0)
        ).withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 97 == 0, F.lit("R")).otherwise(
                F.col("o_orderstatus")
            ),
        )
    )

    diff = snapshot_diff(
        day1, day2, keys=["o_orderkey"],
        compare=["o_orderstatus", "o_totalprice"],
    ).cache()
    diff.groupBy("status").count().orderBy("status").show()

    # change stream: adds/updates carry day2's values; removes are
    # TOMBSTONES (NULL value) — exactly what a live CDC source would
    # have emitted, and scd2_history closes their intervals
    upserts = (
        diff.filter(F.col("status").isin("added", "changed"))
        .join(day2, "o_orderkey")
        .select(
            "o_orderkey", "o_orderstatus",
            F.lit("1997-07-01").cast("timestamp").alias("extract_ts"),
        )
    )
    deletes = diff.filter(F.col("status") == "removed").select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit("1997-07-01").cast("timestamp").alias("extract_ts"),
    )
    seed = day1.select(
        "o_orderkey", "o_orderstatus",
        F.lit("1997-01-01").cast("timestamp").alias("extract_ts"),
    )
    hist = scd2_history(
        seed.unionByName(upserts).unionByName(deletes),
        key="o_orderkey",
        value_cols=["o_orderstatus"],
        event_time="extract_ts",
    )
    n_open = hist.filter(F.col("valid_to").isNull()).count()
    n_closed = hist.filter(F.col("valid_to").isNotNull()).count()
    print(f"-- SCD2 from diffs: {n_open} open versions, {n_closed} closed")
    # updated keys carry two versions (old closed, new open); removed
    # keys carry one CLOSED version (tombstone shut the interval)
    two_ver = (
        hist.groupBy("o_orderkey").count().filter(F.col("count") == 2).count()
    )
    closed_singles = (
        hist.join(
            diff.filter(F.col("status") == "removed"), "o_orderkey", "left_semi"
        )
        .filter(F.col("valid_to").isNotNull())
        .count()
    )
    print(f"-- keys with a version flip: {two_ver}; "
          f"tombstone-closed: {closed_singles}")


if __name__ == "__main__":
    main()
