"""Stream-table join with throughput report — the reference's
example2-join (load a ktable, join a stream against it, print
rows/sec)."""

import os
import time

from pyspark.sql import functions as F

from kspp_spark.operators.aggregates import ktable
from kspp_spark.operators.joins import kstream_left_join
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_join")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customers = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    t0 = time.time()
    table = ktable(
        customers.select(
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("value"),
            F.lit("2024-01-01").cast("timestamp").alias("event_time"),
        ),
        key="key",
        value_cols=["value"],
    )
    n_table = table.count()
    t1 = time.time()
    print(f"table rows : {n_table}")
    print(f"load s     : {t1 - t0:.2f}")

    stream = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_totalprice").alias("value"),
        F.col("o_orderdate").cast("timestamp").alias("event_time"),
    )
    joined = kstream_left_join(stream, table.withColumnRenamed("value", "name"), "key")
    n = joined.count()
    t2 = time.time()
    print(f"joined rows: {n}")
    print(f"joins/sec  : {n / max(t2 - t1, 1e-9):,.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
