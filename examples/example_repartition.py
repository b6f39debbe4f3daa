"""Foreign-key repartition — the reference's example5-repartition /
test6_repartition: route a keyed stream by a DIFFERENT key looked up
from a routing table (repartition.h:9-101; records without a routing
entry are dropped, :64-73). On Spark the re-route is a broadcast
lookup + repartition on the foreign key — downstream per-key work then
co-locates by the FK."""

import os

from pyspark.sql import functions as F

from kspp_spark.operators.stateless import repartition_by_foreign_key
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_repartition")
    # stream keyed by order, routing table order -> customer
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    stream = orders.select(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("value")
    )
    routing = orders.sample(0.8, seed=7).select(
        F.col("o_orderkey").alias("key"), F.col("o_custkey").alias("fk")
    )
    routed = repartition_by_foreign_key(stream, routing, key="key", fk="fk")
    n_in, n_out = stream.count(), routed.count()
    print(f"records in : {n_in}")
    print(f"routed out : {n_out} (unrouted dropped, repartition.h:64-73)")
    per_fk = routed.groupBy("fk").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    print("per-customer totals after re-keying:")
    per_fk.orderBy(F.col("n").desc()).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
