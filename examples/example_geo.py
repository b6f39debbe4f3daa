"""Spatial tier end-to-end (beyond-reference): integer projected
coordinates through the grid primitives — radius join (ST_DWithin),
radius-capped kNN, hotspot screen, kNN majority label vote — all
trig-free grid-cell relational algebra (project first), integer-exact,
never a cross product (plan-pinned in tests/test_plans.py)."""

import os

from pyspark.sql import functions as F

from kspp_spark.functions.geo import grid_hotspots, knn_label_vote
from kspp_spark.operators.joins import knn_radius_join, radius_join
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_geo")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 2654435761) % 1000000).cast("long").alias("x"),
        ((F.col("c_custkey") * 40503 + 7) % 1000000).cast("long").alias("y"),
    )
    labels = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("label"),
    )

    print("== radius join (pairs within 50k units) ==")
    pairs = radius_join(pts, None, radius=50000)
    print("pairs:", pairs.count())

    print("== capped kNN (3 nearest within 50k) ==")
    knn_radius_join(pts, None, k=3, radius=50000).orderBy(
        "a", "rk"
    ).show(6)

    print("== grid hotspots (50k cells, 3x3 neighborhood ratio) ==")
    grid_hotspots(pts, cell_size=50000).orderBy(
        F.desc("score_ppm")
    ).show(5)

    print("== kNN majority segment vote ==")
    votes = knn_label_vote(pts, labels, k=5, radius=50000)
    votes.groupBy("voted_label").count().orderBy("voted_label").show()

    spark.stop()


if __name__ == "__main__":
    main()
