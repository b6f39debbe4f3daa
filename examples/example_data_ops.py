"""Data-ops toolkit over a fact table (beyond-reference): the jobs a
100-TB platform team runs around the queries, not inside them —

  is the copy identical?     table_checksum (order-independent
                             fingerprint: compare two sides' tuples,
                             never sort either)
  did the schema drift?      profile_columns (one-pass null /
                             distinct / min-max audit)
  can I afford this join?    cms_join_size (Count-Min inner-product
                             output-size estimate, before running it)
  what sells together?       cooccurrence_scores (PMI + cosine
                             affinity as exact integer ratios)

All four are graded driver queries (table_checksum, profile_columns,
join_size_estimate, item_associations) with DuckDB replay oracles."""

import os

from pyspark.sql import functions as F

from kspp_spark.functions.cooccurrence import cooccurrence_scores
from kspp_spark.functions.pipeline import profile_columns, table_checksum
from kspp_spark.functions.sketch import cms_build, cms_join_size
from kspp_spark.io import load
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_data_ops")
    li = load(spark, "lineitem", SF_DIR)
    orders = load(spark, "orders", SF_DIR)

    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    print("=== copy verification ===")
    fp = table_checksum(li, cols=cols)
    fp.show(truncate=False)
    # a re-partitioned 'copy' fingerprints identically...
    copy_fp = table_checksum(li.repartition(13), cols=cols)
    same = fp.collect() == copy_fp.collect()
    print(f"repartitioned copy identical: {same}")
    # ...a corrupted one does not
    bad = li.withColumn(
        "l_suppkey",
        F.when(F.col("l_orderkey") == 7, F.col("l_suppkey") + 1).otherwise(
            F.col("l_suppkey")
        ),
    )
    diff = fp.collect() != table_checksum(bad, cols=cols).collect()
    print(f"single-cell corruption detected: {diff}")

    print("=== schema-drift profile (orders) ===")
    profile_columns(
        orders, cols=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]
    ).show(truncate=False)

    print("=== pre-flight join-size estimate ===")
    k = li.select(F.col("l_partkey").alias("k"))
    sk = cms_build(k, "k", width=256, depth=4)
    est = cms_join_size(sk, sk, depth=4).collect()[0]["est_join_size"]
    true = (
        k.groupBy("k").count().agg(F.sum(F.col("count") * F.col("count")))
    ).collect()[0][0]
    print(f"self-join on l_partkey: estimated {est}, true {true} "
          f"(one-sided: est >= true)")

    print("=== co-purchase associations (top PMI) ===")
    cooccurrence_scores(li, "l_orderkey", "l_partkey", min_pairs=2).orderBy(
        F.desc("pmi_ratio_ppm")
    ).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
