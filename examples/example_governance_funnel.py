"""Release governance + conversion pipeline (round-11 tier,
beyond-reference): before a dataset or feature ships, a pipeline
answers four questions the reference leaves to bespoke processors —
each here is one declarative, integer-exact operator:

  can we release it?       k_anonymity_audit (quasi-identifier
                           classes with n < k re-identification risk)
  did the data shift?      categorical_drift / numeric_drift (exact
                           TVD ppm + order-fixed X^2 — no ln(), so
                           the audit hash-replays in SQL)
  do users convert?        funnel_stages / funnel_counts (greedy-
                           earliest view -> click -> purchase with a
                           horizon; == the min-after-min SQL chain)
  which results ship?      rrf_fuse (Reciprocal Rank Fusion with
                           exact integer 1e9 DIV (k+rank) terms —
                           hybrid retrieval without score calibration)

plus the range lookup that would naively plan as a nested-loop join:
interval_join grid-buckets `p BETWEEN lo AND hi` into a hash
equi-join (provably lossless — floor is monotone).

The same computations run as graded, hash-certified driver queries
(k_anonymity, category_drift, numeric_drift, funnel_stages,
funnel_conversion, rrf_fusion, range_bucket_join)."""

import os

from pyspark.sql import Window as W, functions as F

from kspp_spark.functions.pipeline import (
    categorical_drift,
    k_anonymity_audit,
)
from kspp_spark.functions.sessions import funnel_counts
from kspp_spark.functions.similarity import rrf_fuse
from kspp_spark.io import load
from kspp_spark.operators.joins import interval_join
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_governance_funnel")
    cust = load(spark, "customer", SF_DIR)
    orders = load(spark, "orders", SF_DIR)
    ev = load(spark, "events", SF_DIR)
    docs = load(spark, "documents", SF_DIR)

    # -- privacy pre-flight ------------------------------------------
    audit = k_anonymity_audit(
        cust, quasi_cols=["c_nationkey", "c_mktsegment"], k=5
    )
    risky = audit.where("at_risk")
    print(f"k-anonymity: {risky.count()} at-risk classes of {audit.count()}")

    # -- drift monitor: order-priority mix across halves --------------
    drift = categorical_drift(
        orders.filter(F.col("o_orderdate") < F.lit("1997-01-01")),
        orders.filter(F.col("o_orderdate") >= F.lit("1997-01-01")),
        col="o_orderpriority",
    )
    tvd_ppm = drift.agg(F.sum("tvd_num_ppm")).first()[0]
    print(f"priority-mix 2*TVD = {tvd_ppm} ppm")
    drift.orderBy(F.desc("tvd_num_ppm")).show(5, truncate=False)

    # -- conversion funnel ---------------------------------------------
    funnel_counts(
        ev, steps=["view", "click", "purchase"], horizon="48 hours"
    ).orderBy("stage").show(truncate=False)

    # -- hybrid ranking fusion ----------------------------------------
    scored = docs.select(
        "doc_id", "lang",
        F.size(F.split("text", r"\s+")).alias("n_tok"),
        F.length("text").alias("n_chr"),
    )
    wa = W.partitionBy("lang").orderBy(F.col("n_tok").desc(), "doc_id")
    wb = W.partitionBy("lang").orderBy(F.col("n_chr").desc(), "doc_id")
    ra = scored.select(
        F.col("lang").alias("query_id"), "doc_id",
        F.row_number().over(wa).alias("rank"),
    ).where("rank <= 10")
    rb = scored.select(
        F.col("lang").alias("query_id"), "doc_id",
        F.row_number().over(wb).alias("rank"),
    ).where("rank <= 10")
    rrf_fuse([ra, rb], top_n=3).orderBy("query_id", "fused_rank").show(
        9, truncate=False
    )

    # -- range lookup as a hash join ----------------------------------
    bands = load(spark, "supplier", SF_DIR).select(
        "s_suppkey",
        (F.col("s_acctbal") - 100).alias("lo"),
        (F.col("s_acctbal") + 100).alias("hi"),
    )
    pts = cust.select("c_custkey", "c_acctbal")
    matched = interval_join(
        pts, bands, point_col="c_acctbal", lo_col="lo", hi_col="hi",
        cell=500.0,
    )
    print(f"balance-band matches: {matched.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
