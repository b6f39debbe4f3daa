"""Corpus monitoring with mergeable sketches (beyond-reference): the
reference's counter stores answer frequency/cardinality questions
with one counter row per key (mem_counter_store.h:8-144) — state
linear in key cardinality. The sketch tier answers the same three
production questions in bounded state, one scan each:

  how often?   Count-Min estimate (never under, bounded over)
  how many?    HyperLogLog cardinality (~1.04/sqrt(m) error,
               registers merge losslessly across days/sources)
  who's hot?   EXACT heavy hitters via the two-pass CMS prune

All three are deterministic md5-family sketches: approximate with
respect to truth, exact with respect to the algorithm — the graded
queries replay them bit-for-bit in DuckDB."""

import os

from pyspark.sql import functions as F

from kspp_spark.functions.sketch import (
    cms_build,
    cms_estimate,
    heavy_hitters,
    hll_corrected,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_sketches")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    # -- how many distinct customers ordered, per priority? --------
    # build per-month sub-sketches (the per-slice pattern a 100-TB
    # pipeline uses), merge losslessly, estimate + correct
    monthly = hll_registers(
        orders.withColumn("mon", F.date_format("o_orderdate", "yyyy-MM")),
        col="o_custkey",
        group_cols=("o_orderpriority", "mon"),
        p=9,
    )
    merged = hll_merge(monthly, group_cols=("o_orderpriority",))
    est = hll_estimate(merged, group_cols=("o_orderpriority",), p=9)
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact")
    )
    print("-- HLL distinct customers per priority (merged monthly sketches)")
    for r in est.join(exact, "o_orderpriority").orderBy("o_orderpriority").collect():
        corr = hll_corrected(r["est"], r["zero_regs"], p=9)
        print(f"   {r['o_orderpriority']:<16} raw={r['est']:<5} "
              f"corrected={corr:8.1f} exact={r['exact']}")

    # -- how often does each part ship? ----------------------------
    sketch = cms_build(lineitem, col="l_partkey", width=256, depth=4)
    probe = lineitem.select("l_partkey").distinct().limit(5)
    print("-- Count-Min point estimates (one-sided: est >= true)")
    truth = lineitem.groupBy("l_partkey").count()
    for r in (
        cms_estimate(sketch, probe, col="l_partkey", width=256, depth=4)
        .join(truth, "l_partkey")
        .collect()
    ):
        assert r["est"] >= r["count"]
        print(f"   part {r['l_partkey']}: est={r['est']} true={r['count']}")

    # -- which parts are HOT, exactly? -----------------------------
    hh = heavy_hitters(lineitem, col="l_partkey", min_count=40,
                       width=256, depth=4)
    n = hh.count()
    top = hh.orderBy(F.desc("cnt")).limit(3).collect()
    print(f"-- exact heavy hitters (>=40 shipments): {n} parts; "
          f"top: {[(r['l_partkey'], r['cnt']) for r in top]}")


if __name__ == "__main__":
    main()
