"""Warehouse + retrieval surfaces in one pass (beyond-reference):
SCD2 dimension history with a point-in-time lookup join, then a
materialized positional index serving phrase search and BM25 without
re-scanning the corpus."""

import os
import tempfile

from pyspark.sql import functions as F

from kspp_spark.functions.text import (
    bm25_indexed,
    doc_lengths,
    phrase_search_indexed,
    positional_index,
)
from kspp_spark.operators.aggregates import scd2_history, scd2_lookup_join
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_scd2_retrieval")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # SCD2: every signup event becomes a dimension version with its
    # validity interval; purchases look up the version AT their ts
    chg = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("value").alias("dim_value"), "ts", "event_id"
    )
    hist = scd2_history(
        chg, key="user_id", value_cols=["dim_value"], event_time="ts",
        seq="event_id",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("fact_id"), "user_id", "ts"
    )
    looked = scd2_lookup_join(
        facts, hist, key="user_id", fact_time="ts", broadcast_history=True
    )
    print(f"-- SCD2: {hist.count()} versions; {looked.count()} facts matched")
    looked.orderBy("fact_id").show(5, truncate=False)

    # retrieval: materialize the positional index once, query it twice
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with tempfile.TemporaryDirectory() as d:
        positional_index(docs).write.parquet(f"{d}/pidx")
        doc_lengths(docs).write.parquet(f"{d}/dlen")
        idx = spark.read.parquet(f"{d}/pidx")
        dl = spark.read.parquet(f"{d}/dlen")
        print('-- phrase "table scan" (index-only, no corpus scan)')
        phrase_search_indexed(idx, ["table", "scan"]).orderBy("doc_id").show(5)
        print("-- BM25 top-5 for [table, query, filter] (index-only)")
        bm25_indexed(idx, dl, ["table", "query", "filter"], k=5).show()
    spark.stop()


if __name__ == "__main__":
    main()
