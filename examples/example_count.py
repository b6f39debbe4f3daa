"""Word count — the reference's example3-count (flat_map word split ->
count_by_key -> stream_sink) on the Topology surface."""

import os

from pyspark.sql import functions as F

from kspp_spark.plans.topology import Topology
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_count")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t = Topology(spark)
    (
        t.source(docs)
        .flat_map(F.split(F.col("text"), r"\s+"), alias="word")
        .filter(F.col("word") != "")
        .count_by_key("word")
        .transform(F.col("word"), F.col("cnt"))
        .to_console(20)
    )
    spark.stop()


if __name__ == "__main__":
    main()
