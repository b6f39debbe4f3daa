"""Avro container round trip — the reference's example10-avro: write
typed records to an Avro OCF and read them back. Uses the jarless OCF
codec (sources/avro_ocf), so it runs with no spark-avro jar: the
writer emits standard multi-block containers (deflate) and the reader
splits one container across tasks by sync markers."""

import os
import tempfile

from pyspark.sql import functions as F

from kspp_spark.io import load
from kspp_spark.sources.avro_ocf import write_avro_ocf
from kspp_spark.sources.files import read_avro
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_avro")
    # io.load handles the testdata's timestamp flavors (NTZ inference
    # off, nanos-as-long) so the Avro writer sees plain TIMESTAMP
    orders = load(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/orders.avro"
        write_avro_ocf(orders, path, codec="deflate", block_rows=512)
        print(f"wrote {os.path.getsize(path):,} bytes")
        back = read_avro(spark, path)
        print(f"read back {back.count()} records (wrote {orders.count()})")
        back.orderBy("o_orderkey").show(3, truncate=False)
        # the round trip is exact
        assert back.count() == orders.count()
        a = orders.agg(F.sum("o_totalprice")).collect()[0][0]
        b = back.agg(F.sum("o_totalprice")).collect()[0][0]
        print(f"sum(o_totalprice) preserved: {a == b}")
    spark.stop()


if __name__ == "__main__":
    main()
