"""End-to-end corpus curation (beyond-reference): quality gates ->
language ID -> exact dedup -> per-source stats."""

import os

from kspp_spark.functions.pipeline import curate_documents
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example_curate")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    curated = curate_documents(docs)
    curated.show(10, truncate=60)
    print(f"kept {curated.count()} of {docs.count()} documents")
    spark.stop()


if __name__ == "__main__":
    main()
