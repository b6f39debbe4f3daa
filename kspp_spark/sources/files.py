"""File sources — batch and streaming.

Parity target: generic_avro_file_source
(include/kspp/sources/avro_file_source.h:8-47) which tails an Avro
container file on a background thread. Spark's file source does the
same for a *directory* of files with exactly-once tracking — strictly
more capable; at 100 TB this is the bulk-ingest path (splittable
formats, partition pruning, predicate pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro container files. Prefers spark-avro (bundled external
    module of Apache Spark: JVM decode, sync-marker splitting of large
    files); when the jar is absent falls back to the self-contained
    pure-Python OCF reader (sources/avro_ocf.py — per-file parallel,
    generic-record subset)."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:
        # fall back ONLY on the jar-missing error; a genuine read
        # failure with the jar present (corrupt file, unsupported type)
        # must surface as-is, not be masked by the slower local fallback
        msg = str(e)
        if (
            "FAILED_TO_FIND_DATA_SOURCE" not in msg
            and "Failed to find data source" not in msg
            and "Failed to find the data source" not in msg
        ):
            raise
        from kspp_spark.sources.avro_ocf import read_avro_ocf

        return read_avro_ocf(spark, path)


def stream_files(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of a directory (the avro_file_source pattern).
    Schema must be provided — streaming sources don't infer."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
