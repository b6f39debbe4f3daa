from kspp_spark.sources.files import read_avro, read_parquet, stream_files
from kspp_spark.sources.jdbc_keyset import JdbcKeysetSource, keyset_predicate
from kspp_spark.sources.kafka_avro import (
    confluent_avro_value,
    kafka_stream,
    strip_confluent_header,
)

__all__ = [
    "read_avro",
    "read_parquet",
    "stream_files",
    "JdbcKeysetSource",
    "keyset_predicate",
    "confluent_avro_value",
    "kafka_stream",
    "strip_confluent_header",
]
