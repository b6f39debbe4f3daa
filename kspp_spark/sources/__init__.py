from kspp_spark.sources.bridge import (
    BridgeSource,
    kinesis_source,
    mqtt_source,
)
from kspp_spark.sources.files import read_avro, read_parquet, stream_files
from kspp_spark.sources.jdbc_keyset import (
    JdbcKeysetSource,
    keyset_predicate,
    sql_literal,
)
from kspp_spark.sources.kafka_avro import (
    confluent_avro_value,
    confluent_schema_id,
    kafka_stream,
    strip_confluent_header,
)
from kspp_spark.sources.schema_registry import (
    SchemaRegistryClient,
    decode_confluent_topic,
    split_by_schema_id,
)
from kspp_spark.sources.warc import (
    parse_warc_stream,
    read_warc,
    warc_to_documents,
)

__all__ = [
    "BridgeSource",
    "kinesis_source",
    "mqtt_source",
    "read_avro",
    "read_parquet",
    "stream_files",
    "JdbcKeysetSource",
    "keyset_predicate",
    "sql_literal",
    "confluent_avro_value",
    "confluent_schema_id",
    "kafka_stream",
    "strip_confluent_header",
    "SchemaRegistryClient",
    "decode_confluent_topic",
    "split_by_schema_id",
    "parse_warc_stream",
    "read_warc",
    "warc_to_documents",
]
