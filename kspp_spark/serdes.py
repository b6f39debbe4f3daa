"""Codec layer — the reference's pluggable per-source/sink serdes
re-expressed as Column transforms.

Parity targets (SURVEY.md §1.2):
  text    include/kspp/serdes/text_serdes.h:13-179
          (specializations for string / bool / ints / uuid)
  json    include/kspp/serdes/json_serdes.h:10-36 (user-specialized)
  binary  include/kspp/serdes/binary_serdes.h
  avro    include/kspp/serdes/avro_serdes.h:48-145 (Confluent framing —
          see sources/kafka_avro.py + sources/schema_registry.py)
  proto   include/kspp/serdes/proto_serdes.h (spark-protobuf package)

Every decode/encode is a JVM-side Column expression (casts, from_json/
to_json, from_protobuf) — a 100 TB Kafka scan decodes inside
whole-stage codegen, no Python per row. ANSI note: the driver session
runs ANSI mode, where a malformed CAST is an error; `strict=False`
uses try_cast so bad records become NULL (the reference logs+skips
decode failures rather than aborting — kafka_source.h decode path).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from kspp_spark.sources.kafka_avro import (  # noqa: F401  (re-export)
    confluent_avro_value,
    confluent_schema_id,
    strip_confluent_header,
)

# text_serdes specializations map to cast targets
_TEXT_TYPES = {
    "string": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "int": "int",
    "int32": "int",
    "long": "bigint",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "uuid": "string",  # uuids travel as canonical strings
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def decode_text(value: Column | str, type_name: str = "string", strict: bool = True) -> Column:
    """text_serdes.decode: UTF-8 bytes/string -> typed column
    (text_serdes.h specializations: string/bool/ints/uuid)."""
    target = _TEXT_TYPES[type_name.lower()]
    s = _col(value).cast("string")
    return s.cast(target) if strict else s.try_cast(target)


def encode_text(value: Column | str) -> Column:
    """text_serdes.encode: typed column -> UTF-8 string."""
    return _col(value).cast("string")


def decode_json(value: Column | str, schema: str, strict: bool = False) -> Column:
    """json_serdes.decode: JSON bytes/string -> struct column. The
    reference requires a user specialization per type; here the
    'specialization' is the DDL schema string. Default lenient:
    malformed documents decode to NULL (PERMISSIVE)."""
    opts = {"mode": "FAILFAST" if strict else "PERMISSIVE"}
    return F.from_json(_col(value).cast("string"), schema, opts)


def encode_json(value: Column | str) -> Column:
    """json_serdes.encode: struct column -> JSON string."""
    return F.to_json(_col(value))


def decode_binary(value: Column | str) -> Column:
    """binary_serdes: opaque passthrough (binary column)."""
    return _col(value).cast("binary")


def encode_binary(value: Column | str) -> Column:
    return _col(value).cast("binary")


def decode_protobuf(value: Column | str, message_name: str, desc_file_path: str) -> Column:
    """proto_serdes.decode via spark-protobuf (standard Spark
    distribution component; raises at analysis if the package is not
    on the classpath — same gating as the avro container path)."""
    from pyspark.sql.protobuf.functions import from_protobuf

    return from_protobuf(_col(value), message_name, descFilePath=desc_file_path)


def encode_protobuf(value: Column | str, message_name: str, desc_file_path: str) -> Column:
    from pyspark.sql.protobuf.functions import to_protobuf

    return to_protobuf(_col(value), message_name, descFilePath=desc_file_path)
