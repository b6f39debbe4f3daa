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


# ------------------------------------------------- jarless protobuf fallback
#
# The protobuf wire format (varint tags, 4 wire types) is publicly
# specified and tiny; when the spark-protobuf jar is absent these
# Arrow-batched fallbacks decode/encode scalar messages with the
# caller supplying the message shape as {field_number: (name, type)} —
# the same contract as proto_serdes.h, where the caller supplies a
# generated message class. Types: bool/int/long (varint, two's
# complement), sint/sint64 (zigzag), string/bytes (length-delimited),
# float/double/fixed32/fixed64. Unknown fields skip per the wire
# rules; duplicate scalars are last-one-wins (proto3).

_PB_SPARK_TYPES = {
    "bool": "boolean",
    "int": "int",
    "long": "bigint",
    "sint": "bigint",
    "sint64": "bigint",
    "string": "string",
    "bytes": "binary",
    "float": "float",
    "double": "double",
    "fixed32": "bigint",
    "fixed64": "bigint",
}


def _pb_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = data[i]
        i += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return acc, i
        shift += 7


def _pb_decode_message(data: bytes, fields: dict) -> dict:
    import struct as _struct

    out = {name: None for name, _ in fields.values()}
    i = 0
    while i < len(data):
        tag, i = _pb_varint(data, i)
        num, wt = tag >> 3, tag & 7
        if wt == 0:
            raw, i = _pb_varint(data, i)
            val = ("varint", raw)
        elif wt == 1:
            val = ("i64", data[i : i + 8])
            i += 8
        elif wt == 5:
            val = ("i32", data[i : i + 4])
            i += 4
        elif wt == 2:
            n, i = _pb_varint(data, i)
            val = ("len", data[i : i + n])
            i += n
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        if num not in fields:
            continue  # unknown field: skipped, per spec
        name, typ = fields[num]
        kind, raw = val
        if typ == "bool":
            out[name] = bool(raw)
        elif typ in ("int", "long"):
            v = raw & 0xFFFFFFFFFFFFFFFF
            out[name] = v - (1 << 64) if v >= 1 << 63 else v
        elif typ in ("sint", "sint64"):
            out[name] = (raw >> 1) ^ -(raw & 1)
        elif typ == "string":
            out[name] = raw.decode("utf-8")
        elif typ == "bytes":
            out[name] = bytes(raw)
        elif typ == "double":
            out[name] = _struct.unpack("<d", raw)[0]
        elif typ == "float":
            out[name] = _struct.unpack("<f", raw)[0]
        elif typ == "fixed64":
            out[name] = _struct.unpack("<q", raw)[0]
        elif typ == "fixed32":
            out[name] = _struct.unpack("<I", raw)[0]
        else:
            raise ValueError(f"unsupported protobuf field type {typ!r}")
    return out


def _pb_encode_message(row: dict, fields: dict) -> bytes:
    import io as _io
    import struct as _struct

    out = _io.BytesIO()

    def varint(n: int) -> None:
        n &= 0xFFFFFFFFFFFFFFFF
        while True:
            b = n & 0x7F
            n >>= 7
            out.write(bytes([b | 0x80] if n else [b]))
            if not n:
                return

    for num in sorted(fields):
        name, typ = fields[num]
        v = row.get(name)
        if v is None or (isinstance(v, float) and v != v):
            continue  # proto3: absent field (None or pandas NaN)
        if typ in ("bool", "int", "long"):
            varint(num << 3 | 0)
            varint(int(v))
        elif typ in ("sint", "sint64"):
            varint(num << 3 | 0)
            varint((int(v) << 1) ^ (int(v) >> 63))
        elif typ in ("string", "bytes"):
            b = v.encode("utf-8") if typ == "string" else bytes(v)
            varint(num << 3 | 2)
            varint(len(b))
            out.write(b)
        elif typ == "double":
            varint(num << 3 | 1)
            out.write(_struct.pack("<d", v))
        elif typ == "fixed64":
            varint(num << 3 | 1)
            out.write(_struct.pack("<q", int(v)))
        elif typ == "float":
            varint(num << 3 | 5)
            out.write(_struct.pack("<f", v))
        elif typ == "fixed32":
            varint(num << 3 | 5)
            out.write(_struct.pack("<I", int(v)))
        else:
            raise ValueError(f"unsupported protobuf field type {typ!r}")
    return out.getvalue()


def decode_protobuf_py(value: Column | str, fields: dict) -> Column:
    """Jarless protobuf decode: binary column -> struct, message shape
    from `fields` = {field_number: (name, type)}."""
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    ddl = ", ".join(f"{n} {_PB_SPARK_TYPES[t]}" for n, t in fields.values())
    names = [n for n, _ in fields.values()]

    def dec(vals):
        return pd.DataFrame(
            [_pb_decode_message(bytes(b), fields) for b in vals], columns=names
        )

    return F.pandas_udf(dec, returnType=_parse_datatype_string(f"struct<{ddl}>"))(
        _col(value)
    )


def encode_protobuf_py(value: Column | str, fields: dict) -> Column:
    """Jarless protobuf encode: struct column -> binary."""
    import pandas as pd

    def enc(vals):
        # Arrow hands a struct column to the UDF as a pd.DataFrame
        rows = (
            vals.to_dict("records")
            if isinstance(vals, pd.DataFrame)
            else [dict(v) for v in vals]
        )
        return pd.Series(
            [_pb_encode_message(r, fields) for r in rows], dtype=object
        )

    return F.pandas_udf(enc, returnType="binary")(_col(value))
