"""Schema-registry decode — the reference's example12-generic-avro:
consume Confluent-framed Avro messages (0x00 magic + 4-byte schema id
+ Avro binary) whose schemas resolve from a registry, including a
topic carrying TWO schema versions at once. Self-contained: an
in-memory registry transport and hand-framed messages; the decode path
(header strip, id routing, per-id Avro decode) is the production one."""

import io
import json
import struct

from kspp_spark.sources.avro_ocf import _encode
from kspp_spark.sources.schema_registry import (
    SchemaRegistryClient,
    decode_confluent_topic,
)
from kspp_spark.session import get_spark

V1 = {"type": "record", "name": "User", "fields": [{"name": "name", "type": "string"}]}
V2 = {
    "type": "record",
    "name": "User",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "age", "type": "long"},
    ],
}


def frame(schema_id: int, schema: dict, value: tuple) -> bytes:
    # _encode takes record values as a sequence in field order
    buf = io.BytesIO()
    _encode(schema, value, buf)
    return b"\x00" + struct.pack(">i", schema_id) + buf.getvalue()


def main() -> None:
    spark = get_spark("example_generic_avro")
    registry = {1: json.dumps(V1), 2: json.dumps(V2)}
    client = SchemaRegistryClient(
        "http://registry:8081",
        fetch_fn=lambda url: json.dumps(
            {"schema": registry[int(url.rsplit("/", 1)[1])]}
        ),
    )
    msgs = [
        (frame(1, V1, ("ada",)),),
        (frame(2, V2, ("grace", 36)),),
        (frame(1, V1, ("edsger",)),),
    ]
    topic = spark.createDataFrame(msgs, "value binary")
    for sid, decoded in decode_confluent_topic(topic, client):
        print(f"-- schema id {sid} ({len(json.loads(registry[sid])['fields'])} fields)")
        decoded.select("decoded.*").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
