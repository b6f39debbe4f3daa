"""Kafka-path checks that need NO broker: murmur2 partition placement
(golden vectors from Apache Kafka's public UtilsTest#testMurmur2) and
the Confluent wire framing round trip — the two properties of the
reference's Kafka path (rd_kafka_utils.cpp:83 partitioner,
avro_serdes.h:48-102 framing) that are pure functions of bytes. The
live produce/consume round trip remains in test_kafka_integration.py
and activates when KSPP_SPARK_KAFKA_BROKERS is set."""

import pytest
from pyspark.sql import functions as F

from kspp_spark.kafka_utils import (
    confluent_frame,
    confluent_unframe,
    kafka_partition_for,
    murmur2_kafka,
    partition_for_key,
)

# org.apache.kafka.common.utils.UtilsTest#testMurmur2 (Apache Kafka,
# public test suite) — the exact vectors librdkafka also pins.
MURMUR2_GOLDEN = {
    b"21": -973932308,
    b"foobar": -790332482,
    b"a-little-bit-long-string": -985981536,
    b"a-little-bit-longer-string": -1486304829,
    b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8": -58897971,
    b"abc": 479470107,
}


def test_murmur2_matches_kafka_golden_vectors():
    for key, expected in MURMUR2_GOLDEN.items():
        assert murmur2_kafka(key) == expected, key


def test_partition_placement_masks_sign():
    # negative hash must place via & 0x7fffffff, not abs()
    for key, h in MURMUR2_GOLDEN.items():
        for n in (1, 3, 12, 64):
            assert kafka_partition_for(key, n) == (h & 0x7FFFFFFF) % n
    assert kafka_partition_for(b"foobar", 12) == (-790332482 & 0x7FFFFFFF) % 12


def test_sink_key_encoding_reproduces_placement(spark):
    """The sink serializes keys with cast('binary') (writers.kafka_sink)
    — assert those are the UTF-8 bytes murmur2 must hash, so the
    brokerless golden placement transfers to the real produce path."""
    keys = [k.decode() for k in MURMUR2_GOLDEN]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    encoded = df.select(
        "key", F.col("key").cast("binary").alias("kbytes")
    ).collect()
    for r in encoded:
        assert bytes(r.kbytes) == r.key.encode("utf-8")
        assert (
            kafka_partition_for(bytes(r.kbytes), 12)
            == kafka_partition_for(r.key.encode(), 12)
        )


def test_partition_for_key_column(spark):
    keys = sorted(k.decode() for k in MURMUR2_GOLDEN)
    df = spark.createDataFrame(
        [(k,) for k in keys] + [(None,)], "key string"
    )
    out = (
        df.select(
            "key",
            partition_for_key(F.col("key").cast("binary"), 12).alias("p"),
        )
        .orderBy("key")
        .collect()
    )
    got = {r.key: r.p for r in out}
    for k in keys:
        assert got[k] == kafka_partition_for(k.encode(), 12)
    assert got[None] is None  # tombstone-keyed records: no placement


def test_confluent_framing_python_round_trip():
    payload = b"\x02\x06foo"  # arbitrary avro-binary bytes
    framed = confluent_frame(1234, payload)
    assert framed[:1] == b"\x00" and len(framed) == 5 + len(payload)
    sid, body = confluent_unframe(framed)
    assert (sid, body) == (1234, payload)
    with pytest.raises(ValueError):
        confluent_unframe(b"\x01\x00\x00\x00\x01x")


def test_confluent_framing_spark_columns_round_trip(spark):
    """strip_confluent_header / confluent_schema_id (the JVM-side
    decode path kafka_avro.py applies to the Kafka value column) must
    invert confluent_frame exactly."""
    from kspp_spark.sources.kafka_avro import (
        confluent_schema_id,
        strip_confluent_header,
    )

    rows = [
        (confluent_frame(1, b"a"),),
        (confluent_frame(98765, b"\x00\x01\x02\x03longer-payload"),),
        (confluent_frame(2**31 - 1, b""),),
    ]
    df = spark.createDataFrame(rows, "value binary")
    got = df.select(
        confluent_schema_id("value").alias("sid"),
        strip_confluent_header("value").alias("payload"),
    ).collect()
    expect = [confluent_unframe(bytes(v)) for (v,) in rows]
    assert [(r.sid, bytes(r.payload) if r.payload is not None else b"") for r in got] == [
        (sid, body) for sid, body in expect
    ]


def test_confluent_avro_payload_decodes_jarless(spark):
    """Frame a real Avro-binary record, then decode it through the
    pure-Python path (schema_registry's per-id decoder) — the full
    encode->frame->unframe->decode loop with zero external services."""
    import io as _io
    import json

    from kspp_spark.sources.avro_ocf import _decode, _encode

    schema = json.loads(
        json.dumps(
            {
                "type": "record",
                "name": "user",
                "fields": [
                    {"name": "name", "type": "string"},
                    {"name": "score", "type": "long"},
                ],
            }
        )
    )
    buf = _io.BytesIO()
    _encode(schema, ["alice", 42], buf)  # record values in field order
    framed = confluent_frame(7, buf.getvalue())
    sid, payload = confluent_unframe(framed)
    assert sid == 7
    rec = _decode(schema, _io.BytesIO(payload))  # records decode as tuples
    assert rec == ("alice", 42)


def test_kafka_reader_start_modes_brokerless():
    """Start-mode mapping (kafka_source.h:111-131) pinned without a
    broker: offset modes set startingOffsets; a start point in ms sets
    startingTimestamp INSTEAD (mutually exclusive in Spark's source);
    the backpressure bound maps to maxOffsetsPerTrigger."""
    from kspp_spark.sources.kafka_avro import kafka_reader_options

    o = kafka_reader_options("b:9092", "t")
    assert o["startingOffsets"] == "earliest" and "startingTimestamp" not in o

    o = kafka_reader_options("b:9092", "t", starting_offsets="latest")
    assert o["startingOffsets"] == "latest"

    o = kafka_reader_options(
        "b:9092", "t", starting_timestamp_ms=1_700_000_000_000,
        max_offsets_per_trigger=5000,
    )
    assert o["startingTimestamp"] == "1700000000000"
    assert "startingOffsets" not in o  # timestamp mode replaces it
    assert o["maxOffsetsPerTrigger"] == "5000"
    assert o["subscribe"] == "t" and o["kafka.bootstrap.servers"] == "b:9092"
