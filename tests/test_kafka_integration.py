"""Live-Kafka round-trip tests (kafka_source.h:13-381 /
kafka_sink.h:13-280 parity). These auto-skip unless a broker is
reachable via KSPP_SPARK_KAFKA_BROKERS — the suite turns green the
moment the environment provides one, without any code change.

Covered when a broker exists:
  * produce -> consume round trip of keyed binary records
  * tombstone (null value) propagation (kafka_source.h:217 treats a
    null value as a delete; the Spark Kafka source preserves it)
  * default-partitioner placement matches Kafka's murmur2 over the
    serialized key (kspp.h:283-304 uses librdkafka's murmur2) — the
    property co-partitioned joins depend on
"""

import os
import uuid

import pytest

BROKERS = os.environ.get("KSPP_SPARK_KAFKA_BROKERS")

pytestmark = pytest.mark.skipif(
    not BROKERS,
    reason="no Kafka broker (set KSPP_SPARK_KAFKA_BROKERS=host:port to enable)",
)


def murmur2_kafka(data: bytes) -> int:
    """Kafka's murmur2 (the DefaultPartitioner hash — public Kafka
    algorithm, org.apache.kafka.common.utils.Utils#murmur2)."""
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    r = 24
    mask = 0xFFFFFFFF
    h = (seed ^ length) & mask
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * m) & mask
        k ^= k >> r
        k = (k * m) & mask
        h = (h * m) & mask
        h ^= k
        i += 4
    left = length - i
    if left == 3:
        h ^= (data[i + 2] & 0xFF) << 16
    if left >= 2:
        h ^= (data[i + 1] & 0xFF) << 8
    if left >= 1:
        h ^= data[i] & 0xFF
        h = (h * m) & mask
    h ^= h >> 13
    h = (h * m) & mask
    h ^= h >> 15
    # Java int semantics
    if h >= 0x80000000:
        h -= 0x100000000
    return h


def kafka_partition_for(key: bytes, num_partitions: int) -> int:
    return (murmur2_kafka(key) & 0x7FFFFFFF) % num_partitions


def test_round_trip_with_tombstones_and_murmur2(spark, tmp_path):
    from pyspark.sql import functions as F

    topic = f"kspp-spark-it-{uuid.uuid4().hex[:12]}"
    rows = [
        ("user-1", "v1"),
        ("user-2", "v2"),
        ("user-1", None),  # tombstone: delete for user-1
        ("user-3", "v3"),
    ]
    df = spark.createDataFrame(rows, "key string, value string")
    (
        df.select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("topic", topic)
        .save()
    )

    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            "partition",
        )
    )
    got = [(r.key, r.value, r.partition) for r in back.collect()]
    assert sorted((k, v) for k, v, _ in got) == sorted(rows)

    # tombstone null survived the round trip
    assert ("user-1", None) in {(k, v) for k, v, _ in got}

    # partition placement: same key -> same partition, and it equals
    # Kafka's murmur2 over the serialized key
    n_parts = (
        back.select("partition").agg(F.max("partition")).collect()[0][0] + 1
    )
    by_key = {}
    for k, _, p in got:
        by_key.setdefault(k, set()).add(p)
    assert all(len(ps) == 1 for ps in by_key.values())
    for k, ps in by_key.items():
        assert ps == {kafka_partition_for(k.encode(), n_parts)}
