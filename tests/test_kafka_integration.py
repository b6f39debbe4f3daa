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


# murmur2/placement now live in the library (kafka_utils) and are
# golden-vector-verified brokerlessly in test_kafka_brokerless.py;
# this file checks the broker agrees with them end-to-end.
from kspp_spark.kafka_utils import kafka_partition_for  # noqa: E402


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


def test_starting_timestamp_skips_earlier_messages(spark):
    """startingTimestamp parity with the reference's start_point
    spooling phase (kafka_source.h:111-131: messages whose broker
    timestamp precedes start_point are consumed and DISCARDED before
    the source goes live). The Spark Kafka source expresses the same
    contract declaratively: startingTimestamp resolves, per partition,
    to the earliest offset whose timestamp is >= the given ms — so a
    batch read returns exactly the records at-or-after the cut."""
    import time

    from pyspark.sql import functions as F

    topic = f"kspp-spark-it-ts-{uuid.uuid4().hex[:12]}"

    def produce(rows):
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

    produce([("k1", "old-1"), ("k2", "old-2")])
    time.sleep(1.5)  # ensure a strictly-later broker timestamp
    cut_ms = int(time.time() * 1000)
    time.sleep(0.1)
    produce([("k1", "new-1"), ("k3", "new-3")])

    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingTimestamp", str(cut_ms))
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )
    got = sorted(r.value for r in back.collect())
    assert got == ["new-1", "new-3"]
