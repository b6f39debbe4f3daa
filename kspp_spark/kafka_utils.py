"""Kafka partition placement + Confluent framing, brokerless.

Parity targets:
  murmur2 partitioner  src/internal/utils/rd_kafka_utils.cpp:83 — the
      reference routes keyed produces through librdkafka's
      RD_KAFKA_MSG_F_PARTITIONER ("murmur2_random", Kafka's Java
      DefaultPartitioner algorithm), which kspp.h:283-304 relies on so
      co-partitioned topics stay co-partitioned.
  Confluent framing    include/kspp/serdes/avro_serdes.h:48-102 —
      0x00 magic + 4-byte big-endian schema id + Avro binary payload.

These are verifiable WITHOUT a broker: murmur2 is a pure function with
published golden vectors (Apache Kafka UtilsTest#testMurmur2), and the
framing is a byte layout. The live produce/consume round trip stays in
tests/test_kafka_integration.py for broker-equipped environments.

At scale: `partition_for_key` lets a job pre-compute the placement a
Kafka produce WILL get — e.g. `repartition(n, placement)` before a
partition-wise sink, or proving two topics co-partition before
planning a shuffle-free join over their changelogs.
"""

from __future__ import annotations

import struct

import pandas as pd

from pyspark.sql import Column, functions as F


def murmur2_kafka(data: bytes) -> int:
    """Kafka's murmur2 (org.apache.kafka.common.utils.Utils#murmur2 —
    public algorithm; librdkafka's rd_murmur2 reproduces it for the
    "murmur2"/"murmur2_random" partitioners). Returns a signed Java
    int32."""
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
    """DefaultPartitioner placement for a keyed record:
    (murmur2(key) & 0x7fffffff) % numPartitions."""
    return (murmur2_kafka(key) & 0x7FFFFFFF) % num_partitions


def partition_for_key(key: Column | str, num_partitions: int) -> Column:
    """Column form of kafka_partition_for over a BINARY key column
    (Arrow-batched pandas UDF — murmur2 has no Spark built-in; Spark's
    `hash` is murmur3 with different constants). Use off the hot path:
    placement pre-computation, co-partitioning audits, sink-side
    repartitioning."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def place(keys: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if k is None
                else kafka_partition_for(bytes(k), num_partitions)
                for k in keys
            ],
            dtype="Int32",
        )

    return place(F.col(key) if isinstance(key, str) else key)


def confluent_frame(schema_id: int, payload: bytes) -> bytes:
    """Wrap an Avro-binary payload in Confluent wire framing
    (avro_serdes.h:69-75 writes the same 5-byte header)."""
    return b"\x00" + struct.pack(">I", schema_id) + payload


def confluent_unframe(data: bytes) -> tuple[int, bytes]:
    """Split Confluent framing -> (schema_id, payload). Raises on a
    wrong magic byte, like the reference's decoder (avro_serdes.h:88
    rejects non-zero magic)."""
    if len(data) < 5 or data[0] != 0:
        raise ValueError("not Confluent-framed: bad magic byte")
    return struct.unpack(">I", data[1:5])[0], data[5:]
