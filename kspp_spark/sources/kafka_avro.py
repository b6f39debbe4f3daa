"""Kafka source with Confluent-wire-format Avro decoding.

Parity targets:
  kafka_source   include/kspp/sources/kafka_source.h:13-381
  avro serdes    include/kspp/serdes/avro_serdes.h:48-102
                 (wire format: 0x00 magic byte + 4-byte big-endian
                  schema id + Avro binary payload)

Spark mapping: `readStream.format("kafka")` + `from_avro` from the
spark-avro package. The only custom piece the reference needed a
registry client for is the 5-byte header — stripped with a substring
on the binary column (JVM-side, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def strip_confluent_header(value: Column | str) -> Column:
    """Drop the Confluent framing (magic 0x00 + schema id):
    bytes 6.. of the Kafka value (1-indexed substr)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.substring(v, 6, 2147483647)


def confluent_schema_id(value: Column | str) -> Column:
    """The 4-byte big-endian schema id from the framing (for routing
    mixed-schema topics)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.conv(F.hex(F.substring(v, 2, 4)), 16, 10).cast("int")


def confluent_avro_value(value: Column | str, json_schema: str) -> Column:
    """Decode a Confluent-framed Avro value into a struct column.
    Requires the spark-avro package on the classpath (standard Spark
    distribution component)."""
    from pyspark.sql.avro.functions import from_avro

    v = F.col(value) if isinstance(value, str) else value
    return from_avro(F.substring(v, 6, 2147483647), json_schema)


def kafka_reader_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    starting_timestamp_ms: int | None = None,
    extra_options: dict[str, str] | None = None,
) -> dict[str, str]:
    """The Kafka reader option map — split out of kafka_stream so the
    start-mode mapping is testable WITHOUT a broker. Reference modes
    (kafka_source.h:111-131): BEGINNING = 'earliest', END = 'latest',
    STORED = the checkpoint dir, and start_point_ms > 0 =
    `startingTimestamp` — Spark resolves each partition to its first
    offset with timestamp >= the start point, which is exactly the
    reference's spooling loop (skip the PREFIX below start_point_ms,
    then pass everything, including later out-of-order older
    timestamps, kafka_source.h:110-127). Timestamp mode replaces
    startingOffsets — the two are mutually exclusive in Spark's
    source."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
    }
    if starting_timestamp_ms is not None:
        opts["startingTimestamp"] = str(int(starting_timestamp_ms))
    else:
        opts["startingOffsets"] = starting_offsets
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if extra_options:
        # security/TLS options from config.ClusterConfig.kafka_options
        # (or any kafka.* client option); explicit args above win
        opts = {**extra_options, **opts}
    return opts


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    starting_timestamp_ms: int | None = None,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Structured-Streaming Kafka source in the canonical changelog
    shape: (key binary, value binary nullable, event_time).

    The reference's start-offset modes map directly: BEGINNING =
    'earliest', END = 'latest', STORED = checkpoint dir,
    start_point_ms = starting_timestamp_ms (kafka_source.h:111-131;
    see kafka_reader_options). Kafka's message timestamp becomes
    event_time (kafka_source.h:217); a null value is a tombstone.
    max_offsets_per_trigger is the backpressure bound
    (kafka_source.h:146-149's queue cap).
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        brokers,
        topic,
        starting_offsets=starting_offsets,
        max_offsets_per_trigger=max_offsets_per_trigger,
        starting_timestamp_ms=starting_timestamp_ms,
        extra_options=extra_options,
    ).items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.select(
        F.col("key"),
        F.col("value"),
        F.col("timestamp").alias("event_time"),
        F.col("partition"),
        F.col("offset"),
    )
