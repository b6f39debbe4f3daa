"""External-system sinks: Elasticsearch-style doc upsert, InfluxDB
line protocol, and MQTT publish.

Parity targets:
  elasticsearch_generic_avro_sink  libraries/kspp-es/elasticsearch_producer.h:166-180
    (per-doc PUT value / DELETE tombstone keyed by the key string,
     bounded concurrent HTTP connections)
  influx_sink                      libraries/kspp-influx/influx_sink.h:10-53
    (batched line-protocol strings over HTTP)
  mqtt_sink                        libraries/kspp-mqtt/mqtt_sink.h:12-104
    (string-key/string-value topic sink; key -> topic, value ->
     payload, the inverse of sources/bridge.py mqtt_source)

Transports are pluggable callables (list[payload] -> None) so the
formatting/batching semantics are testable without a network; wire in
`requests`-based senders (or elasticsearch-hadoop for the ES case) in
deployment. Everything runs inside foreachBatch partitions — writes
scale with partition count and never touch the driver.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from kspp_spark.sinks.writers import dedupe_batch_for_upsert


def es_actions(
    df: DataFrame,
    index: str,
    key: str,
    value_cols: list[str],
    event_time: str = "event_time",
) -> DataFrame:
    """Render a (deduped) batch into ES bulk-API action lines:
    tombstones -> delete actions, live rows -> index actions.
    Returns a DataFrame of (action string) — JVM-side JSON via to_json;
    the transport just concatenates and POSTs /_bulk per partition."""
    collapsed = dedupe_batch_for_upsert(df, [key], event_time)
    live = collapsed.filter(F.col(value_cols[0]).isNotNull())
    dead = collapsed.filter(F.col(value_cols[0]).isNull())
    index_meta = F.concat(
        F.lit('{"index":{"_index":"' + index + '","_id":"'),
        F.col(key).cast("string"),
        F.lit('"}}\n'),
    )
    doc = F.to_json(F.struct(*[F.col(c) for c in value_cols]))
    upserts = live.select(F.concat(index_meta, doc).alias("action"))
    deletes = dead.select(
        F.concat(
            F.lit('{"delete":{"_index":"' + index + '","_id":"'),
            F.col(key).cast("string"),
            F.lit('"}}'),
        ).alias("action")
    )
    return upserts.unionByName(deletes)


def elasticsearch_sink(
    index: str,
    key: str,
    value_cols: list[str],
    transport: Callable[[list[str]], None],
    event_time: str = "event_time",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer: render bulk actions, send per partition.
    transport receives a list of action strings (one partition's
    worth) — bound your HTTP concurrency there (the reference's
    max-connection knob)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        actions = es_actions(batch, index, key, value_cols, event_time)

        def send(rows) -> None:
            # materialize first: `rows` is an iterator (always truthy),
            # so guarding on it directly would call transport([]) once
            # per empty partition
            batch_actions = [r.action for r in rows]
            if batch_actions:
                transport(batch_actions)

        actions.foreachPartition(send)

    return write


def influx_lines(
    df: DataFrame,
    measurement: str,
    tag_cols: list[str],
    field_cols: list[str],
    event_time: str = "event_time",
) -> DataFrame:
    """Render rows to InfluxDB line protocol:
    measurement,tag=v,... field=v,... timestamp_ns — all JVM-side."""
    tags = [F.concat(F.lit("," + c + "="), F.col(c).cast("string")) for c in tag_cols]
    fields = [
        F.concat(F.lit(("" if i == 0 else ",") + c + "="), F.col(c).cast("string"))
        for i, c in enumerate(field_cols)
    ]
    ts_ns = (F.unix_micros(F.col(event_time)) * 1000).cast("string")
    line = F.concat(
        F.lit(measurement), *tags, F.lit(" "), *fields, F.lit(" "), ts_ns
    )
    return df.select(line.alias("line"))


def influx_sink(
    measurement: str,
    tag_cols: list[str],
    field_cols: list[str],
    transport: Callable[[list[str]], None],
    event_time: str = "event_time",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer batching line-protocol strings per partition
    (influx_sink.h batches before HTTP POST)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        lines = influx_lines(batch, measurement, tag_cols, field_cols, event_time)

        def send(rows) -> None:
            batch_lines = [r.line for r in rows]
            if batch_lines:
                transport(batch_lines)

        lines.foreachPartition(send)

    return write


def mqtt_messages(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    retain_live: bool = False,
) -> DataFrame:
    """Render rows to MQTT publishes (topic, payload, retain) — the
    inverse of the mqtt_source bridge's (topic, payload) mapping.

    Tombstones (NULL value) become RETAINED EMPTY payloads — MQTT's
    delete convention: a zero-length retained publish clears the
    broker's retained message for the topic, mirroring the reference's
    Kafka-tombstone semantics (mqtt_sink.h routes nullptr records into
    the producer the same as values). `retain_live=True` additionally
    retains live values so late subscribers see the latest state — the
    ktable-changelog-to-MQTT shape.
    """
    is_dead = F.col(value).isNull()
    return df.select(
        F.col(key).cast("string").alias("topic"),
        F.coalesce(F.col(value).cast("string"), F.lit("")).alias("payload"),
        (is_dead | F.lit(retain_live)).alias("retain"),
    )


def mqtt_sink(
    publish: Callable[[list[tuple[str, str, bool]]], None],
    key: str = "key",
    value: str = "value",
    retain_live: bool = False,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer publishing one partition's messages per
    transport call (mqtt_sink.h:60-75 drains its queue through
    mqtt_producer::insert; here the injectable `publish` receives
    [(topic, payload, retain)] and wraps e.g. paho's
    `client.publish(topic, payload, retain=retain)` — connection
    lifecycle and QoS live in the transport, exactly like the ES/Influx
    sinks above). Publishes scale with partition count; nothing routes
    through the driver."""

    def write(batch: DataFrame, batch_id: int) -> None:
        msgs = mqtt_messages(batch, key, value, retain_live)

        def send(rows) -> None:
            # materialize first: `rows` is an iterator (always truthy),
            # so guarding on it directly would publish([]) per empty
            # partition — a spurious transport call
            msg_list = [(r.topic, r.payload, r.retain) for r in rows]
            if msg_list:
                publish(msg_list)

        msgs.foreachPartition(send)

    return write
