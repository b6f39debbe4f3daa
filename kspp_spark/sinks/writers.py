"""Sinks (SURVEY.md §2.2).

Parity targets:
  kafka_sink        include/kspp/sinks/kafka_sink.h:13-280
  avro_file_sink    include/kspp/sinks/avro_file_sink.h:11-107
                    (event-time-window file rotation at :67-85)
  postgres upsert   libraries/kspp-pg/postgres_producer.cpp:147-238
                    (batched INSERT..ON CONFLICT; batch is split on
                     intra-batch duplicate keys and on deletes;
                     deletes at :277)
  stream/array/null include/kspp/sinks/{stream,array,null}_sink.h

Spark mapping: built-in sinks for kafka/console/memory/noop; the
interesting custom semantics — upsert batching with last-write-wins
dedupe and tombstone deletes — live in `foreach_batch_upsert`, usable
under `writeStream.foreachBatch` (streaming) or called directly on a
batch DataFrame.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def dedupe_batch_for_upsert(
    df: DataFrame, key_cols: list[str], event_time: str = "event_time"
) -> DataFrame:
    """Collapse a micro-batch to one row per key (latest event_time
    wins) before the upsert, mirroring the reference's splitting of
    batches on duplicate keys (postgres_producer.cpp:204-228) — but in
    one aggregation instead of sequential sub-batches."""
    others = [c for c in df.columns if c not in key_cols]
    payload = F.struct(F.col(event_time), *[F.col(c) for c in others if c != event_time])
    agg = df.groupBy(*key_cols).agg(F.max(payload).alias("_w"))
    return agg.select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in [event_time] + [c for c in others if c != event_time]]
    )


def foreach_batch_upsert(
    key_cols: list[str],
    value_cols: list[str],
    upsert_fn: Callable[[list[tuple]], None],
    delete_fn: Callable[[list[tuple]], None],
    event_time: str = "event_time",
    tombstone_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function implementing the reference's
    upsert/delete protocol: tombstones (NULL value) -> DELETE by key,
    everything else -> UPSERT, each batch deduped by key first.

    upsert_fn/delete_fn receive lists of row tuples partition-wise —
    plug in JDBC executemany / Elasticsearch bulk / HTTP POST. Runs on
    executors via foreachPartition: no driver bottleneck; sinks scale
    with partition count (bounded connections per partition mirrors the
    reference's max-http-connection knob).
    """
    tcol = tombstone_col or value_cols[0]

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        collapsed = dedupe_batch_for_upsert(batch, key_cols, event_time)
        deletes = collapsed.filter(F.col(tcol).isNull()).select(*key_cols)
        upserts = collapsed.filter(F.col(tcol).isNotNull()).select(
            *key_cols, *value_cols, event_time
        )
        upserts.foreachPartition(lambda rows: upsert_fn([tuple(r) for r in rows]))
        deletes.foreachPartition(lambda rows: delete_fn([tuple(r) for r in rows]))

    return write_batch


def rotated_file_sink(
    df: DataFrame,
    path: str,
    event_time: str = "event_time",
    window: str = "1 hour",
    fmt: str = "parquet",
    mode: str = "append",
) -> None:
    """Event-time-rotated files (avro_file_sink.h:67-85 rotates the
    container by event-time window; files named by window start).
    Spark-native: partitionBy on the event-time window start — each
    window directory is the reference's rotated file, and downstream
    scans get partition pruning on the window column for free. The
    `window` parameter takes any Spark interval ('15 minutes',
    '1 hour', '1 day', ...) and drives the actual rotation width."""
    (
        df.withColumn("window_start", F.window(F.col(event_time), window).start)
        .write.format(fmt)
        .partitionBy("window_start")
        .mode(mode)
        .save(path)
    )


def console_sink(df: DataFrame, n: int = 20) -> None:
    """stream_sink (pretty-print) equivalent."""
    df.show(n, truncate=False)


def memory_sink(df: DataFrame, name: str):
    """array_topic_sink equivalent for streaming tests: named in-memory
    table. Returns the StreamingQuery."""
    return df.writeStream.format("memory").queryName(name).outputMode("append").start()


def null_sink(df: DataFrame) -> None:
    """null_sink equivalent: full materialization, no output."""
    df.write.format("noop").mode("overwrite").save()


def kafka_sink(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key: str = "key",
    value: str = "value",
    extra_options: dict[str, str] | None = None,
):
    """Produce to Kafka (streaming). Default partitioner murmur2 on the
    serialized key matches the reference's partition choice
    (kspp.h:283-304 uses librdkafka murmur2). extra_options carries
    kafka.* client config (e.g. the TLS map from
    config.ClusterConfig.kafka_options)."""
    out = df.select(
        F.col(key).cast("binary").alias("key"),
        F.col(value).cast("binary").alias("value"),
    )
    w = out.writeStream.format("kafka")
    for k, v in (extra_options or {}).items():
        w = w.option(k, v)
    return (
        w.option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
