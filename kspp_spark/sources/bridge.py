"""Protocol-bridge sources: MQTT and Kinesis ingestion without a
native Spark connector.

Parity targets:
  mqtt_source            libraries/kspp-mqtt/mqtt_source.h:11-60
  kinesis_string_source  libraries/kspp-kinesis/kinesis_source.h:12-84

Both reference sources are the same shape: a consumer thread pushes
(string key, string value, event_time) records into a bounded queue
and the topology drains it up to the current tick. The Spark-first
mapping keeps that shape honest about scale: an MQTT subscription or a
Kinesis shard iterator is a SINGLE-NODE endpoint, so the bridge drains
it driver-side into bounded changelog micro-batches and (the scale
path) SPOOLS them to parquet/Kafka, where a Structured Streaming file
source fans the data out to the cluster. Ingest concurrency comes from
running one bridge per shard/topic partition — exactly the reference's
one-source-per-partition model.

Clients are injectable callables, so tests (and air-gapped runs) need
no paho/boto; wiring a real client is a ~5-line lambda.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

BRIDGE_SCHEMA = "key string, value string, event_time timestamp"

# a fetch callable: (max_records) -> list of (key, value|None, event_time_ms)
FetchFn = Callable[[int], list]


def _ts(ms: int) -> datetime.datetime:
    """ms epoch -> naive-UTC datetime (session tz is UTC in this repo)."""
    return datetime.datetime.fromtimestamp(
        ms / 1000.0, tz=datetime.timezone.utc
    ).replace(tzinfo=None)


@dataclass
class BridgeSource:
    """Drain an external push/poll endpoint into bounded changelog
    micro-batches (key, value, event_time); None value = tombstone.

    fetch_fn(max_records) returns up to max_records tuples of
    (key: str, value: str | None, event_time_ms: int) — and [] when
    the endpoint has nothing buffered (the reference's queue-empty
    fast path, mqtt_source.h:58-60)."""

    spark: SparkSession
    fetch_fn: FetchFn
    batch_size: int = 10_000

    def poll_once(self) -> DataFrame | None:
        recs = self.fetch_fn(self.batch_size)
        if not recs:
            return None
        rows = [(k, v, _ts(ms)) for (k, v, ms) in recs]
        return self.spark.createDataFrame(rows, BRIDGE_SCHEMA)

    def poll_forever(
        self, on_eof: Callable[[], None] | None = None
    ) -> Iterator[DataFrame]:
        """Yield batches until the endpoint is drained; on_eof (e.g. a
        sleep) runs between empty polls — return normally by passing
        on_eof=None."""
        while True:
            batch = self.poll_once()
            if batch is None:
                if on_eof is None:
                    return
                on_eof()
                continue
            yield batch

    def spool(
        self,
        path: str,
        on_eof: Callable[[], None] | None = None,
        coalesce: int = 1,
    ) -> int:
        """The scale path: land each micro-batch as an appended parquet
        file that a Structured Streaming file source tails
        (`spark.readStream.schema(BRIDGE_SCHEMA).parquet(path)`).
        Returns the number of records spooled this call."""
        n = 0
        for batch in self.poll_forever(on_eof):
            batch.coalesce(coalesce).write.mode("append").parquet(path)
            n += batch.count()
        return n


def mqtt_source(
    spark: SparkSession,
    receive_fn: Callable[[int], list],
    batch_size: int = 10_000,
) -> BridgeSource:
    """MQTT bridge (mqtt_source.h parity): key = topic, value = payload.
    receive_fn(max) returns [(topic: str, payload: bytes|str,
    event_time_ms: int)] — wrap a paho client's message queue:

        msgs = []
        client.on_message = lambda c, u, m: msgs.append(
            (m.topic, m.payload, int(time.time() * 1000)))
        src = mqtt_source(spark, lambda n: [msgs.pop(0) for _ in
                                            range(min(n, len(msgs)))])
    """

    def fetch(max_records: int) -> list:
        out = []
        for topic, payload, ms in receive_fn(max_records):
            if isinstance(payload, (bytes, bytearray)):
                payload = bytes(payload).decode("utf-8")
            out.append((topic, payload, ms))
        return out

    return BridgeSource(spark, fetch, batch_size)


def kinesis_source(
    spark: SparkSession,
    get_records_fn: Callable[[int], list],
    batch_size: int = 10_000,
) -> BridgeSource:
    """Kinesis bridge (kinesis_source.h parity): key = partition key,
    value = record data. get_records_fn(limit) returns
    [(partition_key: str, data: bytes|str, arrival_time_ms: int)] —
    wrap boto3 `kinesis.get_records(ShardIterator=…, Limit=limit)` and
    advance the shard iterator in the closure. One BridgeSource per
    shard mirrors the reference's per-partition consumer."""

    def fetch(max_records: int) -> list:
        out = []
        for pkey, data, ms in get_records_fn(max_records):
            if isinstance(data, (bytes, bytearray)):
                data = bytes(data).decode("utf-8")
            out.append((pkey, data, ms))
        return out

    return BridgeSource(spark, fetch, batch_size)
