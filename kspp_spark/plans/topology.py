"""Fluent topology surface — the kspp user API re-expressed.

Parity target: topology_builder / topology
(include/kspp/topology_builder.h:10-27, topology.h:10-168, §3 of
SURVEY.md). In kspp the user composes processors per partition:

    auto t = builder.create_topology();
    auto src = t->create_processor<kafka_source<...>>(part, topic);
    auto fm  = t->create_processor<flat_map<...>>(src, extractor);
    auto cnt = t->create_processor<count_by_key<...>>(fm, 1000);
    t->start(OFFSET_BEGINNING); t->flush();

Here the same pipeline is a `Stream` chain; the "topology" IS the
Catalyst logical plan, `start/flush` is an action, partitions are
Spark tasks. One declaration serves batch and streaming (pass a
readStream DataFrame to `Topology.source`).

    t = Topology(spark)
    (t.source(events)
      .flat_map(F.split("value", " "), alias="word")
      .count_by_key("word")
      .to_memory("counts"))
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession

from kspp_spark.operators import aggregates as agg_ops
from kspp_spark.operators import joins as join_ops
from kspp_spark.operators import stateless as sl_ops
from kspp_spark.streaming.stateful import rate_limit_batch, rate_limit_stream


@dataclass
class Stream:
    """A named edge in the topology: wraps a DataFrame, every method
    returns a new Stream so chains read like kspp topologies."""

    df: DataFrame

    # ---- stateless (§2.3)
    def filter(self, predicate: Column | str) -> "Stream":
        return Stream(sl_ops.filter_(self.df, predicate))

    def transform(self, *exprs: Column | str) -> "Stream":
        return Stream(sl_ops.transform(self.df, *exprs))

    def transform_value(self, **named: Column) -> "Stream":
        return Stream(sl_ops.transform_value(self.df, **named))

    def flat_map(self, explode_col: Column, alias: str, keep=(), where=None) -> "Stream":
        return Stream(sl_ops.flat_map(self.df, explode_col, alias, keep, where))

    def merge(self, *others: "Stream") -> "Stream":
        return Stream(sl_ops.merge(self.df, *[o.df for o in others]))

    def repartition_by_foreign_key(self, routing: "Stream", key: str, fk: str) -> "Stream":
        return Stream(
            sl_ops.repartition_by_foreign_key(self.df, routing.df, key, fk)
        )

    def rate_limit(
        self, key: str, event_time: str, filltime_ms: int, capacity: int
    ) -> "Stream":
        fn = rate_limit_stream if self.df.isStreaming else rate_limit_batch
        return Stream(fn(self.df, key, event_time, filltime_ms, capacity))

    def throughput_limit(
        self,
        event_time: str,
        msgs_per_sec: float,
        partition_key: str | None = None,
    ) -> "Stream":
        """thoughput_limiter (thoughput_limiter.h): capacity-1 token
        bucket refilling every 1000/msgs_per_sec ms, per partition
        source (or one global bucket when partition_key is None)."""
        from kspp_spark.streaming.stateful import (
            throughput_limit_batch,
            throughput_limit_stream,
        )

        fn = throughput_limit_stream if self.df.isStreaming else throughput_limit_batch
        return Stream(fn(self.df, event_time, msgs_per_sec, partition_key))

    def delay(
        self, key: str, value: str, event_time: str, delay_ms: int
    ) -> "Stream":
        """delay (delay.h): streaming = watermark-gated hold/release;
        batch = identity — a batch flush's tick is past every
        event_time + delay by definition (topology flush semantics)."""
        if self.df.isStreaming:
            from kspp_spark.streaming.stateful import delay_stream

            return Stream(delay_stream(self.df, key, value, event_time, delay_ms))
        return Stream(self.df)

    def dedup(self, text: str = "text", id_col: str = "doc_id") -> "Stream":
        """Exact content dedup (beyond-reference surface)."""
        from kspp_spark.functions.dedup import exact_dedup

        return Stream(exact_dedup(self.df, text, id_col))

    # ---- aggregations (§2.4)
    def count_by_key(self, key, out: str = "cnt") -> "Stream":
        return Stream(agg_ops.count_by_key(self.df, key, out))

    def count_by_value(self, key, value, out: str = "total") -> "Stream":
        return Stream(agg_ops.count_by_value(self.df, key, value, out))

    def ktable(self, key, value_cols, event_time="event_time", **kw) -> "Stream":
        return Stream(agg_ops.ktable(self.df, key, value_cols, event_time, **kw))

    def windowed_count(self, event_time, slot_width, key=None, out="cnt") -> "Stream":
        return Stream(agg_ops.windowed_count(self.df, event_time, slot_width, key, out))

    def hopping_count(self, event_time, width, hop, key=None, out="cnt") -> "Stream":
        return Stream(agg_ops.hopping_count(self.df, event_time, width, hop, key, out))

    def session_windows(self, event_time, gap, key, out="cnt") -> "Stream":
        return Stream(agg_ops.session_window_count(self.df, event_time, gap, key, out))

    def salted_count(self, key, buckets: int = 16, out: str = "cnt") -> "Stream":
        from kspp_spark.operators.skew import salted_count

        return Stream(salted_count(self.df, key, buckets, out))

    # ---- joins (§2.5)
    def left_join(self, table: "Stream", on, broadcast=True) -> "Stream":
        return Stream(join_ops.kstream_left_join(self.df, table.df, on, broadcast))

    def inner_join(self, table: "Stream", on, broadcast=True) -> "Stream":
        return Stream(join_ops.kstream_inner_join(self.df, table.df, on, broadcast))

    def outer_join(self, table: "Stream", on) -> "Stream":
        return Stream(join_ops.ktable_outer_join(self.df, table.df, on))

    def asof_join(self, right: "Stream", key, ts, seq, right_payload=(), prefix="r_") -> "Stream":
        return Stream(
            join_ops.asof_join(
                self.df, right.df, key=key, ts=ts, seq=seq,
                right_payload=list(right_payload), prefix=prefix,
            )
        )

    # ---- warehouse overlays (beyond-reference)
    def scd2(self, key, value_cols, event_time="event_time", **kw) -> "Stream":
        """SCD type-2 history of this changelog (every version with
        its validity interval) — aggregates.scd2_history."""
        return Stream(
            agg_ops.scd2_history(self.df, key, value_cols, event_time, **kw)
        )

    def scd2_lookup(
        self, history: "Stream", key, fact_time="event_time", **kw
    ) -> "Stream":
        """Point-in-time join of this fact stream against an SCD2
        history Stream — aggregates.scd2_lookup_join."""
        return Stream(
            agg_ops.scd2_lookup_join(self.df, history.df, key, fact_time, **kw)
        )

    def cascade_rollup(self, event_time, keys, measures, **kw) -> "Stream":
        """Multi-grain time rollup (finest grain scans once, coarser
        grains re-aggregate partials) — aggregates.cascade_rollup."""
        return Stream(
            agg_ops.cascade_rollup(self.df, event_time, list(keys), measures, **kw)
        )

    def positional_index(self, id_col="doc_id", text_col="text", **kw) -> "Stream":
        """Materialize the positional retrieval index of this document
        stream — functions/text.positional_index."""
        from kspp_spark.functions.text import positional_index

        return Stream(
            positional_index(self.df, id_col=id_col, text_col=text_col, **kw)
        )

    def bm25(self, query_terms, k=10, id_col="doc_id", text_col="text", **kw) -> "Stream":
        """BM25 top-k retrieval over this document stream —
        functions/text.bm25_topk."""
        from kspp_spark.functions.text import bm25_topk

        return Stream(
            bm25_topk(
                self.df, list(query_terms), k=k, id_col=id_col,
                text_col=text_col, **kw,
            )
        )

    # ---- terminals (§2.2)
    def visit(self, fn: Callable) -> None:
        sl_ops.visitor(self.df, fn)

    def to_memory(self, name: str):
        if self.df.isStreaming:
            return (
                self.df.writeStream.format("memory").queryName(name)
                .outputMode("update").start()
            )
        self.df.createOrReplaceTempView(name)
        return self.df

    def to_console(self, n: int = 20) -> None:
        self.df.show(n, truncate=False)

    def to_rotated_files(
        self,
        path: str,
        event_time: str = "event_time",
        window: str = "1 hour",
        fmt: str = "parquet",
    ) -> None:
        """avro_file_sink equivalent: event-time-rotated file output."""
        from kspp_spark.sinks.writers import rotated_file_sink

        rotated_file_sink(self.df, path, event_time, window, fmt)

    def to_mqtt(
        self,
        publish,
        key: str = "key",
        value: str = "value",
        retain_live: bool = False,
    ) -> None:
        """mqtt_sink (mqtt_sink.h): key -> topic, value -> payload,
        tombstones -> retained empty messages; injectable transport."""
        from kspp_spark.sinks.external import mqtt_sink

        mqtt_sink(publish, key, value, retain_live)(self.df, 0)

    def to_null(self) -> None:
        self.df.write.format("noop").mode("overwrite").save()

    def collect(self):
        return self.df.collect()

    # ---- materialized-table interactive lookup (§3.3)
    def get(self, key_col: str, key_value):
        """ktable.h:99-101 `table->get(key)`: point lookup into a
        materialized table. Returns the Row or None. At scale this is
        a partition-pruned/pushdown filter, not a scan — and for
        high-QPS serving the table should be persisted to a keyed
        store (the reference's RocksDB role)."""
        from pyspark.sql import functions as F

        rows = self.df.filter(F.col(key_col) == F.lit(key_value)).take(1)
        return rows[0] if rows else None

    def __iter__(self):
        """`for (auto r : *table)` parity (kspp.h:442-446): iterate the
        materialized rows via toLocalIterator — one partition at a time
        on the driver, never the whole table at once."""
        return iter(self.df.toLocalIterator())


class Topology:
    """topology_builder equivalent. Sources return Streams; everything
    else chains off them. `flush()` semantics are Spark actions on the
    terminal Streams."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def source(self, df: DataFrame) -> Stream:
        return Stream(df)

    def mem_stream_source(self, rows, schema) -> Stream:
        """mem_stream_source equivalent (testing/injection)."""
        return Stream(self.spark.createDataFrame(rows, schema))

    def table(self, path: str) -> Stream:
        return Stream(self.spark.read.parquet(path))
