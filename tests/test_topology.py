"""Topology fluent-API parity: the reference's example3 word-count and
example2 stream-table join expressed as chains (SURVEY.md §3)."""

from pyspark.sql import functions as F

from kspp_spark.functions.text import tokenize
from kspp_spark.plans import Topology


def test_word_count_chain(spark):
    # examples/example3-count: text -> flat_map(split) -> count_by_key
    t = Topology(spark)
    lines = t.mem_stream_source(
        [("the quick fox",), ("the lazy dog",)], "value string"
    )
    counts = (
        lines.flat_map(tokenize("value"), alias="word")
        .count_by_key("word")
        .to_memory("wordcounts")
    )
    got = {r.word: r.cnt for r in spark.sql("select * from wordcounts").collect()}
    assert got == {"the": 2, "quick": 1, "fox": 1, "lazy": 1, "dog": 1}


def test_stream_table_join_chain(spark):
    # examples/example2-join: event stream left-joined to a ktable
    t = Topology(spark)
    events = t.mem_stream_source(
        [("u1", 10), ("u2", 20), ("u3", 30)], "key string, v long"
    )
    changelog = t.mem_stream_source(
        [("u1", "x", 1), ("u1", "y", 2), ("u2", "z", 1)],
        "key string, name string, event_time long",
    )
    table = changelog.ktable("key", ["name"], "event_time")
    joined = events.left_join(table, on="key")
    got = {r.key: r.name for r in joined.collect()}
    assert got == {"u1": "y", "u2": "z", "u3": None}


def test_rate_limit_chain(spark):
    t = Topology(spark)
    ev = t.mem_stream_source(
        [("k", i, 1_000 * i) for i in range(5)], "key string, v long, event_time long"
    )
    ev.df = ev.df.withColumn("event_time", F.timestamp_millis("event_time"))
    out = ev.rate_limit("key", "event_time", filltime_ms=60_000, capacity=2)
    assert out.df.count() == 2  # bucket of 2, no refill within 5s


def test_windowing_and_asof_chain(spark):
    import datetime

    from pyspark.sql import types as T
    from kspp_spark.plans.topology import Topology

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    t = Topology(spark)
    src = t.mem_stream_source(
        [("a", 1, ts(0)), ("a", 2, ts(10)), ("a", 3, ts(90)), ("b", 4, ts(5))], schema
    )
    sessions = src.session_windows("ts", "30 minutes", "key").collect()
    assert {(r.key, r.cnt) for r in sessions} == {("a", 2), ("a", 1), ("b", 1)}

    hop = src.hopping_count("ts", "1 hour", "30 minutes").collect()
    assert sum(r.cnt for r in hop) >= 8  # each event in 2 windows

    salted = src.salted_count("key", buckets=4).collect()
    assert {(r.key, r.cnt) for r in salted} == {("a", 3), ("b", 1)}

    left = t.mem_stream_source([("a", 100, ts(20))], schema)
    j = left.asof_join(src, key="key", ts="ts", seq="v", right_payload=["v"], prefix="prior_")
    row = j.collect()[0]
    assert row.prior_v == 2  # latest src event strictly before ts(20)


def test_delay_dedup_and_rotated_sink_chain(spark, tmp_path):
    """Round-2 surface: batch delay is an identity (flush semantics),
    dedup chains like any processor, and the rotated-file terminal
    writes window directories."""
    import datetime
    import os

    from kspp_spark.plans.topology import Topology

    t = Topology(spark)
    rows = [
        (1, "same text body", datetime.datetime(2024, 1, 1, 0, 10)),
        (2, "same text body", datetime.datetime(2024, 1, 1, 0, 40)),
        (3, "different body", datetime.datetime(2024, 1, 1, 1, 10)),
    ]
    src = t.mem_stream_source(rows, "doc_id long, text string, event_time timestamp")
    delayed = src.delay("doc_id", "text", "event_time", delay_ms=5_000)
    assert delayed.df.count() == 3  # batch delay = identity

    deduped = delayed.dedup(text="text", id_col="doc_id")
    got = {(r.doc_id, r.n_dups) for r in deduped.collect()}
    assert got == {(1, 2), (3, 1)}  # lowest id survives, dup counted

    out = str(tmp_path / "rotated")
    src.to_rotated_files(out, window="30 minutes")
    dirs = sorted(d for d in os.listdir(out) if d.startswith("window_start="))
    assert len(dirs) == 3  # 00:00, 00:30, 01:00 windows


def test_materialized_table_get_and_iteration(spark):
    """§3.3 parity: after materializing a ktable, point lookups
    (table->get(key), ktable.h:99-101) and range iteration work."""
    import datetime

    from kspp_spark.plans.topology import Topology

    ts = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    t = Topology(spark)
    src = t.mem_stream_source(
        [("a", 1, ts(1)), ("a", 9, ts(5)), ("b", 7, ts(2))],
        "key string, value long, event_time timestamp",
    )
    table = src.ktable("key", ["value"])
    assert table.get("key", "a").value == 9  # LWW winner
    assert table.get("key", "zz") is None
    assert sorted((r.key, r.value) for r in table) == [("a", 9), ("b", 7)]


def test_topology_throughput_limit_and_mqtt_sink(spark, tmp_path):
    """The builder surface covers the round-3 operators: a topology can
    throughput-limit a stream and publish it to MQTT end to end."""
    import datetime
    import glob
    import json
    import os
    import uuid

    from kspp_spark.plans.topology import Topology

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (f"t/{i}", str(i), base + datetime.timedelta(milliseconds=100 * i))
        for i in range(10)
    ]
    t = Topology(spark)
    src = t.mem_stream_source(rows, "key string, value string, event_time timestamp")
    limited = src.throughput_limit("event_time", 5.0)  # refill 200ms -> every 2nd
    assert sorted(r.value for r in limited.collect()) == ["0", "2", "4", "6", "8"]

    spool = str(tmp_path / "mqtt")
    os.makedirs(spool, exist_ok=True)

    def publish(msgs):
        if msgs:
            with open(os.path.join(spool, uuid.uuid4().hex + ".json"), "w") as f:
                json.dump(msgs, f)

    limited.to_mqtt(publish)
    published = []
    for path in glob.glob(os.path.join(spool, "*.json")):
        with open(path) as f:
            published.extend(tuple(m) for m in json.load(f))
    assert sorted(p[1] for p in published) == ["0", "2", "4", "6", "8"]


def test_topology_warehouse_overlays(spark):
    """The fluent surface covers the round-5 warehouse operators:
    changelog -> scd2 -> point-in-time lookup, and cascade rollup."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from kspp_spark.plans.topology import Topology

    def t(s):
        return datetime(2024, 1, 1) + timedelta(seconds=s)

    topo = Topology(spark)
    chg = topo.source(
        spark.createDataFrame(
            [("k1", "v1", t(10)), ("k1", "v2", t(20))],
            "key string, value string, event_time timestamp",
        )
    )
    hist = chg.scd2(key="key", value_cols=["value"])
    assert {(r.value, r.is_current) for r in hist.df.collect()} == {
        ("v1", False),
        ("v2", True),
    }
    facts = topo.source(
        spark.createDataFrame(
            [(1, "k1", t(15))], "fid int, key string, event_time timestamp"
        )
    )
    looked = facts.scd2_lookup(hist, key="key", broadcast_history=True)
    assert [r.value for r in looked.df.collect()] == ["v1"]

    ev = topo.source(
        spark.createDataFrame(
            [("a", 1, t(0)), ("a", 2, t(3600))],
            "key string, value long, ts timestamp",
        )
    )
    grains = ev.cascade_rollup("ts", ["key"], {"n": ("value", "count")})
    got = {(r.grain, r.n) for r in grains.df.collect()}
    assert ("hour", 1) in got and ("day", 2) in got


def test_topology_retrieval_overlays(spark):
    """Fluent retrieval surface: document stream -> positional index,
    and BM25 top-k straight off the stream."""
    from kspp_spark.plans.topology import Topology

    topo = Topology(spark)
    docs = topo.source(
        spark.createDataFrame(
            [
                (1, "spark scan spark"),
                (2, "scan join"),
                (3, "spark join scan"),
            ],
            "doc_id long, text string",
        )
    )
    idx = docs.positional_index(min_df=2)
    rows = {(r.term, r.doc_id, r.tf) for r in idx.df.collect()}
    assert ("spark", 1, 2) in rows and ("scan", 2, 1) in rows

    top = docs.bm25(["spark"], k=2)
    got = [(r.doc_id, r.rank) for r in top.df.collect()]
    assert got[0] == (1, 1) and len(got) == 2
