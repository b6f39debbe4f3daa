"""Sink tests: event-time file rotation (avro_file_sink.h:67-85
semantics on the parquet path) and incremental-dedup state idempotence."""

import datetime
import os

from pyspark.sql import functions as F


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute, 0)


def test_rotated_file_sink_honors_window(spark, tmp_path):
    """Rotation width follows the `window` parameter (not hardcoded
    hourly): 40 minutes of events at window='15 minutes' land in three
    window directories, and a read-back filtered to one window start
    prunes to that partition alone."""
    from kspp_spark.sinks.writers import rotated_file_sink

    path = str(tmp_path / "rotated")
    rows = [(i, _ts(m)) for i, m in enumerate([1, 5, 16, 20, 31, 40])]
    df = spark.createDataFrame(rows, "id long, event_time timestamp")
    rotated_file_sink(df, path, event_time="event_time", window="15 minutes")

    # file-per-window layout: window_start=... directories, one per
    # 15-minute bucket that received data (00:00, 00:15, 00:30)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("window_start="))
    assert len(dirs) == 3, dirs

    back = spark.read.parquet(path)
    assert back.count() == 6
    # partition pruning: filtering one window reads one directory
    one = back.filter(F.col("window_start") == _ts(15))
    assert sorted(r.id for r in one.collect()) == [2, 3]
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_rotated_file_sink_daily_window(spark, tmp_path):
    """'1 day' must rotate daily — the regression the hourly hardcoding
    would fail (every hour would get its own directory)."""
    from kspp_spark.sinks.writers import rotated_file_sink

    path = str(tmp_path / "daily")
    rows = [
        (1, datetime.datetime(2024, 1, 1, 3, 0, 0)),
        (2, datetime.datetime(2024, 1, 1, 22, 0, 0)),
        (3, datetime.datetime(2024, 1, 2, 5, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "id long, event_time timestamp")
    rotated_file_sink(df, path, event_time="event_time", window="1 day")
    dirs = sorted(d for d in os.listdir(path) if d.startswith("window_start="))
    assert len(dirs) == 2, dirs


def test_incremental_dedup_replay_same_epoch_is_idempotent(spark, tmp_path):
    """Checkpoint-recovery replay: the state already contains the
    replayed epoch, so the probe must exclude the current epoch — the
    pair set stays identical instead of doubling into (a,b)+(b,a)."""
    from kspp_spark.streaming.dedup_incremental import probe_and_update

    state = str(tmp_path / "state")
    pairs = str(tmp_path / "pairs")
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    batch = spark.createDataFrame(
        [(1, base), (2, near)], "doc_id long, text string"
    )
    probe_and_update(batch, 0, state_dir=state, pairs_dir=pairs)
    first = {(r.new_id, r.dup_of) for r in spark.read.parquet(pairs).collect()}
    assert first == {(2, 1)}
    # replay the SAME epoch (as after a failure between state write and
    # checkpoint commit): output must not change
    probe_and_update(batch, 0, state_dir=state, pairs_dir=pairs)
    second = {(r.new_id, r.dup_of) for r in spark.read.parquet(pairs).collect()}
    assert second == first


def test_mqtt_messages_tombstone_is_retained_empty(spark):
    """mqtt_sink.h parity: key -> topic, value -> payload; a tombstone
    (NULL value) renders as a retained EMPTY payload — MQTT's
    retained-message-clear convention for deletes."""
    from kspp_spark.sinks.external import mqtt_messages

    df = spark.createDataFrame(
        [("sensors/t1", "21.5"), ("sensors/t2", None)], "key string, value string"
    )
    got = {r.topic: (r.payload, r.retain) for r in mqtt_messages(df).collect()}
    assert got == {"sensors/t1": ("21.5", False), "sensors/t2": ("", True)}

    retained = {
        r.topic: r.retain for r in mqtt_messages(df, retain_live=True).collect()
    }
    assert retained == {"sensors/t1": True, "sensors/t2": True}


def test_mqtt_sink_publishes_per_partition(spark, tmp_path):
    """End-to-end foreachBatch publish through an injectable transport:
    every row reaches the broker exactly once, tombstones as retained
    empties. The transport spools to files (publishes happen in
    executor pythons, so a driver list can't observe them)."""
    import glob
    import json
    import uuid

    from kspp_spark.sinks.external import mqtt_sink

    spool = str(tmp_path / "published")
    os.makedirs(spool, exist_ok=True)

    def publish(msgs):
        if not msgs:
            return
        with open(os.path.join(spool, uuid.uuid4().hex + ".json"), "w") as f:
            json.dump(msgs, f)

    write = mqtt_sink(publish)
    batch = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", None)], "key string, value string"
    ).repartition(3)
    write(batch, 0)

    published = []
    for path in glob.glob(os.path.join(spool, "*.json")):
        with open(path) as f:
            published.extend(tuple(m) for m in json.load(f))
    assert sorted(published) == [("a", "1", False), ("b", "2", False), ("c", "", True)]


def test_dbapi_upsert_sink_sqlite_end_to_end(spark, tmp_path):
    """Full reference upsert protocol (postgres_producer.cpp:147-238)
    through real SQL, sqlite standing in for Postgres: auto-DDL on the
    first batch, batched INSERT..ON CONFLICT upserts with intra-batch
    LWW dedupe, tombstone deletes — then verify the table contents."""
    import functools
    import sqlite3

    from pyspark.sql import types as T

    from kspp_spark.sinks.jdbc import dbapi_upsert_sink, schema_to_create_table

    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("val", T.LongType(), True),
            T.StructField("event_time", T.TimestampType(), True),
        ]
    )
    ddl = schema_to_create_table(schema, "kv", ["key"], dialect="sqlite")
    assert "CREATE TABLE IF NOT EXISTS kv" in ddl
    assert "key text NOT NULL" in ddl
    assert "PRIMARY KEY (key)" in ddl

    db = str(tmp_path / "sink.db")
    connect = functools.partial(sqlite3.connect, db, timeout=30)
    sink = dbapi_upsert_sink(
        connect, schema, "kv", ["key"], ["val"], dialect="sqlite"
    )

    # sqlite has no timestamp type; bind as ISO strings
    def batch(rows):
        df = spark.createDataFrame(
            [(k, v, _ts(m)) for k, v, m in rows], schema
        )
        return df.withColumn(
            "event_time", F.date_format("event_time", "yyyy-MM-dd HH:mm:ss")
        )

    # batch 1: plain inserts + an intra-batch duplicate (LWW: latest
    # event_time wins, reference splits these into sub-batches)
    sink(batch([("a", 1, 1), ("b", 2, 1), ("a", 10, 5)]), 0)
    with sqlite3.connect(db) as conn:
        got = dict(conn.execute("SELECT key, val FROM kv").fetchall())
    assert got == {"a": 10, "b": 2}

    # batch 2: upsert an existing key + insert a new one
    sink(batch([("b", 20, 6), ("c", 3, 6)]), 1)
    with sqlite3.connect(db) as conn:
        got = dict(conn.execute("SELECT key, val FROM kv").fetchall())
    assert got == {"a": 10, "b": 20, "c": 3}

    # batch 3: tombstone (null val) deletes 'a'; upsert 'c'
    sink(batch([("a", None, 7), ("c", 30, 7)]), 2)
    with sqlite3.connect(db) as conn:
        got = dict(conn.execute("SELECT key, val FROM kv").fetchall())
    assert got == {"b": 20, "c": 30}


def test_schema_to_create_table_postgres_types():
    """Type mapping mirrors the reference's avro2sql table
    (postgres_avro_utils.cpp:283-351): text/bytea/integer/bigint/
    float4/float8/boolean + arrays as typed postgres arrays."""
    from pyspark.sql import types as T

    from kspp_spark.sinks.jdbc import schema_to_create_table

    schema = T.StructType(
        [
            T.StructField("s", T.StringType(), False),
            T.StructField("b", T.BinaryType(), True),
            T.StructField("i", T.IntegerType(), True),
            T.StructField("l", T.LongType(), True),
            T.StructField("f", T.FloatType(), True),
            T.StructField("d", T.DoubleType(), True),
            T.StructField("bo", T.BooleanType(), True),
            T.StructField("arr", T.ArrayType(T.StringType()), True),
            T.StructField("dec", T.DecimalType(12, 2), True),
        ]
    )
    ddl = schema_to_create_table(schema, "t", ["s"], dialect="postgres")
    for frag in [
        "s text NOT NULL",
        "b bytea",
        "i integer",
        "l bigint",
        "f float4",
        "d float8",
        "bo boolean",
        "arr text[]",
        "dec numeric(12,2)",
        "PRIMARY KEY (s)",
    ]:
        assert frag in ddl, f"{frag!r} missing from:\n{ddl}"
