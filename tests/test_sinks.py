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
