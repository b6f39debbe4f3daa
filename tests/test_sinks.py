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
