"""State-store golden semantics from the reference's test2 suite.

Vectors transcribed from /root/reference/tests/test2_mem_store.cpp and
test2_mem_windowed_store.cpp:10-99:
  - insert/update visible
  - update with OLDER event_time ignored (LWW)
  - delete with OLDER event_time ignored
  - delete with NEWER event_time applies
  - windowed retention drops slots older than slot_width*nr_of_slots

The batch ktable() operator must reproduce the same final table.
"""

from pyspark.sql import functions as F, types as T

from kspp_spark.operators.aggregates import ktable, windowed_count

SCHEMA = T.StructType(
    [
        T.StructField("key", T.IntegerType()),
        T.StructField("value", T.StringType()),
        T.StructField("event_time", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def table_of(spark, ops):
    df = spark.createDataFrame(
        [(k, v, ts, i) for i, (k, v, ts) in enumerate(ops)], SCHEMA
    )
    t = ktable(df, key="key", value_cols=["value"], event_time="event_time", seq="seq")
    return {r.key: (r.value, r.event_time) for r in t.collect()}


def test_insert_then_update(spark):
    # test2_mem_store: plain insert + newer update wins
    assert table_of(spark, [(1, "a", 10), (1, "b", 20)]) == {1: ("b", 20)}


def test_update_with_older_ts_ignored(spark):
    # test2_mem_windowed_store.cpp:30-39
    assert table_of(spark, [(1, "new", 100), (1, "stale", 50)]) == {1: ("new", 100)}


def test_equal_ts_later_arrival_wins(spark):
    # mem_store.h:75-77 keeps strictly-newer check (>), so equal ts applies
    assert table_of(spark, [(1, "first", 100), (1, "second", 100)]) == {1: ("second", 100)}


def test_delete_with_older_ts_ignored(spark):
    # test2_mem_windowed_store.cpp:41-50
    assert table_of(spark, [(1, "kept", 100), (1, None, 50)]) == {1: ("kept", 100)}


def test_delete_with_newer_ts_applies(spark):
    # test2_mem_windowed_store.cpp:52-58
    assert table_of(spark, [(1, "gone", 100), (1, None, 150)]) == {}


def test_multi_key_mixed(spark):
    ops = [
        (1, "a", 10),
        (2, "x", 10),
        (1, "b", 20),
        (2, None, 30),
        (3, None, 5),
        (3, "z", 4),  # older than the tombstone -> stays deleted
    ]
    assert table_of(spark, ops) == {1: ("b", 20)}


def test_windowed_retention_filter(spark):
    """Slot-based retention (mem_windowed_store.h:132-135): records
    older than oldest kept slot are dropped. Batch equivalent: filter
    on watermark cutoff before windowed aggregation."""
    rows = [(1, "a", t * 1000) for t in range(20)]
    df = spark.createDataFrame(
        [(k, v, ts, i) for i, (k, v, ts) in enumerate(rows)], SCHEMA
    ).withColumn("event_time", F.timestamp_millis(F.col("event_time")))
    # slot_width=5s, nr_of_slots=2 -> keep events >= 10s (max=19s -> cutoff 10s)
    max_ts = df.agg(F.max("event_time")).collect()[0][0]
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 10 SECONDS")
    kept = df.filter(F.col("event_time") > cutoff)
    wc = windowed_count(kept, "event_time", "5 seconds", key="key")
    got = {(r.window_start.second, r.cnt) for r in wc.collect()}
    assert got == {(10, 5), (15, 5)}  # 10..14 in slot 10, 15..19 in slot 15
