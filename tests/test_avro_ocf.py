"""Pure-Python Avro OCF codec: wire-format golden bytes (pinned to the
public Avro spec's binary encoding), container round-trips through
Spark, and the jarless read_avro fallback."""

import datetime
import io

from kspp_spark.sources.avro_ocf import (
    build_container,
    parse_container,
    read_avro_ocf,
    write_avro_ocf,
    write_long,
)


def _enc_long(n):
    buf = io.BytesIO()
    write_long(buf, n)
    return buf.getvalue()


def test_zigzag_varint_golden_bytes():
    # values straight from the Avro spec's binary-encoding table
    assert _enc_long(0) == b"\x00"
    assert _enc_long(-1) == b"\x01"
    assert _enc_long(1) == b"\x02"
    assert _enc_long(-2) == b"\x03"
    assert _enc_long(2) == b"\x04"
    assert _enc_long(-64) == b"\x7f"
    assert _enc_long(64) == b"\x80\x01"


SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
}
ROWS = [
    (1, "alpha", 1.5, ["x", "y"]),
    (2, None, -2.25, []),
    (3, "y" * 100, 0.0, ["z"]),
]


def test_container_roundtrip_null_and_deflate_codecs():
    for codec in ("null", "deflate"):
        blob = build_container(SCHEMA, ROWS, codec=codec)
        schema, recs = parse_container(blob)
        assert schema == SCHEMA
        assert list(recs) == ROWS
    # deflate actually compresses the repetitive payload
    assert len(build_container(SCHEMA, ROWS, codec="deflate")) < len(
        build_container(SCHEMA, ROWS, codec="null")
    )


def test_spark_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "ocf")
    ts = datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    df = spark.createDataFrame(
        [(1, "a", 2.5, ts), (2, None, -1.0, None)],
        "id long, name string, score double, event_time timestamp",
    )
    write_avro_ocf(df, path, coalesce=1)
    back = read_avro_ocf(spark, path)
    assert [f.name for f in back.schema.fields] == [
        "id", "name", "score", "event_time",
    ]
    got = sorted((r.id, r.name, r.score, r.event_time) for r in back.collect())
    assert got == [(1, "a", 2.5, ts), (2, None, -1.0, None)]


def test_read_avro_falls_back_without_jar(spark, tmp_path):
    """sources/files.py read_avro: spark-avro jar absent in this
    container -> the pure-Python OCF path must serve the read."""
    from kspp_spark.sources.files import read_avro

    path = str(tmp_path / "ocf2")
    df = spark.createDataFrame([(i, f"doc{i}") for i in range(50)], "id long, text string")
    write_avro_ocf(df, path)
    got = sorted(r.id for r in read_avro(spark, path).collect())
    assert got == list(range(50))


def test_confluent_decode_without_jar(spark):
    """The Confluent-framed per-message decode path falls back to the
    Arrow-batched Python decoder when spark-avro is absent — the
    previously jar-gated path now runs everywhere."""
    import json

    from kspp_spark.sources.schema_registry import (
        SchemaRegistryClient,
        decode_confluent_topic,
    )

    schema = json.dumps(
        {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    )
    c = SchemaRegistryClient("http://r", fetch_fn=lambda u: json.dumps({"schema": schema}))
    frame = b"\x00" + (5).to_bytes(4, "big") + bytes([6])  # zigzag(3) = 6
    df = spark.createDataFrame([(frame,)], "value binary")
    decoded = decode_confluent_topic(df, c)
    assert [r.x for r in decoded[0][1].select("decoded.x").collect()] == [3]


def test_rotated_avro_sink_rotates_by_window(spark, tmp_path):
    """avro_file_sink.h rotation on the jarless path: one container
    directory per event-time window, contents readable per window."""
    import os

    from kspp_spark.sources.avro_ocf import rotated_avro_ocf_sink

    path = str(tmp_path / "rot")
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 10)),
        (2, datetime.datetime(2024, 1, 1, 0, 50)),
        (3, datetime.datetime(2024, 1, 1, 1, 10)),
    ]
    df = spark.createDataFrame(rows, "id long, event_time timestamp")
    rotated_avro_ocf_sink(df, path, window="1 hour")
    dirs = sorted(d for d in os.listdir(path) if d.startswith("window_start="))
    assert len(dirs) == 2  # hours 00 and 01
    first = read_avro_ocf(spark, os.path.join(path, dirs[0]))
    assert sorted(r.id for r in first.collect()) == [1, 2]
    second = read_avro_ocf(spark, os.path.join(path, dirs[1]))
    assert [r.id for r in second.collect()] == [3]


def test_split_read_multi_block_file_across_tasks(spark, tmp_path):
    """Sync-marker splitting: ONE multi-block container must fan out
    across >1 task (byte-range splits with Avro's sync/pastSync
    ownership convention) and still produce exactly the written rows —
    the property that keeps a 10 GB container from serializing into a
    single task on the jarless path."""
    from pyspark.sql import functions as F

    from kspp_spark.sources.avro_ocf import build_container, read_avro_ocf

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "body", "type": "string"},
        ],
    }
    n = 5000
    rows = [[i, f"row-{i}-" + "x" * 200] for i in range(n)]
    data = build_container(schema, rows, codec="deflate", block_rows=100)
    p = tmp_path / "big.avro"
    p.write_bytes(data)

    # split far below file size so a single file yields many ranges
    split = max(1024, len(data) // 7)
    df = read_avro_ocf(spark, str(p), split_bytes=split)
    n_tasks = df.rdd.getNumPartitions()
    assert n_tasks > 1, f"expected >1 split task, got {n_tasks}"

    got = df.orderBy("id").collect()
    assert len(got) == n
    assert [r.id for r in got] == list(range(n))
    assert got[1234].body == f"row-1234-" + "x" * 200

    # no duplicated block across adjacent splits
    assert df.groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_split_read_null_codec_and_single_block(spark, tmp_path):
    """Degenerate splits: a single-block file with splits narrower than
    the block must still decode every row exactly once (first split
    owns the block; later splits find no owned sync)."""
    from kspp_spark.sources.avro_ocf import build_container, read_avro_ocf

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "id", "type": "long"}],
    }
    rows = [[i] for i in range(500)]
    p = tmp_path / "one_block.avro"
    p.write_bytes(build_container(schema, rows, codec="null"))
    df = read_avro_ocf(spark, str(p), split_bytes=512)
    got = sorted(r.id for r in df.collect())
    assert got == list(range(500))


def test_rotated_avro_sink_handles_date_columns(spark, tmp_path):
    """Regression: the rotated sink shares write_avro_ocf's in-plan
    temporal conversion, so a date column round-trips instead of
    crashing the partition encoder."""
    import datetime

    from kspp_spark.sources.avro_ocf import read_avro_ocf, rotated_avro_ocf_sink

    rows = [
        (1, datetime.date(2024, 3, 1), datetime.datetime(2024, 1, 1, 0, 10)),
        (2, datetime.date(2024, 3, 2), datetime.datetime(2024, 1, 1, 2, 5)),
    ]
    df = spark.createDataFrame(rows, "id long, day date, event_time timestamp")
    dst = str(tmp_path / "rot")
    rotated_avro_ocf_sink(df, dst, window="1 hour")
    back = read_avro_ocf(spark, dst + "/window_start=*")
    got = {r.id: r.day for r in back.collect()}
    assert got == {1: datetime.date(2024, 3, 1), 2: datetime.date(2024, 3, 2)}
