"""Codec-layer tests (text/json/binary serdes parity; §1.2)."""

import pytest
from pyspark.sql import functions as F


def test_text_serdes_round_trips_types(spark):
    from kspp_spark.serdes import decode_text, encode_text

    df = spark.createDataFrame(
        [(b"42", b"true", b"3.5", b"hello")],
        "i binary, b binary, d binary, s binary",
    )
    row = df.select(
        decode_text("i", "long").alias("i"),
        decode_text("b", "bool").alias("b"),
        decode_text("d", "double").alias("d"),
        decode_text("s", "string").alias("s"),
    ).collect()[0]
    assert (row.i, row.b, row.d, row.s) == (42, True, 3.5, "hello")

    back = (
        spark.createDataFrame([(42, True)], "i long, b boolean")
        .select(encode_text("i").alias("i"), encode_text("b").alias("b"))
        .collect()[0]
    )
    assert (back.i, back.b) == ("42", "true")


def test_text_serdes_lenient_mode_nulls_bad_records(spark):
    """The reference logs+skips undecodable records; strict=False maps
    that to NULL instead of an ANSI cast error."""
    from kspp_spark.serdes import decode_text

    df = spark.createDataFrame([("42",), ("not-a-number",)], "v string")
    got = [r.x for r in df.select(decode_text("v", "long", strict=False).alias("x")).collect()]
    assert got == [42, None]
    with pytest.raises(Exception):
        df.select(decode_text("v", "long", strict=True).alias("x")).collect()


def test_json_serdes_round_trip_and_lenient_null(spark):
    from kspp_spark.serdes import decode_json, encode_json

    schema = "user string, clicks bigint"
    df = spark.createDataFrame(
        [('{"user":"u1","clicks":3}',), ("not json at all {",)], "v string"
    )
    rows = df.select(decode_json("v", schema).alias("j")).collect()
    assert (rows[0].j.user, rows[0].j.clicks) == ("u1", 3)
    assert rows[1].j is None or rows[1].j.user is None  # lenient

    back = (
        spark.createDataFrame([("u1", 3)], schema)
        .select(encode_json(F.struct("user", "clicks")).alias("v"))
        .collect()[0]
        .v
    )
    assert back == '{"user":"u1","clicks":3}'


def test_binary_serdes_passthrough(spark):
    from kspp_spark.serdes import decode_binary, encode_binary

    df = spark.createDataFrame([(b"\x00\x01\xff",)], "v binary")
    assert bytes(df.select(decode_binary("v").alias("v")).collect()[0].v) == b"\x00\x01\xff"
    s = spark.createDataFrame([("abc",)], "v string")
    assert bytes(s.select(encode_binary("v").alias("v")).collect()[0].v) == b"abc"


def test_protobuf_serdes_gated(spark, tmp_path):
    """spark-protobuf is a distribution component; decode builds only
    when the package is present — skip otherwise (same gating as the
    avro container path)."""
    from kspp_spark.serdes import decode_protobuf

    df = spark.createDataFrame([(b"\x08\x01",)], "v binary")
    try:
        df.select(decode_protobuf("v", "M", str(tmp_path / "x.desc"))).collect()
    except Exception as e:  # package absent or desc missing — both fine here
        pytest.skip(f"spark-protobuf unavailable: {type(e).__name__}")


def test_protobuf_py_decodes_spec_example(spark):
    """Jarless wire decode pinned to the protobuf spec's own example:
    field 1 = varint 150 encodes as 08 96 01; field 2 = string
    'testing' as 12 07 74..67. Unknown fields skip per the wire rules."""
    from kspp_spark.serdes import decode_protobuf_py

    fields = {1: ("a", "int"), 2: ("b", "string")}
    msg = bytes([0x08, 0x96, 0x01, 0x12, 0x07]) + b"testing"
    # trailing unknown field 3 (varint) must be skipped
    msg_unknown = msg + bytes([0x18, 0x2A])
    df = spark.createDataFrame([(msg,), (msg_unknown,)], "v binary")
    rows = df.select(decode_protobuf_py("v", fields).alias("m")).collect()
    assert [(r.m.a, r.m.b) for r in rows] == [(150, "testing"), (150, "testing")]


def test_protobuf_py_roundtrip_all_types(spark):
    from kspp_spark.serdes import decode_protobuf_py, encode_protobuf_py
    from pyspark.sql import functions as F

    fields = {
        1: ("i", "long"),
        2: ("s", "string"),
        3: ("d", "double"),
        4: ("flag", "bool"),
        5: ("z", "sint"),
        6: ("raw", "bytes"),
    }
    df = spark.createDataFrame(
        [(7, "x", 1.5, True, -42, b"\x00\xff"), (-3, "", 0.0, False, 0, b"")],
        "i long, s string, d double, flag boolean, z long, raw binary",
    )
    packed = df.select(
        encode_protobuf_py(F.struct(*[c for c in df.columns]), fields).alias("v")
    )
    back = packed.select(decode_protobuf_py("v", fields).alias("m")).select("m.*")
    got = sorted((r.i, r.s, r.d, r.flag, r.z, bytes(r.raw or b"")) for r in back.collect())
    # proto3 zero-values are absent on the wire -> decode as NULL;
    # normalize both sides to compare semantic content
    want = sorted([(7, "x", 1.5, True, -42, b"\x00\xff"), (-3, None, None, None, None, b"")])
    norm = [
        (a, b or None, c if c else None, d if d else None, e if e else None, f)
        for (a, b, c, d, e, f) in got
    ]
    assert norm == want
