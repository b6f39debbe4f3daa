"""Multimodal plumbing tests: binary columns through mapInPandas with
stable schemas and correct batch shapes (decoders are deterministic
fakes; real codecs are pluggable)."""

import pytest
from pyspark.sql import functions as F

from kspp_spark.functions.multimodal import (
    attach_media_metadata,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture()
def media_df(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    # synthesize a binary media column from text bytes
    return docs.select("doc_id", F.encode("text", "utf-8").alias("media"))


def test_attach_metadata_jvm_only(spark, media_df):
    out = attach_media_metadata(media_df)
    row = out.filter(F.col("media_n_bytes") > 0).first()
    assert row.media_digest is not None and len(row.media_digest) == 32
    # plan stays JVM-side: no python eval nodes
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_decode_media_schema_and_determinism(spark, media_df):
    out = decode_media(media_df)
    rows = out.collect()
    assert len(rows) == 20
    r = rows[0]
    assert set(r.meta.asDict()) == {"format", "width", "height", "n_bytes", "digest"}
    again = {x.doc_id: x.meta for x in decode_media(media_df).collect()}
    assert all(again[x.doc_id] == x.meta for x in rows)  # deterministic


def test_real_decode_stubbed(spark, media_df):
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_media(media_df, real=True)


def test_extract_features_fixed_width(spark, media_df):
    out = extract_features(media_df, dim=16)
    rows = out.collect()
    assert all(len(r.features) == 16 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r.features)


def test_resize_and_frame_sample(spark, media_df):
    resized = resize_media(media_df, width=64, height=64)
    assert all(len(r.media) == 64 * 64 // 64 for r in resized.collect())
    frames = sample_frames(media_df, every_n=4)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)
    assert frames.schema["frame_idx"].dataType.simpleString() == "int"


def test_parse_image_header_golden():
    """Public-spec golden vectors: the parser reads dimensions and
    channels from hand-assembled PNG/JPEG/GIF headers, skips JPEG
    APP segments, and rejects junk."""
    import struct

    from kspp_spark.functions.multimodal import (
        build_image_bytes,
        parse_image_header,
    )

    # hand-assembled PNG 640x480 RGBA (color type 6)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + bytes([8, 6, 0, 0, 0])
        + b"\x00\x00\x00\x00"
    )
    assert parse_image_header(png) == {
        "format": "png", "width": 640, "height": 480, "channels": 4,
    }
    # JPEG with APP0 + quantization-table segment before SOF0
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + bytes(65)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    sof = (
        b"\xff\xc0" + struct.pack(">HB", 17, 8)
        + struct.pack(">HH", 123, 456) + bytes([3]) + bytes(9)
    )
    assert parse_image_header(b"\xff\xd8" + app0 + dqt + sof) == {
        "format": "jpeg", "width": 456, "height": 123, "channels": 3,
    }
    # GIF little-endian screen descriptor
    assert parse_image_header(b"GIF89a" + struct.pack("<HH", 320, 200) + bytes(3)) == {
        "format": "gif", "width": 320, "height": 200, "channels": 3,
    }
    # builder -> parser round trip across formats/channels
    for fmt, w, h, c in [
        ("png", 1, 1, 1), ("png", 640, 480, 3), ("png", 17, 400, 4),
        ("jpeg", 12, 34, 1), ("jpeg", 65535, 1, 3),
        ("gif", 2, 3, 3),
    ]:
        got = parse_image_header(build_image_bytes(fmt, w, h, c))
        assert got == {"format": fmt, "width": w, "height": h, "channels": c}
    # junk rejected
    import pytest as _pt

    for junk in (b"", b"not an image", b"\xff\xd8\x00\x00"):
        with _pt.raises(ValueError):
            parse_image_header(junk)
    # EVERY truncation prefix of a valid JPEG either raises ValueError
    # (never IndexError — the cut exactly at the SOF component-count
    # byte used to escape and kill the Arrow task) or, once all SOF
    # fields are present, yields the complete header
    full = build_image_bytes("jpeg", 10, 10, 3)
    want = {"format": "jpeg", "width": 10, "height": 10, "channels": 3}
    for cut in range(len(full)):
        try:
            assert parse_image_header(full[:cut]) == want
        except ValueError:
            pass


def test_decode_image_headers(spark):
    """The Arrow-batched header decode: real geometry out, NULL-format
    row (not an error) for unrecognized bytes, n_bytes always set."""
    from kspp_spark.functions.multimodal import (
        build_image_bytes,
        decode_image_headers,
    )

    rows = [
        (1, build_image_bytes("png", 100, 50, 3)),
        (2, build_image_bytes("jpeg", 7, 9, 1)),
        (3, b"junk bytes"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r for r in decode_image_headers(df).collect()}
    assert (got[1].format, got[1].width, got[1].height, got[1].channels) == (
        "png", 100, 50, 3,
    )
    assert (got[2].format, got[2].width, got[2].height, got[2].channels) == (
        "jpeg", 7, 9, 1,
    )
    assert got[3].format is None and got[3].n_bytes == 10
    assert got[4].format is None and got[4].n_bytes == 0
