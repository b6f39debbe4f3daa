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
