"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (beyond-reference capability, BASELINE.json north star).

Design for 100 TB:
  * media bytes ride in `binary` columns next to a typed metadata
    struct — one scan serves both filtering (on metadata, pushed down)
    and processing (bytes reach Python only for selected rows);
  * decode / feature-extract / resize / frame-sample run as
    `mapInPandas` stages: Arrow-batched, schema-stable, partition-
    parallel — no driver involvement, no per-row Python overhead;
  * batch size is bounded via spark.sql.execution.arrow.maxRecordsPerBatch
    so executor memory holds (batch_rows x max_media_size).

The actual codec work (PIL/ffmpeg/soundfile) is NOT available in this
container, so decoders are pluggable: the default implementations are
deterministic fakes (clearly marked) that exercise the real plumbing —
schema, batching, partitioning — and raise NotImplementedError when a
real decode is requested without a codec library installed.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)


def attach_media_metadata(df: DataFrame, media: str = "media") -> DataFrame:
    """Cheap JVM-side metadata: size + content digest (no decode).
    Filter/dedup on these columns never touches Python."""
    return df.withColumn("media_n_bytes", F.length(F.col(media))).withColumn(
        "media_digest", F.md5(F.col(media))
    )


def _fake_decode(data: bytes) -> dict:
    """Deterministic FAKE decoder (no codec libs in this container):
    derives pseudo image properties from a content digest. Replace via
    the `decoder` argument with a real PIL/ffmpeg-backed callable."""
    h = hashlib.md5(data or b"").digest()
    return {
        "format": ["jpeg", "png", "webp"][h[0] % 3],
        "width": 64 + h[1] * 4,
        "height": 64 + h[2] * 4,
        "n_bytes": len(data or b""),
        "digest": h.hex(),
    }


def _require_real_codec() -> Callable[[bytes], dict]:
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real image decode requires PIL; install pillow or pass a "
            "custom decoder=... (the deterministic fake is the default)"
        ) from e

    def decode(data: bytes) -> dict:  # pragma: no cover
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(data))
        return {
            "format": (img.format or "?").lower(),
            "width": img.width,
            "height": img.height,
            "n_bytes": len(data),
            "digest": hashlib.md5(data).hexdigest(),
        }

    return decode


def decode_media(
    df: DataFrame,
    media: str = "media",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], dict] | None = None,
    real: bool = False,
) -> DataFrame:
    """Decode binary media -> (id, meta struct). mapInPandas keeps the
    Arrow batch shape: bytes never materialize on the driver."""
    fn = decoder or (_require_real_codec() if real else _fake_decode)
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("meta", MEDIA_META_SCHEMA)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "meta": [fn(b) for b in pdf[media]],
                }
            )

    return df.select(id_col, media).mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    media: str = "media",
    id_col: str = "doc_id",
    dim: int = 16,
    featurizer: Callable[[bytes], list] | None = None,
) -> DataFrame:
    """Binary -> embedding vector. Default: deterministic FAKE features
    (digest bytes scaled to [-1,1]) exercising the exact plumbing a
    real vision encoder would use (batched bytes in, fixed-width
    array<float> out)."""

    def fake(data: bytes) -> list:
        h = hashlib.sha256(data or b"").digest()
        return [(h[i % 32] - 128) / 128.0 for i in range(dim)]

    fn = featurizer or fake
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": [fn(b) for b in pdf[media]]}
            )

    return df.select(id_col, media).mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame,
    media: str = "media",
    id_col: str = "doc_id",
    width: int = 224,
    height: int = 224,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Binary -> resized binary. Default FAKE: truncate/pad bytes to a
    size proportional to the target area (real plumbing, stub math)."""

    def fake(data: bytes, w: int, h: int) -> bytes:
        data = data or b""
        target = max(1, (w * h) // 64)
        return (data * (target // max(1, len(data)) + 1))[:target]

    fn = resizer or fake
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("media", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": [fn(b, width, height) for b in pdf[media]],
                }
            )

    return df.select(id_col, media).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    media: str = "media",
    id_col: str = "doc_id",
    every_n: int = 10,
    sampler: Callable[[bytes, int], list] | None = None,
) -> DataFrame:
    """Video -> 1..N frame rows (flat-map shape). Default FAKE: chunk
    the byte stream; a real implementation samples key frames via
    ffmpeg. Output: (id, frame_idx, frame binary)."""

    def fake(data: bytes, n: int) -> list:
        data = data or b""
        chunk = max(1, len(data) // max(1, n))
        return [data[i : i + chunk] for i in range(0, len(data), chunk)][:n]

    fn = sampler or fake
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for id_, b in zip(pdf[id_col], pdf[media]):
                for i, fr in enumerate(fn(b, every_n)):
                    ids.append(id_)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, media).mapInPandas(run, schema=out_schema)
