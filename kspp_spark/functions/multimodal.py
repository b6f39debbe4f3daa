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
import struct
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


def parse_image_header(data: bytes) -> dict:
    """REAL image header parse from public byte-format specs — no
    codec library needed, because dimensions/channels live in fixed
    header fields:

    - PNG (RFC 2083 / W3C): 8-byte signature, then the IHDR chunk —
      width/height as big-endian uint32 at offsets 16/20, color type
      at 25 (0 gray=1ch, 2 RGB=3ch, 3 palette=1ch, 4 gray+alpha=2ch,
      6 RGBA=4ch). CRCs are NOT validated (header parse, not decode).
    - JPEG (ITU T.81): SOI then marker segments; the SOFn frame
      header (0xC0-0xCF except DHT 0xC4 / JPG 0xC8 / DAC 0xCC)
      carries height/width as big-endian uint16 and the component
      count (1 gray, 3 YCbCr/RGB, 4 CMYK). Segments before SOFn are
      skipped via their length fields.
    - GIF (GIF87a/89a): logical screen width/height as little-endian
      uint16 at offsets 6/8; palette-indexed RGB => 3 channels.

    Returns {format, width, height, channels}; raises ValueError for
    unrecognized/truncated bytes (callers decide whether unknown
    media is an error or a NULL row)."""
    import struct

    d = data or b""
    if d[:8] == b"\x89PNG\r\n\x1a\n":
        if len(d) < 26 or d[12:16] != b"IHDR":
            raise ValueError("png: truncated or missing IHDR")
        w, h = struct.unpack(">II", d[16:24])
        color_type = d[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            raise ValueError(f"png: bad color type {color_type}")
        return {"format": "png", "width": w, "height": h, "channels": channels}
    if d[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(d):
            if d[i] != 0xFF:
                raise ValueError(f"jpeg: bad marker byte at {i}")
            marker = d[i + 1]
            if marker == 0xFF:  # fill bytes before a marker
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers: no length field
                continue
            seg_len = struct.unpack(">H", d[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                # d[i + 9] (component count) needs i + 10 bytes present
                if i + 10 > len(d):
                    raise ValueError("jpeg: truncated SOF")
                h, w = struct.unpack(">HH", d[i + 5 : i + 9])
                return {
                    "format": "jpeg",
                    "width": w,
                    "height": h,
                    "channels": d[i + 9],
                }
            i += 2 + seg_len
        raise ValueError("jpeg: no SOF marker found")
    if d[:6] in (b"GIF87a", b"GIF89a"):
        if len(d) < 10:
            raise ValueError("gif: truncated screen descriptor")
        w, h = struct.unpack("<HH", d[6:10])
        return {"format": "gif", "width": w, "height": h, "channels": 3}
    raise ValueError("unrecognized image format")


def build_image_bytes(fmt: str, width: int, height: int, channels: int) -> bytes:
    """Minimal VALID header bytes for the given image geometry — the
    deterministic media synthesizer for pipelines/tests without real
    media (the inverse of parse_image_header; round-tripping the two
    is what the media_decode oracle certifies). Only headers: pixel
    data is absent (PNG CRCs zeroed), so real decoders should not be
    pointed at these."""
    import struct

    if fmt == "png":
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        ihdr = struct.pack(">II", width, height) + bytes(
            [8, color_type, 0, 0, 0]
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + b"\x00\x00\x00\x00"  # CRC not validated by the parser
        )
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        sof_len = 8 + 3 * channels
        sof = (
            b"\xff\xc0"
            + struct.pack(">HB", sof_len, 8)
            + struct.pack(">HH", height, width)
            + bytes([channels])
            + bytes(3 * channels)
        )
        return b"\xff\xd8" + app0 + sof
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + bytes(3)
    raise ValueError(f"unknown format {fmt!r}")


def synthesize_test_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, media): deterministic header-only image bytes derived from
    each row — format cycles png/jpeg/gif by id, width from the text's
    byte length, height from the id (closed forms an external SQL
    oracle replays without parsing bytes). Arrow-batched builder; the
    geometry derivation is documented in decode_image_headers'
    oracle."""
    src = df.select(
        F.col(id_col),
        F.coalesce(F.length(F.encode(F.col(text_col), "utf-8")), F.lit(0)).alias(
            "_n"
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = []
            for id_, n in zip(pdf[id_col], pdf["_n"]):
                fmt = ["png", "jpeg", "gif"][int(id_) % 3]
                width = 1 + int(n) % 640
                height = 1 + int(id_) % 480
                channels = (
                    3
                    if fmt == "gif"
                    else (3 if int(id_) % 2 == 0 else (4 if fmt == "png" else 1))
                )
                media.append(build_image_bytes(fmt, width, height, channels))
            yield pd.DataFrame({id_col: pdf[id_col], "media": media})

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("media", T.BinaryType())]
    )
    return src.mapInPandas(run, schema=out_schema)


def decode_image_headers(
    df: DataFrame, media: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Binary media -> (id, format, width, height, channels, n_bytes)
    via the REAL public-spec header parser (parse_image_header) — the
    exactly-certifiable slice of image decode: dimensions and channel
    count without any codec library. Unrecognized bytes yield a NULL
    format row (metadata-only pipelines keep the doc; gates filter).
    Same Arrow-batched mapInPandas shape as the pluggable-codec
    decode_media — bytes never reach the driver."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict = {
                id_col: pdf[id_col],
                "format": [],
                "width": [],
                "height": [],
                "channels": [],
                "n_bytes": [],
            }
            for b in pdf[media]:
                try:
                    meta = parse_image_header(b)
                # IndexError/struct.error guard real-crawl malformed
                # bytes the spec checks miss — one bad image must yield
                # a NULL row, never kill the Arrow task
                except (ValueError, IndexError, struct.error):
                    meta = {
                        "format": None,
                        "width": None,
                        "height": None,
                        "channels": None,
                    }
                cols["format"].append(meta["format"])
                cols["width"].append(meta["width"])
                cols["height"].append(meta["height"])
                cols["channels"].append(meta["channels"])
                cols["n_bytes"].append(len(b or b""))
            yield pd.DataFrame(cols)

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
