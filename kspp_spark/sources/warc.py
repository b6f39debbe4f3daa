"""WARC (Web ARChive, ISO 28500) ingestion — the standard container
format of web crawls (Common Crawl, Internet Archive, heritrix), i.e.
the raw input of every web-corpus curation pipeline this library's
boilerplate/Gopher/dedup tiers consume. Beyond-reference capability
(kspp has no web-archive surface); the parser is written to the
public spec only.

Format (ISO 28500 / WARC 1.0-1.1): a WARC file is a concatenation of
records; each record is

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...          (headers; Content-Length required)
    \\r\\n
    <Content-Length bytes of block>
    \\r\\n\\r\\n                         (record separator)

and a ``.warc.gz`` is a concatenation of GZIP MEMBERS, one record per
member (the Common Crawl convention) — Python's gzip handles member
concatenation transparently, so one decompressed stream parses the
same either way.

Scale shape: Spark's `binaryFile` source assigns ONE FILE PER TASK
(WARC is not arbitrarily splittable — record boundaries are only
discoverable by scanning), so parallelism = file count; Common Crawl
ships ~1 GB segments in the tens of thousands, which parallelizes a
cluster fine. Payload bytes go straight from the Arrow batch into the
output binary column — never through the driver. The 2 GB
per-file limit of binaryFile is the documented bound (real crawl
segments stay under it by convention). A splittable-gzip custom
input format is the beyond-2GB path, out of scope here. For GB-scale
segments also set spark.sql.execution.arrow.maxRecordsPerBatch=1 so
an Arrow batch never holds several segments' bytes at once.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_no", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def parse_warc_stream(data: bytes) -> Iterator[dict]:
    """Parse one WARC file's bytes (plain or gzip — multi-member
    handled by gzip itself) into record dicts. Strict on structure
    (a malformed Content-Length or version line raises ValueError
    naming the offset — silent resync would hide truncation), but
    tolerant of trailing CRLF/LF padding between records."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    buf = io.BytesIO(data)
    n = 0
    while True:
        # skip inter-record padding
        line = buf.readline()
        while line in (b"\r\n", b"\n"):
            line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"warc: expected version line at offset "
                f"{buf.tell() - len(line)}, got {line[:40]!r}"
            )
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            # continuation lines (obs-fold) append to the last header
            if h[:1] in (b" ", b"\t") and headers:
                last = next(reversed(headers))
                headers[last] += " " + h.strip().decode("utf-8", "replace")
                continue
            name, _, value = h.partition(b":")
            headers[name.strip().decode("ascii", "replace").lower()] = (
                value.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"warc: record {n} bad Content-Length") from e
        block = buf.read(length)
        if len(block) != length:
            raise ValueError(
                f"warc: record {n} truncated "
                f"({len(block)}/{length} payload bytes)"
            )
        yield {
            "record_no": n,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": block,
        }
        n += 1


def http_response_body(payload: bytes) -> bytes:
    """The entity body of an application/http response block: bytes
    after the first blank line (the HTTP status line + headers are
    the WARC block's prefix per the spec). Returns the input
    unchanged when no header terminator exists (non-HTTP block)."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = payload.find(sep)
        if idx >= 0:
            return payload[idx + len(sep):]
    return payload


_CHARSET_HEADER_RE = None  # compiled lazily (module import stays cheap)


def http_response_text(payload: bytes) -> str:
    """Charset-aware decoded entity body — the mojibake guard real
    crawls need (a third of the web is not UTF-8): the charset comes
    from, in order,
      1. the HTTP Content-Type header's charset parameter,
      2. an HTML meta declaration in the body's first 1024 bytes
         (<meta charset=...> or the http-equiv Content-Type form),
      3. UTF-8.
    Unknown charset names fall through to the next source; undecodable
    bytes are replaced (never dropped — curation gates downstream see
    the replacement character, a signal, not silence)."""
    import re as _re

    global _CHARSET_HEADER_RE
    if _CHARSET_HEADER_RE is None:
        _CHARSET_HEADER_RE = (
            _re.compile(
                rb"(?im)^content-type:[^\r\n]*?charset=[\"']?([A-Za-z0-9_.:-]+)"
            ),
            _re.compile(
                rb"(?i)<meta[^>]{0,200}?charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)"
            ),
        )
    header_rx, meta_rx = _CHARSET_HEADER_RE
    body = payload or b""
    headers = b""
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = body.find(sep)
        if idx >= 0:
            headers, body = body[:idx], body[idx + len(sep):]
            break
    candidates = []
    m = header_rx.search(headers)
    if m:
        candidates.append(m.group(1).decode("ascii", "replace"))
    m = meta_rx.search(body[:1024])
    if m:
        candidates.append(m.group(1).decode("ascii", "replace"))
    candidates.append("utf-8")
    import codecs

    for name in candidates:
        try:
            codecs.lookup(name)
        except LookupError:
            continue
        return body.decode(name, "replace")
    return body.decode("utf-8", "replace")


def _warc_records_fn(warc_types: tuple[str, ...] | None):
    """The (path, content) -> WARC_SCHEMA rows pandas map shared by
    the batch and streaming readers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_stream(bytes(content)):
                    if warc_types is not None and rec["warc_type"] not in warc_types:
                        continue
                    rec["warc_file"] = fpath
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return run


def read_warc(
    spark,
    path: str,
    warc_types: tuple[str, ...] | None = ("response",),
) -> DataFrame:
    """WARC files -> one row per record (WARC_SCHEMA). `warc_types`
    keeps only those record types ('response' by default — the
    crawled pages; pass None for all, including warcinfo/request/
    metadata). One file per task (see module docstring)."""
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        _warc_records_fn(warc_types), schema=WARC_SCHEMA
    )


# binaryFile's fixed schema, needed explicitly by the STREAMING reader
# (file-stream sources don't infer)
_BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def read_warc_stream(
    spark,
    path: str,
    warc_types: tuple[str, ...] | None = ("response",),
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """The STRUCTURED STREAMING face of read_warc: a directory of
    crawl segments consumed as they land (Spark's file stream source
    tracks processed files in the checkpoint), each micro-batch
    holding <= max_files_per_trigger segments' records. Pair with
    functions/web.crawl_dedup_stream for the canonical-URL LWW
    changelog and foreachBatch folds downstream — end state is
    ARRIVAL-ORDER INDEPENDENT because every stage keys on event time
    (warc_date), not processing order."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )
    return files.select("path", "content").mapInPandas(
        _warc_records_fn(warc_types), schema=WARC_SCHEMA
    )


WARC_GZ_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("chunk_no", T.IntegerType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("first_record_no", T.IntegerType()),
        T.StructField("n_records", T.IntegerType()),
    ]
)


def _gzip_member_spans(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(start, end, decompressed) for each gzip MEMBER of a multi-
    member .gz (the Common Crawl .warc.gz convention: one record per
    member, each independently decompressible). Member boundaries are
    only discoverable by decompressing — \\x1f\\x8b can occur inside
    compressed data — so this is inherently ONE sequential pass; the
    point of the index is to pay it once, without materializing
    payloads downstream."""
    import zlib

    pos, total = 0, len(data)
    while pos < total:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper, single member
        out = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError(
                f"warc.gz: truncated gzip member at offset {pos}"
            )
        end = total - len(d.unused_data)
        yield pos, end, out
        pos = end


def _count_warc_records(decompressed: bytes) -> int:
    return sum(1 for _ in parse_warc_stream(decompressed))


def index_warc_gz(
    spark, path: str, target_chunk_bytes: int = 64 << 20
) -> DataFrame:
    """Intra-file parallelism index for oversized .warc.gz segments:
    one sequential pass per file (one task, via binaryFile) walks the
    gzip MEMBER boundaries and groups consecutive members into chunks
    of ~``target_chunk_bytes`` COMPRESSED bytes, each independently
    decompressible — (warc_file, chunk_no, start, end,
    first_record_no, n_records). Feed to read_warc_indexed for N
    tasks per file instead of binaryFile's one. record_no numbering
    matches read_warc exactly (sequential within the file), so packed
    doc_ids are identical on either path.

    The index is tiny (one row per ~64 MB) — persist it as parquet
    next to the crawl and re-use it across every downstream run.
    Plain (non-gzip) WARC files raise: they have no member structure
    to split on (use read_warc, or gzip the segment)."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] != b"\x1f\x8b":
                    raise ValueError(
                        f"index_warc_gz: {fpath} is not gzip — plain WARC "
                        "has no member boundaries to split on"
                    )
                chunk_no, c_start, c_records, rec_no = 0, 0, 0, 0
                for start, end, out in _gzip_member_spans(data):
                    c_records += _count_warc_records(out)
                    if end - c_start >= target_chunk_bytes or end == len(
                        data
                    ):
                        rows.append(
                            {
                                "warc_file": fpath,
                                "chunk_no": chunk_no,
                                "start": c_start,
                                "end": end,
                                "first_record_no": rec_no,
                                "n_records": c_records,
                            }
                        )
                        chunk_no += 1
                        rec_no += c_records
                        c_start, c_records = end, 0
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_GZ_INDEX_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(
        run, schema=WARC_GZ_INDEX_SCHEMA
    )


def read_warc_indexed(
    spark,
    index_df: DataFrame,
    warc_types: tuple[str, ...] | None = ("response",),
    num_tasks: int | None = None,
) -> DataFrame:
    """The parallel read path over an index_warc_gz index: ONE TASK
    PER CHUNK (repartitioned to ``num_tasks`` or the chunk count) —
    each worker range-reads [start, end) of its file, decompresses
    just those gzip members, and parses records with record_no
    continuing from first_record_no, so the output is row-identical
    to read_warc on the same files (property-tested). Workers open
    the file directly (file:// URIs from binaryFile are unwrapped);
    an object-store crawl would swap in fsspec here — the range-read
    contract is the same."""
    idx = index_df
    n = num_tasks
    if n is None:
        n = idx.count()
    idx = idx.repartition(max(int(n), 1), "warc_file", "chunk_no")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                fpath = r.warc_file
                for prefix in ("file://", "file:"):
                    if fpath.startswith(prefix):
                        fpath = fpath[len(prefix):]
                        break
                with open(fpath, "rb") as f:
                    f.seek(r.start)
                    data = f.read(r.end - r.start)
                rec_no = int(r.first_record_no)
                for rec in parse_warc_stream(data):
                    rec["record_no"] = rec_no
                    rec_no += 1
                    if (
                        warc_types is not None
                        and rec["warc_type"] not in warc_types
                    ):
                        continue
                    rec["warc_file"] = r.warc_file
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return idx.mapInPandas(run, schema=WARC_SCHEMA)


def warc_to_documents(
    warc_df: DataFrame,
    id_offset: int = 0,
    with_date: bool = False,
    id_mode: str = "packed",
) -> DataFrame:
    """Shape WARC response records into this library's `documents`
    table form: (doc_id, url, text) — HTTP headers stripped, body
    decoded utf-8 (errors replaced). Two doc_id derivations:

    * ``id_mode='packed'`` (default): file-hash slot (2^40) x
      record_no (2^20) — ids are MONOTONIC WITHIN A FILE (useful for
      ordered replay/debugging). A record_no >= 2^20 would silently
      bleed into the next file-hash slot, so the expression RAISES at
      evaluation time instead (Common Crawl segments hold ~100k
      records; 2^20 is ~10x headroom). File-hash birthday collisions
      run ~0.45% at 100k files — acceptable for one crawl segment
      fleet, not for a multi-crawl lake: use 'hash64' there.
    * ``id_mode='hash64'``: xxhash64(warc_file, record_no) — the full
      64-bit space, birthday-safe at any fleet size (~1e-5 at 2
      BILLION records), ids not file-ordered.

    Feed straight into the curation tiers (boilerplate -> gopher ->
    dedup); `with_date` carries warc_date through for latest-capture
    URL dedup (functions/web.latest_capture_per_url)."""
    # Arrow-batched charset-aware body extraction (a plain Python UDF
    # would be the row-at-a-time slow path this repo bans from hot
    # paths)
    @F.pandas_udf(T.StringType())
    def body_arrow(p: pd.Series) -> pd.Series:
        return p.map(
            lambda b: http_response_text(bytes(b)) if b is not None else None
        )

    if id_mode == "hash64":
        did = F.xxhash64("warc_file", "record_no") + F.lit(id_offset)
    elif id_mode == "packed":
        packed = (
            F.pmod(F.xxhash64("warc_file"), F.lit(1 << 40)) * F.lit(1 << 20)
            + F.col("record_no")
            + F.lit(id_offset)
        )
        did = F.when(F.col("record_no") < F.lit(1 << 20), packed).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "warc_to_documents: record_no >= 2^20 overflows the "
                        "packed doc_id slot in "
                    ),
                    F.col("warc_file"),
                    F.lit(" — use id_mode='hash64'"),
                )
            ).cast("long")
        )
    else:
        raise ValueError(f"warc_to_documents: unknown id_mode {id_mode!r}")
    return warc_df.select(
        did.cast("long").alias("doc_id"),
        F.col("target_uri").alias("url"),
        *([F.col("warc_date")] if with_date else []),
        body_arrow(F.col("payload")).alias("text"),
    )
