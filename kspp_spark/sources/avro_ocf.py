"""Pure-Python Avro Object Container File codec + distributed reader.

Parity targets:
  generic_avro_file_source  include/kspp/sources/avro_file_source.h:8-47
  avro_file_sink            include/kspp/sinks/avro_file_sink.h:11-107

The container images ship neither the spark-avro jar nor a Python avro
package, but the OCF wire format is small and publicly specified
(Avro spec, "Object Container Files" + "Binary Encoding"), so the
generic subset a changelog pipeline needs — records of primitives,
nullable unions, arrays/maps, enums/fixed, logical timestamps, null +
deflate codecs — is implemented here self-contained. When the
spark-avro jar IS on the classpath, prefer it (sources/files.py
read_avro tries it first): it splits large deflate files by scanning
for sync markers and keeps decode fully JVM-side.

Scale shape of this fallback path: `spark.read.format("binaryFile")`
ships each .avro file to an executor and `mapInPandas` decodes blocks
there — parallelism is per FILE (an OCF file is only splittable by
sync-marker scanning, which the jar does and this fallback does not).
A 100 TB avro ingest arrives as many files, so per-file parallelism
saturates the cluster; a single giant file should go through the jar
path. Decoding is plain Python per record — fine for ingest-once
(bounded by I/O at typical block sizes), wrong for a hot loop; land
to parquet after ingest, which is what the topology does anyway.

Writes mirror the reference sink: one container file per Spark
partition (the reference writes one file per sink instance;
avro_file_sink.h:67-85's rotation maps to rotated_file_sink's
window partitioning with fmt="avro" once the jar exists — this
module's writer covers the jarless case for local/posix paths).
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

# ---------------------------------------------------------------- binary enc

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return _zigzag_decode(acc)


def _write_bytes(buf, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf) -> bytes:
    return buf.read(read_long(buf))


# ------------------------------------------------------------- schema-driven

def _decode(schema, buf):
    """Decode one value of `schema` (parsed avro JSON) from buf."""
    if isinstance(schema, list):  # union: long index picks the branch
        return _decode(schema[read_long(buf)], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return tuple(_decode(f["type"], buf) for f in schema["fields"])
        if t == "array":
            out = []
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    read_long(buf)
                for _ in range(n):
                    out.append(_decode(schema["items"], buf))
        if t == "map":
            out = {}
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    read_long(buf)
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf)
        if t == "enum":
            return schema["symbols"][read_long(buf)]
        if t == "fixed":
            return buf.read(schema["size"])
        return _decode(t, buf)  # e.g. {"type": "long", "logicalType": ...}
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise NotImplementedError(f"avro type not supported: {schema!r}")


def _encode(schema, v, buf) -> None:
    if isinstance(schema, list):  # nullable union convention
        for i, branch in enumerate(schema):
            if (v is None) == (branch == "null"):
                write_long(buf, i)
                return _encode(branch, v, buf)
        raise ValueError(f"no union branch for {v!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f, item in zip(schema["fields"], v):
                _encode(f["type"], item, buf)
            return
        if t == "array":
            if v:
                write_long(buf, len(v))
                for item in v:
                    _encode(schema["items"], item, buf)
            write_long(buf, 0)
            return
        if t == "map":
            if v:
                write_long(buf, len(v))
                for k, item in v.items():
                    _write_bytes(buf, k.encode("utf-8"))
                    _encode(schema["values"], item, buf)
            write_long(buf, 0)
            return
        if t == "enum":
            return write_long(buf, schema["symbols"].index(v))
        if t == "fixed":
            return buf.write(v)
        return _encode(t, v, buf)
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.write(b"\x01" if v else b"\x00")
    if schema in ("int", "long"):
        return write_long(buf, int(v))
    if schema == "float":
        return buf.write(struct.pack("<f", v))
    if schema == "double":
        return buf.write(struct.pack("<d", v))
    if schema == "bytes":
        return _write_bytes(buf, bytes(v))
    if schema == "string":
        return _write_bytes(buf, v.encode("utf-8"))
    raise NotImplementedError(f"avro type not supported: {schema!r}")


# --------------------------------------------------------------- containers

def parse_container(data: bytes):
    """Parse one OCF: returns (schema, iterator of decoded records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = _decode({"type": "map", "values": "bytes"}, buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(SYNC_SIZE)

    def records():
        while buf.read(1):  # peek EOF
            buf.seek(-1, 1)
            n = read_long(buf)
            block = buf.read(read_long(buf))
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec != "null":
                raise NotImplementedError(f"avro codec not supported: {codec}")
            if buf.read(SYNC_SIZE) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            bbuf = io.BytesIO(block)
            for _ in range(n):
                yield _decode(schema, bbuf)

    return schema, records()


def build_container(
    schema, rows, codec: str = "deflate", block_rows: int | None = None
) -> bytes:
    """Serialize rows (sequences matching the record schema) into one
    OCF byte string. `block_rows` caps records per data block — a
    multi-block container is what makes sync-marker splitting
    (read_avro_ocf) able to parallelize one large file; None keeps a
    single block."""
    sync = uuid.uuid4().bytes
    out = io.BytesIO()
    out.write(MAGIC)
    _encode(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        },
        out,
    )
    out.write(sync)

    def flush_block(block: io.BytesIO, n: int) -> None:
        payload = block.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        elif codec != "null":
            raise NotImplementedError(f"avro codec not supported: {codec}")
        write_long(out, n)
        write_long(out, len(payload))
        out.write(payload)
        out.write(sync)

    block = io.BytesIO()
    n = 0
    for row in rows:
        _encode(schema, row, block)
        n += 1
        if block_rows is not None and n >= block_rows:
            flush_block(block, n)
            block, n = io.BytesIO(), 0
    if n:
        flush_block(block, n)
    return out.getvalue()


# ---------------------------------------------------------- schema mapping

_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    "null": T.NullType(),
}
_TS_LOGICAL = ("timestamp-micros", "timestamp-millis")


def avro_to_spark_type(schema) -> T.DataType:
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise NotImplementedError("only [null, T] unions supported")
        return avro_to_spark_type(branches[0])
    if isinstance(schema, dict):
        t = schema["type"]
        if schema.get("logicalType") in _TS_LOGICAL:
            return T.TimestampType()
        if schema.get("logicalType") == "date":
            return T.DateType()
        if t == "record":
            return T.StructType(
                [
                    T.StructField(
                        f["name"], avro_to_spark_type(f["type"]), _nullable(f["type"])
                    )
                    for f in schema["fields"]
                ]
            )
        if t == "array":
            return T.ArrayType(avro_to_spark_type(schema["items"]))
        if t == "map":
            return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]))
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        return avro_to_spark_type(t)
    return _PRIMITIVES[schema]


def _nullable(schema) -> bool:
    return isinstance(schema, list) and "null" in schema


def spark_to_avro_schema(st: T.StructType, name: str = "topLevelRecord"):
    def conv(dt: T.DataType, field_name: str):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.IntegerType):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": conv(dt.elementType, field_name)}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": conv(dt.valueType, field_name)}
        if isinstance(dt, T.StructType):
            return spark_to_avro_schema(dt, field_name)
        raise NotImplementedError(f"no avro mapping for {dt}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": ["null", conv(f.dataType, f.name)]
                if f.nullable
                else conv(f.dataType, f.name),
            }
            for f in st.fields
        ],
    }


def _pythonize(schema, v):
    """Decoded value -> Spark-ingestible Python value (timestamps)."""
    import datetime

    if v is None:
        return None
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        return _pythonize(branches[0], v)
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "timestamp-micros":
            return datetime.datetime.fromtimestamp(
                v / 1_000_000, tz=datetime.timezone.utc
            ).replace(tzinfo=None)
        if lt == "timestamp-millis":
            return datetime.datetime.fromtimestamp(
                v / 1000, tz=datetime.timezone.utc
            ).replace(tzinfo=None)
        if lt == "date":
            return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
        t = schema["type"]
        if t == "record":
            return tuple(
                _pythonize(f["type"], item) for f, item in zip(schema["fields"], v)
            )
        if t == "array":
            return [_pythonize(schema["items"], item) for item in v]
        if t == "map":
            return {k: _pythonize(schema["values"], item) for k, item in v.items()}
        return _pythonize(t, v)
    return v


# ------------------------------------------------------------ Spark surface

def read_avro_ocf(
    spark: SparkSession, path: str, split_bytes: int = 32 << 20
) -> DataFrame:
    """Distributed OCF read with sync-marker byte-range splitting:
    every file fans out into ~split_bytes ranges, each decoded by its
    own task via mapInPandas. The DataFrame schema derives from the
    FIRST file's embedded writer schema (read driver-side — header
    bytes only); all files must share it (the reference source reads
    one container, avro_file_source.h:8-47, so this matches its
    contract). Local/shared-posix paths (executors re-open the file by
    name); the spark-avro jar path covers object stores."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, "*.avro"))) or (
        [path] if os.path.isfile(path) else []
    )
    if not files:
        raise FileNotFoundError(f"no .avro files under {path!r}")
    with open(files[0], "rb") as f:  # header only, never the whole file
        if f.read(4) != MAGIC:
            raise ValueError(f"not an Avro object container file: {files[0]}")
        meta = _decode({"type": "map", "values": "bytes"}, f)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    spark_schema = avro_to_spark_type(schema)
    col_names = [fld["name"] for fld in schema["fields"]]

    # sync-marker splitting: one task per ~split_bytes byte range, so a
    # single 10 GB container fans out instead of serializing into one
    # task (the property the spark-avro jar's FileFormat gives the jar
    # path). Ownership convention is Avro's own (DataFileReader.sync/
    # pastSync): a split [s, e) decodes blocks that START at offset
    # < e + SYNC_SIZE, beginning from the first sync marker found at
    # offset >= s — no duplicated and no orphaned blocks across splits.
    splits = []
    for fname in files:
        size = os.path.getsize(fname)
        n_splits = max(1, -(-size // split_bytes))
        step = -(-size // n_splits)
        splits.extend(
            (fname, i * step, min(size, (i + 1) * step))
            for i in range(n_splits)
        )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for fname, start, end in zip(
                pdf["path"], pdf["start"], pdf["end"]
            ):
                rows = [
                    _pythonize(schema, r)
                    for r in _read_split(fname, int(start), int(end))
                ]
                if rows:
                    yield pd.DataFrame(rows, columns=col_names)

    sdf = spark.createDataFrame(splits, "path string, start long, end long")
    # spread splits across tasks (createDataFrame packs small rows into
    # few partitions; each row here is a full byte-range of work)
    sdf = sdf.repartition(len(splits))
    return sdf.mapInPandas(decode, schema=spark_schema)


def _find_sync(f, sync: bytes, start: int, size: int) -> int:
    """Offset just past the first sync marker whose start offset is
    >= `start` (Avro DataFileReader.sync semantics); `size` if none."""
    f.seek(start)
    overlap = b""
    pos = start
    while True:
        chunk = f.read(1 << 20)
        if not chunk:
            return size
        data = overlap + chunk
        idx = data.find(sync)
        if idx != -1:
            return pos - len(overlap) + idx + SYNC_SIZE
        overlap = data[-(SYNC_SIZE - 1):]
        pos += len(chunk)


def _read_split(path: str, start: int, end: int):
    """Decode the records of the blocks owned by byte range [start, end)
    of one OCF file (see read_avro_ocf for the ownership convention)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"not an Avro object container file: {path}")
        meta = _decode({"type": "map", "values": "bytes"}, f)
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        sync = f.read(SYNC_SIZE)
        header_end = f.tell()
        pos = header_end if start == 0 else _find_sync(f, sync, start, size)
        while pos < min(end + SYNC_SIZE, size):
            f.seek(pos)
            n = read_long(f)
            block = f.read(read_long(f))
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec != "null":
                raise NotImplementedError(f"avro codec not supported: {codec}")
            if f.read(SYNC_SIZE) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            pos = f.tell()
            bbuf = io.BytesIO(block)
            for _ in range(n):
                yield _decode(schema, bbuf)


def _temporals_to_avro(df: DataFrame, extra=()) -> DataFrame:
    """Convert timestamp/date columns to their Avro integer forms
    (epoch-micros / epoch-days) IN-PLAN: foreachPartition deserializes
    temporal types through the executor's system timezone (session
    timeZone does not cover that Python path), so the integers must
    leave the JVM already converted — exact and worker-tz-independent.
    `extra` columns pass through untouched (e.g. a window tag)."""
    from pyspark.sql import functions as F

    if not any(
        isinstance(f.dataType, (T.TimestampType, T.DateType))
        for f in df.schema.fields
        if f.name not in extra
    ):
        return df

    def to_avro_col(f):
        if f.name in extra:
            return F.col(f.name)
        if isinstance(f.dataType, T.TimestampType):
            return F.unix_micros(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, T.DateType):
            return F.datediff(F.col(f.name), F.lit("1970-01-01")).alias(f.name)
        return F.col(f.name)

    return df.select(*[to_avro_col(f) for f in df.schema.fields])


def write_avro_ocf(
    df: DataFrame,
    path: str,
    codec: str = "deflate",
    coalesce: int | None = None,
    block_rows: int | None = None,
) -> None:
    """One container file per partition (the reference sink writes one
    file per instance; pass coalesce=1 for a single file). Local/posix
    paths only — the jar path handles distributed filesystems.
    block_rows caps records per data block so large containers split
    across tasks on read-back (sync-marker splitting)."""
    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    schema = spark_to_avro_schema(df.schema)
    df = _temporals_to_avro(df)
    if coalesce:
        df = df.coalesce(coalesce)

    def write_partition(rows):
        out_rows = [list(r) for r in rows]
        if not out_rows:
            return
        data = build_container(schema, out_rows, codec, block_rows=block_rows)
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        with open(fname, "wb") as f:
            f.write(data)

    df.foreachPartition(write_partition)


def rotated_avro_ocf_sink(
    df: DataFrame,
    path: str,
    event_time: str = "event_time",
    window: str = "1 hour",
    codec: str = "deflate",
) -> None:
    """Event-time-rotated avro containers (avro_file_sink.h:67-85) for
    the jarless path: one `window_start=<iso>/part-*.avro` container
    per (partition, window) — the same layout rotated_file_sink's
    partitionBy produces for parquet, so downstream directory listing
    and pruning work identically. With the spark-avro jar present,
    prefer rotated_file_sink(fmt="avro")."""
    from pyspark.sql import functions as F

    schema = spark_to_avro_schema(df.schema)
    n_cols = len(df.schema.fields)
    tagged = df.withColumn(
        "_w", F.window(F.col(event_time), window).start.cast("string")
    )
    # temporal conversion in-plan (shared with write_avro_ocf): the
    # window tag is already a string and passes through
    tagged = _temporals_to_avro(tagged, extra=("_w",))

    def write_partition(rows):
        from collections import defaultdict

        by_window = defaultdict(list)
        for r in rows:
            vals = list(r)[:n_cols]
            w = r._w
            by_window[w].append(vals)
        for w, out_rows in by_window.items():
            d = os.path.join(path, f"window_start={w}")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"part-{uuid.uuid4().hex}.avro"), "wb") as f:
                f.write(build_container(schema, out_rows, codec))

    tagged.foreachPartition(write_partition)
