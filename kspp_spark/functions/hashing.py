"""Engine-portable integer hashing — the shared primitive behind the
oracle-replayable dedup/sampling/scoring operators.

One definition so the cross-engine contract (60-bit width, hex
substring offsets) lives in exactly one place: a change here is a
deliberate, repo-wide break of bit-for-bit oracle parity, not an
accidental drift of one copy.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_long(c: Column, start: int = 1, length: int = 15) -> Column:
    """`length` hex chars of md5(c) read as an integer (60 bits for
    length=15 — ANSI-overflow-safe in int64). Identical in DuckDB as
    CAST('0x' || substr(md5(x), start, length) AS BIGINT) and in any
    engine with md5 + hex parsing — the property every portable-hash
    oracle in this repo relies on."""
    return F.conv(F.substring(F.md5(c), start, length), 16, 10).cast("long")
