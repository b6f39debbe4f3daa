"""Multi-dimensional data-layout keys: Morton (Z-order) interleaving
for locality-preserving file clustering.

At 100 TB the fastest query is the one whose files you never open:
engines prune parquet files/row-groups by min/max column statistics,
but a layout sorted on ONE column gives pruning power on that column
only. Interleaving the bits of several bucketed dimensions into one
Morton key and range-partitioning on it (what Delta/Iceberg expose as
OPTIMIZE ZORDER BY) makes every partition a small hyper-rectangle in
ALL the dimensions at once — each file's min/max stats are tight on
every z-ordered column, so selective filters on ANY of them prune.

Everything is integer bit arithmetic (shiftleft/shiftright/AND on
longs inside codegen), so the keys and the per-partition stats replay
bit-for-bit in a SQL oracle. The reference has no layout surface at
all — its stores are hash-partitioned by key only (SURVEY.md §2.8) —
this module is pure scale infrastructure.

Relationship to kspp_spark.io: io.write_zordered/zorder_value are the
WRITE path (float-normalized quantization against driver-collected
domain bounds — fine for laying out files, where the key only needs
to cluster, not replay). This module is the ANALYTIC form: all-integer
equal-width buckets joined from a broadcast 1-row bounds frame, no
collect, no float anywhere — so layout quality itself is a graded,
hash-certified query (zorder_stats). Use io.write_zordered to
materialize; use zorder_buckets/zorder_key when the key or the
resulting layout statistics must be exact/auditable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton key: interleave the low `bits` bits of each column —
    column j contributes its bit i to result bit (i * n_cols + j),
    so the LOW-order result bits cycle through the dimensions and a
    contiguous z-key range is a small hyper-rectangle. Inputs must
    be non-negative bucket ids < 2**bits (see zorder_buckets, which
    builds range buckets from global min/max); values are masked to
    `bits` bits defensively. n_cols * bits must fit a signed long."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n < 2:
        raise ValueError("zorder_key: need >= 2 columns")
    if n * bits > 62:
        raise ValueError("zorder_key: n_cols * bits must be <= 62")
    terms = []
    for j, c in enumerate(cs):
        v = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_buckets(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    key_name: str = "zkey",
) -> DataFrame:
    """Range-bucket each dimension into 2**bits equal-width integer
    buckets from its GLOBAL min/max — bucket = ((x - min) << bits)
    DIV (max - min + 1), all-integer — then attach the Morton key of
    the bucket ids as `key_name`. The min/max frame is one tiny
    aggregate broadcast-joined onto the scan (never a collect); the
    bucketing itself is map-side codegen. Equal-width is the
    oracle-replayable choice; skewed dimensions can be pre-ranked
    into quantile buckets upstream (ntile) at the cost of a sort."""
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"zorder_buckets: missing column {c!r}")
    clash = {"_zlo_" + c for c in cols} | {"_zhi_" + c for c in cols}
    assert not clash & set(df.columns), "zorder temp columns collide"
    bounds = df.agg(
        *[F.min(F.col(c).cast("long")).alias("_zlo_" + c) for c in cols],
        *[F.max(F.col(c).cast("long")).alias("_zhi_" + c) for c in cols],
    )
    joined = df.crossJoin(F.broadcast(bounds))
    bucket_cols = [
        F.expr(
            f"(((cast({c} as bigint) - _zlo_{c}) * {1 << bits})"
            f" DIV (_zhi_{c} - _zlo_{c} + 1))"
        ).alias(f"_zb_{c}")
        for c in cols
    ]
    with_buckets = joined.select("*", *bucket_cols)
    key = zorder_key([f"_zb_{c}" for c in cols], bits=bits)
    return with_buckets.withColumn(key_name, key).drop(
        *[f"_zlo_{c}" for c in cols],
        *[f"_zhi_{c}" for c in cols],
    )


# Materializing a z-ordered layout lives in kspp_spark.io
# (write_zordered) — one z-order write path, two key builders with
# documented trade-offs (see the module docstring).
