"""Mergeable frequency sketches — Count-Min (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005).

The reference keeps exact per-key counters (mem_counter_store.h:8-144)
— fine per partition, unbounded at corpus scale. A Count-Min sketch
bounds frequency state at width × depth cells regardless of key
cardinality, overestimates only (never under), and MERGES by cell-wise
addition — the property that makes it the distributed/streaming
counting structure: every partition builds its own sketch map-side and
the shuffle carries at most width × depth rows per mapper.

The hash family is the repo-wide engine-portable md5_long with a
per-row salt, so builds and estimates replay bit-exactly in a SQL
oracle — a DETERMINISTIC sketch: approximate with respect to truth,
exact with respect to the algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kspp_spark.functions.hashing import md5_long


def cms_bucket(item: Column, row: int, width: int) -> Column:
    """Bucket of `item` in sketch row `row`: md5_long("cms{row}:" ||
    item) % width. md5_long is 60-bit non-negative, so % is the
    mathematical mod in Spark and DuckDB alike."""
    return (
        md5_long(F.concat(F.lit(f"cms{row}:"), item)) % width
    ).cast("int")


def cms_build(
    df: DataFrame,
    col: str = "item",
    width: int = 1024,
    depth: int = 4,
    weight: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over `col` -> (row int, bucket int,
    cnt long), non-zero cells only (absent cell = 0 by contract).

    Plan shape: one map-side explode to depth (row, bucket) probes per
    input row, then ONE hash aggregation whose partial (map-side)
    combine bounds the shuffle at width × depth rows per mapper — the
    input's key cardinality never reaches the wire. Merging sketches
    built on different slices is cms_merge (cell-wise sum), so at
    100 TB each partition/day/source builds independently and the
    union re-aggregates."""
    if width < 1 or depth < 1:
        raise ValueError("cms_build: width and depth must be >= 1")
    item = F.col(col).cast("string")
    probes = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                cms_bucket(item, r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    w = (
        F.lit(1).cast("long")
        if weight is None
        else F.col(weight).cast("long")
    )
    return (
        df.select(F.explode(probes).alias("_rc"), w.alias("_w"))
        .groupBy(
            F.col("_rc.row").alias("row"),
            F.col("_rc.bucket").alias("bucket"),
        )
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (width, depth): cell-wise
    sum. Count-Min's linearity — the merged sketch is exactly the
    sketch of the concatenated inputs."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str = "item",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate each item's frequency: min over the depth rows
    of the item's cell (missing cell = 0). Guarantee: estimate >=
    true count always (one-sided error); over-estimate bounded by
    e·N/width with probability 1 - e^-depth.

    Plan shape: items fan out to depth probes, the sketch (≤ width ×
    depth rows — tiny) BROADCASTS to an equi-join on (row, bucket),
    then one min-aggregation per item."""
    item = F.col(col).cast("string")
    probes = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                cms_bucket(item, r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    probed = items.select(
        F.col(col), F.explode(probes).alias("_rc")
    ).select(col, F.col("_rc.row").alias("row"), F.col("_rc.bucket").alias("bucket"))
    joined = probed.join(
        F.broadcast(sketch), on=["row", "bucket"], how="left"
    )
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
            "est"
        )
    )


def cms_stream(
    stream: DataFrame,
    col: str = "item",
    width: int = 1024,
    depth: int = 4,
    weight: str | None = None,
) -> DataFrame:
    """Streaming Count-Min maintenance: because the sketch is LINEAR
    (cms_merge is cell-wise sum), the streaming form is just the
    build aggregation over an unbounded input — Spark's aggregation
    state IS the sketch, bounded at width × depth cells forever (the
    whole point: per-key counting state, mem_counter_store.h:8-144,
    grows with key cardinality; the sketch does not). Run in
    update/complete mode; no watermark needed — the state cannot
    grow. Exactly equal to cms_build over the concatenated batches
    (asserted by tests/test_streaming.py). The plan is literally
    cms_build's — batch and streaming share one definition."""
    return cms_build(
        stream, col=col, width=width, depth=depth, weight=weight
    )
