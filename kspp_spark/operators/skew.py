"""Skew mitigation — salting for hot keys.

AQE's skew-join split (enabled in session.py) handles most runtime
skew for JOINS automatically; these helpers cover the cases AQE cannot:

  * salted_aggregate — a hot GROUP BY key concentrates an aggregation
    on one reducer. Two-phase salting: partial-aggregate on
    (key, salt), then merge per key. Both phases are partial-aggregable
    shuffles of bounded width, so the hottest key spreads over
    `buckets` reducers. Works for any algebraic aggregate
    (sum/count/min/max — pass the per-phase expressions).
  * salted_join — explicit salted replicate-join for engines/paths
    where AQE is off (e.g. inside foreachBatch micro-batch plans,
    which AQE skips in some versions): the skewed (big) side gets a
    deterministic salt in [0, buckets); the small side is replicated
    `buckets` times via explode; the join key becomes (key, salt).

Salts are DETERMINISTIC (hash of the full row / a chosen column), not
rand() — retries and speculative tasks must produce identical results
(rand() in a shuffle input breaks exactly-once recomputation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, buckets: int, from_col: str | Column | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, buckets). By default the
    salt hashes all columns (spreads identical-key rows evenly as long
    as payloads differ); pass `from_col` to salt from one column."""
    src = (
        [F.col(from_col) if isinstance(from_col, str) else from_col]
        if from_col is not None
        else [F.col(c) for c in df.columns]
    )
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*src), F.lit(buckets)))


def salted_count(df: DataFrame, key: str | list[str], buckets: int = 16, out: str = "cnt") -> DataFrame:
    """groupBy(key).count() resilient to hot keys: count per
    (key, salt), then sum the partials per key."""
    keys = [key] if isinstance(key, str) else list(key)
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, SALT_COL).agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out))


def salted_sum(
    df: DataFrame,
    key: str | list[str],
    value: str | Column,
    buckets: int = 16,
    out: str = "total",
) -> DataFrame:
    """groupBy(key).sum(value) with two-phase salting."""
    keys = [key] if isinstance(key, str) else list(key)
    v = F.col(value) if isinstance(value, str) else value
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, SALT_COL).agg(F.sum(v).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has hot keys and `small` is modest (its
    replication factor is `buckets`): big side salts deterministically,
    small side explodes one copy per salt value, and the join runs on
    (key, salt) so one hot key spreads across `buckets` tasks."""
    b = with_salt(big, buckets)
    s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    out = b.join(s, on=[key, SALT_COL], how=how)
    return out.drop(SALT_COL)
