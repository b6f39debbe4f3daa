"""Deterministic sampling & dataset splitting — training-pipeline
primitives.

Every sample here is a pure function of the row's id (md5-derived
bucket), never of RNG state, partitioning, or row order. That is the
property a 100 TB curation pipeline actually needs: the train/val/test
assignment of a document is stable across reruns, repartitions,
cluster sizes, and even engines — so downstream caches stay valid and
an oracle can replay the exact same selection in SQL.

The hash is the first 15 hex chars (60 bits) of md5(id-as-string),
read as an integer — expressible identically in Spark
(`conv(substr(md5(x),1,15),16,10)`) and ANSI/DuckDB SQL
(`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), and safe under
Spark's ANSI overflow rules (60 bits < int64).

Scale notes: bucket assignment, splits, and stratified filters are
map-only (no shuffle, survive any repartition); exact-k per stratum is
one shuffle on the stratum key with a bounded per-group heap.

Beyond-reference operators (north-star training-data pipeline); kspp
has no sampling surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from kspp_spark.functions.hashing import md5_long

N_BUCKETS = 10_000


def hash_bucket(col: Column | str, salt: str = "") -> Column:
    """Deterministic, engine-portable bucket in [0, N_BUCKETS)."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(c.cast("string"), F.lit(salt))) % N_BUCKETS


def split_assign(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Adds a `split` column ('train'/'val'/'test' by default) chosen
    by the id's hash bucket; weights must sum to 1.0.

    `id_col` may be ANY column, not just a row id: pass a GROUP key
    (registrable domain, source, author) and every row of a group
    lands in the same split — the leakage-free grouped split that
    keeps near-duplicate pages of one site out of both train and
    test (asserted by tests/test_operators.py::
    test_split_assign_grouped_is_leakage_free). Map-only either
    way: the assignment is a pure function of the column."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(id_col, salt)
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name]
        cond = bucket < int(round(edge * N_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def sample_fraction(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~fraction of rows (by id hash)."""
    return df.filter(hash_bucket(id_col, salt) < int(round(fraction * N_BUCKETS)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'click'
    events to 10% but keep all 'error's). Map-only: the threshold is a
    CASE over the stratum column, no join needed."""
    thr = None
    for value, frac in fractions.items():
        n = int(round(frac * N_BUCKETS))
        cond = F.col(strata_col) == value
        thr = F.when(cond, n) if thr is None else thr.when(cond, n)
    thr = (
        F.lit(int(round(default_fraction * N_BUCKETS)))
        if thr is None
        else thr.otherwise(int(round(default_fraction * N_BUCKETS)))
    )
    return df.filter(hash_bucket(id_col, salt) < thr)


def topk_per_stratum(
    df: DataFrame, strata_col: str, id_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Exactly k rows per stratum, chosen deterministically (smallest
    id-hash first, id tiebreak). The reservoir-sampling replacement:
    same marginal uniformity, but reproducible and engine-portable.
    One shuffle on the stratum key; rank is a bounded heap per group."""
    h = hash_bucket(id_col, salt).alias("_h")
    w = W.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_h", "_rk")
    )


def shuffle_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    buckets: int = 1024,
) -> DataFrame:
    """Deterministic GLOBAL training order: (id_col, shuffle_rank),
    rank 1..N by (md5(id||salt), id) — the reproducible corpus shuffle
    a training run wants (same permutation across reruns, cluster
    sizes, and engines; re-salt for a new epoch order).

    Scale shape — a global rank WITHOUT a single-partition window:
    the 60-bit md5 key is uniform, so bucket = key DIV ceil(2^60/B)
    is a map-only, arithmetically balanced range partition; per-bucket
    counts (<= `buckets` rows, the bounded driver control plane)
    prefix-sum into offsets, and rank = within-bucket row_number +
    offset. One shuffle of (id, key); deterministic across executions
    because the bucket function is pure arithmetic, never sampled
    boundaries. The oracle replays it as ROW_NUMBER() OVER (ORDER BY
    key, id)."""
    key = md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    width = (1 << 60) // buckets + 1
    narrow = df.select(
        F.col(id_col),
        key.alias("_k"),
    ).withColumn("_b", F.expr(f"_k DIV {width}").cast("int"))
    counts = sorted(
        (r._b, r["count"]) for r in narrow.groupBy("_b").count().collect()
    )
    offsets, acc = {}, 0
    for b, n in counts:
        offsets[b] = acc
        acc += n
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    w = W.partitionBy("_b").orderBy("_k", id_col)
    return narrow.select(
        F.col(id_col),
        (F.row_number().over(w) + omap[F.col("_b")]).cast("long").alias(
            "shuffle_rank"
        ),
    )


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "",
    balance_col: str | None = None,
) -> DataFrame:
    """Deterministic output sharding for training data.

    Without `balance_col`: shard = md5(id||salt) % n_shards — pure
    map, count-balanced by hash uniformity, stable under reruns and
    repartitions. Output: df + shard.

    With `balance_col` (e.g. a token count): LPT-style serpentine —
    rows rank globally by (weight DESC, md5, id) and snake across
    shards (0..n-1, n-1..0, ...), so each shard's WEIGHT sum is
    near-equal, not just its row count (the classic longest-
    processing-time approximation, done distributively). The global
    rank uses per-VALUE offsets: one count per distinct balance value
    (the bounded driver control plane — token lengths have small
    bounded cardinality; don't pass continuous columns) + a window
    per value. The other extreme — one value dominating — serializes
    that value's window into one task: bucket the weight first
    (e.g. token count DIV 16) if its distribution is degenerate.
    Output: (id_col, balance_col, shard).
    """
    if balance_col is None:
        return df.withColumn(
            "shard",
            (
                md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
                % n_shards
            ).cast("int"),
        )
    key = md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    narrow = df.select(
        F.col(id_col), F.col(balance_col).alias("_w0"), key.alias("_k")
    )
    counts = [
        (r._w0, r["count"]) for r in narrow.groupBy("_w0").count().collect()
    ]
    if any(v is None for v, _ in counts):
        raise ValueError("shard_assign: balance_col must be non-NULL")
    counts.sort(key=lambda t: -t[0])
    if len(counts) > 65536:
        raise ValueError(
            "shard_assign: balance_col cardinality too high for the "
            "per-value offset map — bucket the weight first (e.g. "
            "token count DIV 16)"
        )
    offsets, acc = {}, 0
    for v, n in counts:
        offsets[v] = acc
        acc += n
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    w = W.partitionBy("_w0").orderBy("_k", id_col)
    rank0 = F.row_number().over(w) - 1 + omap[F.col("_w0")]
    pos = rank0 % (2 * n_shards)
    shard = F.when(pos < n_shards, pos).otherwise(2 * n_shards - 1 - pos)
    return narrow.select(
        F.col(id_col),
        F.col("_w0").alias(balance_col),
        shard.cast("int").alias("shard"),
    )


def mix_corpus(
    df: DataFrame,
    source_col: str,
    weights: dict[str, int],
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Corpus mixture control: downsample sources so the output follows
    the target integer weight ratios exactly (e.g. {web:3, books:1} →
    3:1), keeping as many rows as the scarcest source allows. Sources
    absent from `weights` are dropped.

    Quotas are derived distributively — per-source counts, one 1-row
    min aggregate broadcast back (k_s = w_s · min_s⌊n_s/w_s⌋) — and
    rows are chosen deterministically (smallest id-hash first), so the
    mix is reproducible and engine-replayable. Shuffles: one count agg
    + one rank window on the source key; no driver-side state.
    """
    wexpr = None
    for s, w in weights.items():
        cond = F.col(source_col) == s
        wexpr = F.when(cond, w) if wexpr is None else wexpr.when(cond, w)
    wexpr = wexpr.otherwise(F.lit(None))

    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_w", wexpr)
        .filter(F.col("_w").isNotNull())
        .withColumn("_unit", F.floor(F.col("_n") / F.col("_w")).cast("long"))
    )
    t = counts.agg(F.min("_unit").alias("_t"))
    quota = counts.join(F.broadcast(t)).select(
        source_col, (F.col("_w") * F.col("_t")).cast("long").alias("_k")
    )
    h = hash_bucket(id_col, salt).alias("_h")
    w_rank = W.partitionBy(source_col).orderBy("_h", id_col)
    ranked = df.withColumn("_h", h).withColumn("_rk", F.row_number().over(w_rank))
    return (
        ranked.join(F.broadcast(quota), source_col)
        .filter(F.col("_rk") <= F.col("_k"))
        .drop("_h", "_rk", "_k")
    )


def sample_weighted(
    df: DataFrame,
    weight: Column | str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-row IMPORTANCE sampling: keep a row with probability equal
    to its own weight column (clamped to [0, 1]) — e.g. keep documents
    proportionally to a quality score, the standard quality-weighted
    corpus downsampling move.

    Deterministic like everything in this module: the row's uniform
    draw is md5(id || salt) / 2^60, a pure function of the id — so
    the kept set is stable across reruns/partitionings/engines and
    replayable in SQL (u and the comparison are identical IEEE doubles
    in any engine). Different `salt` values give independent draws.
    Map-only; survives any repartition.

    NULL weights are treated as 0.0 (the row is dropped) — coalesced
    explicitly so the contract is visible: a partially-null quality
    column shrinks the kept set by exactly its null rows, never
    silently via NULL-comparison semantics.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    h = md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    u = h.cast("double") / F.lit(float(1 << 60))
    p = F.coalesce(w.cast("double"), F.lit(0.0))
    return df.filter(u < F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0)))
