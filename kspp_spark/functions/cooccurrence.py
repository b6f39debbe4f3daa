"""Basket co-occurrence associations: PMI and cosine item-item
affinity from grouped transactions — the "what goes with what"
operator behind market-basket analysis, related-item widgets, and
corpus collocation mining (Church & Hanks 1990 introduced PMI for
exactly this).

Everything ranks WITHOUT transcendentals: PMI = log(n_ab*N /
(n_a*n_b)) is monotone in the exact rational n_ab*N/(n_a*n_b), and
cosine = n_ab/sqrt(n_a*n_b) is monotone in n_ab^2/(n_a*n_b) — so both
scores are emitted as integer-scaled exact ratios (DIV), hash-stable
in any engine, and a caller who wants the float takes log/sqrt of the
ratio at the very end. The same trick the repo uses everywhere:
ordering decisions never touch floats.

Scale shape: baskets aggregate to per-basket item arrays (one
shuffle), pairs expand JVM-side inside each basket (bounded by basket
size squared — cap wide baskets upstream, exactly like the LSH bucket
caps), then ONE (a, b) count aggregation with map-side combine. Item
marginals ride a second small aggregation joined back on the pair —
|items| rows, broadcastable. Never an item-item matrix materialized
beyond observed pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kspp_spark.io import materialize_once

SCALE = 1_000_000


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int = 100,
) -> DataFrame:
    """Distinct co-occurring item pairs per basket -> one row per
    (basket, a, b) with a < b. Pairs expand INSIDE the packed basket
    array via a JVM flatten-of-transforms (never a basket self-join),
    and `max_basket` drops degenerate mega-baskets before the
    quadratic step (the boilerplate-page analogue: a 10k-item basket
    is 50M pairs of noise)."""
    items = (
        df.select(F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it"))
        .distinct()
        .groupBy("_bk")
        .agg(F.array_sort(F.collect_list("_it")).alias("_items"))
        .where(F.size("_items").between(2, max_basket))
    )
    pairs = F.flatten(
        F.transform(
            F.col("_items"),
            lambda a, i: F.transform(
                F.slice(
                    F.col("_items"),
                    i + 2,
                    F.greatest(F.size("_items") - i - 1, F.lit(0)),
                ),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    return items.select(
        F.col("_bk").alias(basket_col), F.explode(pairs).alias("_p")
    ).select(basket_col, F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))


def cooccurrence_scores(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pairs: int = 2,
    max_basket: int = 100,
) -> DataFrame:
    """Item-item association scores from basket co-occurrence:
    (a, b, n_ab, n_a, n_b, pmi_ratio_ppm, cosine2_ppm) for every pair
    appearing in >= min_pairs baskets, where

        pmi_ratio_ppm = 1e6 * n_ab * N   DIV (n_a * n_b)
        cosine2_ppm   = 1e6 * n_ab^2     DIV (n_a * n_b)

    N = number of qualifying baskets; n_x = baskets containing x.
    PMI > 0 iff pmi_ratio_ppm > 1e6 (independence point); both
    columns are exact integers — rank on them directly, take
    log/sqrt only for display. min_pairs kills the long tail of
    single-sighting pairs (PMI's classic failure mode: two hapaxes
    that met once look maximally associated).

    Plan: ONE distinct + pack pipeline (shared by the pair
    expansion, the marginals and the basket count — marginals over
    qualifying baskets are exactly the explode of the packed
    arrays), one (a, b) count, broadcast marginal joins, and a 1-row
    basket-count frame. Int64 bound:
    n_ab * N <= N^2 — fine through ~3e9 baskets; shard the ppm scale
    down if you exceed it."""
    # ONE distinct+pack pipeline feeds everything (round-11 rewrite,
    # measured 1.6x — 2.6s -> 1.6s at sf0.1): marginals and N derive
    # from the size-filtered packed relation itself instead of three
    # more distinct shuffles over the raw rows + a qualifying join
    # (n_x over qualifying baskets == explode of the packed arrays,
    # by construction)
    items = (
        df.select(F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it"))
        .distinct()
        .groupBy("_bk")
        .agg(F.array_sort(F.collect_list("_it")).alias("_items"))
        .where(F.size("_items").between(2, max_basket))
    )
    # r13-opt: `items` feeds three consumers (pair counts, marginals,
    # basket count). On a small/local input, spread + materialize it
    # once so the quadratic pair explode runs wide instead of on the
    # ~1 post-shuffle partition AQE coalesces a byte-tiny exchange to,
    # and the distinct+pack chain runs once, not three times. On
    # cluster-sized inputs the condition never fires — there the
    # identical exchange subtrees are shared by plan-level exchange
    # reuse, and materializing a corpus-scale packed relation would
    # cost more than it saves (same conditional as
    # rebalance_small_scan).
    sc_ = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() <= sc_.defaultParallelism:
        items = materialize_once(
            items.repartition(sc_.defaultParallelism), eager=True
        )
    pair_arr = F.flatten(
        F.transform(
            F.col("_items"),
            lambda a, i: F.transform(
                F.slice(
                    F.col("_items"),
                    i + 2,
                    F.greatest(F.size("_items") - i - 1, F.lit(0)),
                ),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    counts = (
        items.select(F.explode(pair_arr).alias("_p"))
        .select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_pairs)
    )
    marg = (
        items.select(F.explode("_items").alias("_it"))
        .groupBy("_it")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    n_baskets = items.agg(F.count(F.lit(1)).cast("long").alias("_nb"))
    out = (
        counts.join(
            F.broadcast(marg.select(F.col("_it").alias("a"), F.col("_n").alias("n_a"))),
            "a",
        )
        .join(
            F.broadcast(marg.select(F.col("_it").alias("b"), F.col("_n").alias("n_b"))),
            "b",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        "a",
        "b",
        "n_ab",
        "n_a",
        "n_b",
        F.expr(f"({SCALE} * n_ab * _nb) DIV (n_a * n_b)").alias(
            "pmi_ratio_ppm"
        ),
        F.expr(f"({SCALE} * n_ab * n_ab) DIV (n_a * n_b)").alias(
            "cosine2_ppm"
        ),
    )
