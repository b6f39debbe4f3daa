"""Planar grid analytics over integer projected coordinates — the
aggregate companions to the spatial joins (operators/joins.py
radius_join / knn_radius_join).

Reference parity: kspp has no spatial family (SURVEY.md §2); these
cover what a geo-enabled deployment would bolt on via PostGIS —
re-expressed as pure relational algebra on grid cells, trig-free
(project first — the radius_join contract), integer-exact so every
output hash-replays in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kspp_spark.io import materialize_once


def _cell(col: str, d: int):
    """Floor-division cell id toward -infinity, overflow-safe over
    int64 (the radius_join truncate-then-adjust idiom)."""
    return F.expr(
        f"({col} DIV {d}) - (CASE WHEN {col} < 0 "
        f"AND {col} % {d} != 0 THEN 1 ELSE 0 END)"
    )


def grid_hotspots(
    points: DataFrame,
    cell_size: int,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Grid hotspot score — the Getis-Ord-style local-density screen
    in exact integers: bucket points into cells of side `cell_size`,
    then score every occupied cell by how much denser it is than its
    3x3 neighborhood:

        score_ppm = (1_000_000 * 9 * n_cell) DIV n_neighborhood

    (n_neighborhood includes the cell itself, so a uniform field
    scores ~1e6 and an isolated spike scores up to 9e6). The classic
    z-score form needs global variance and sqrt; the ratio form
    keeps the ranking — which is what a hotspot screen is for — and
    stays integer-exact, the PSI/log() lesson applied to geo
    statistics.

    Returns (cx, cy, n, nbr_n, score_ppm), one row per OCCUPIED
    cell.

    Scale shape: ONE map-side-combinable cell count (the only
    corpus-sized step), then a 9x explode of the CELL table (cells,
    not points — bounded by occupied-cell count) + one equi-join
    aggregation. Never a point-level self-join, never a cross
    product."""
    if cell_size < 1:
        raise ValueError("grid_hotspots: cell_size must be >= 1")
    # r13-opt: cells feeds TWO consumers (the 9x neighbor explode +
    # the final join); without a lineage cut the corpus-sized cell
    # count ran once per branch. The cell table is bounded by
    # occupied-cell count — storing it lazily is strictly cheaper
    # than a second corpus pass at any scale. Durability: SCALE.md.
    cells = (
        points.select(
            _cell(x, cell_size).alias("cx"), _cell(y, cell_size).alias("cy")
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cells = materialize_once(cells)
    off = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    contrib = (
        cells.select("cx", "cy", "n", F.explode(off).alias("_ox"))
        .select("cx", "cy", "n", "_ox", F.explode(off).alias("_oy"))
        .select(
            (F.col("cx") + F.col("_ox")).alias("tx"),
            (F.col("cy") + F.col("_oy")).alias("ty"),
            "n",
        )
    )
    nbr = contrib.groupBy("tx", "ty").agg(F.sum("n").alias("nbr_n"))
    return (
        cells.join(
            nbr,
            (cells["cx"] == nbr["tx"]) & (cells["cy"] == nbr["ty"]),
        )
        .select(
            "cx",
            "cy",
            F.col("n").cast("long").alias("n"),
            F.col("nbr_n").cast("long").alias("nbr_n"),
            F.expr("(1000000 * 9 * n) DIV nbr_n").alias("score_ppm"),
        )
    )


def knn_label_vote(
    points: DataFrame,
    labels: DataFrame,
    k: int,
    radius: int,
    x: str = "x",
    y: str = "y",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """k-nearest-neighbor majority vote — the classic kNN classifier
    / label-smoothing step, composed from knn_radius_join: each
    point's k nearest IN-RADIUS neighbors vote with their label;
    ties break deterministically toward (more votes, nearer total
    distance, smaller label) so the winner hash-replays in SQL.
    Points with zero in-radius neighbors emit nothing (no evidence,
    no vote — the capped-kNN contract).

    Returns (id, voted_label, votes, n_neighbors).

    Scale shape: the knn_radius_join plan (grid candidates +
    WindowGroupLimit top-k) + one labels equi-join + one
    (point, label) aggregation + one max_by pick per point."""
    from kspp_spark.operators.joins import knn_radius_join

    nn = knn_radius_join(
        points, None, k=k, radius=radius, x=x, y=y, id_col=id_col
    )
    lab = labels.select(
        F.col(id_col).alias("_lid"), F.col(label_col).alias("_lbl")
    )
    votes = (
        nn.join(lab, nn["b"] == lab["_lid"])
        .groupBy("a", "_lbl")
        .agg(
            F.count(F.lit(1)).alias("_votes"),
            F.sum("dist2").alias("_d2sum"),
        )
    )
    # ONE min_by with a composite key: minimize (-votes, d2sum,
    # label) = most votes, then nearest summed distance, then
    # smallest label — fully deterministic, no second pass
    per_pt = votes.groupBy("a").agg(
        F.min_by(
            F.struct(
                F.col("_lbl").alias("l"), F.col("_votes").alias("v")
            ),
            F.struct(
                (-F.col("_votes")).alias("nv"),
                F.col("_d2sum").alias("d"),
                F.col("_lbl").alias("l"),
            ),
        ).alias("_w"),
        F.sum("_votes").alias("n_neighbors"),
    )
    return per_pt.select(
        F.col("a").alias(id_col),
        F.col("_w.l").alias("voted_label"),
        F.col("_w.v").cast("long").alias("votes"),
        F.col("n_neighbors").cast("long").alias("n_neighbors"),
    )
