"""Distributed model-evaluation metrics for classifier-driven
curation (the quality-classifier tier a 100-TB pipeline gates on).

The reference has no evaluation surface — kspp users eyeball counts
(SURVEY.md §2.6); but the moment a pipeline trains a quality
classifier (functions/text.train_linear_classifier) it needs AUC /
calibration to decide WHERE to put the keep-threshold, and at corpus
scale that evaluation is itself a big-data job. Everything here is
the histogram formulation: one hash aggregation over (group, score)
— map-side partial, bounded by the number of DISTINCT scores, which
for integer-scaled scores is bounded by the scale constant — then
window/agg over that small sketch. Never a global sort of raw rows,
never a per-row rank.

All counters are integers and every ratio is emitted as an exact
num/den pair (plus one IEEE double division, bit-identical across
engines), so the APPROXIMATE-free results replay exactly in a SQL
oracle — same discipline as functions/sketch.py.

ROC-AUC via the Mann-Whitney U statistic with the standard tie
correction (Hanley & McNeil 1982): AUC = P(s_pos > s_neg)
+ 0.5 * P(s_pos = s_neg). With per-score counts (np_s, nn_s) and
cum_nn_<s = negatives strictly below s:

    2U = sum_s  np_s * (2 * cum_nn_<s + nn_s)
    AUC = 2U / (2 * P * N)

which is exactly the trapezoidal area under the empirical ROC curve.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact ROC-AUC per group of an integer (or otherwise
    low-cardinality) score column against a boolean/0-1 label.

    Plan: ONE hash aggregation compresses the corpus to the
    per-(group, score) histogram (map-side combine; output bounded by
    |groups| x |distinct scores|, independent of row count), then a
    cumulative window ordered by score WITHIN each group walks the
    histogram — the window input is the sketch, not the data. Output
    is one row per group: n_pos, n_neg, auc_num (= 2U), auc_den
    (= 2*n_pos*n_neg), and auc = auc_num/auc_den as one IEEE double
    division (bit-stable in any engine).

    Groups with no positives or no negatives get auc_den = 0 and a
    NULL auc — AUC is undefined there, and emitting NULL (not 0.5)
    keeps the caller honest.
    """
    g = list(group_cols)
    lab = F.col(label_col).cast("long")
    hist = df.groupBy(*g, score_col).agg(
        F.sum(lab).alias("np_"),
        F.sum(F.lit(1) - lab).alias("nn_"),
    )
    w = (
        Window.partitionBy(*g)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = hist.withColumn(
        "cum_nn", F.coalesce(F.sum("nn_").over(w), F.lit(0))
    )
    out = contrib.groupBy(*g).agg(
        F.sum("np_").cast("long").alias("n_pos"),
        F.sum("nn_").cast("long").alias("n_neg"),
        F.sum(
            F.col("np_") * (2 * F.col("cum_nn") + F.col("nn_"))
        ).cast("long").alias("auc_num"),
    )
    den = (2 * F.col("n_pos") * F.col("n_neg")).cast("long")
    return out.withColumn("auc_den", den).withColumn(
        "auc",
        F.when(
            den > 0, F.col("auc_num").cast("double") / den.cast("double")
        ),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    score_max: int = 1_000_000,
) -> DataFrame:
    """Reliability-diagram bins for an integer score in
    [0, score_max]: bin b gets the rows with score in
    [b*score_max/n_bins, (b+1)*score_max/n_bins) (top edge closed),
    and reports n, n_pos, and score_sum — the caller derives
    predicted-vs-observed rates from the exact integers. ONE hash
    aggregation over at most n_bins keys; map-side combine makes the
    shuffle n_bins rows per mapper regardless of corpus size."""
    assert n_bins > 0 and score_max > 0
    lab = F.col(label_col).cast("long")
    s = F.col(score_col).cast("long")
    # integer DIV (the repo-wide exact-division idiom), never a
    # double `/` + cast — Spark truncates that cast, DuckDB rounds it
    b = F.least(
        F.expr(
            f"(cast({score_col} as bigint) * {n_bins}) DIV {score_max}"
        ),
        F.lit(n_bins - 1).cast("long"),
    )
    return (
        df.withColumn("bin", b)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lab).cast("long").alias("n_pos"),
            F.sum(s).cast("long").alias("score_sum"),
        )
    )


def confusion_at(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Confusion-matrix counts at a fixed keep-threshold (score >=
    threshold predicts positive): tp/fp/tn/fn per group in one
    map-side-combined aggregation. Ratios (precision/recall/F1) are
    the caller's division — the exact integers are what a driver can
    hash-certify."""
    lab = F.col(label_col).cast("long")
    pred = (F.col(score_col) >= F.lit(threshold)).cast("long")
    return df.groupBy(*list(group_cols)).agg(
        F.sum(pred * lab).cast("long").alias("tp"),
        F.sum(pred * (1 - lab)).cast("long").alias("fp"),
        F.sum((1 - pred) * lab).cast("long").alias("fn"),
        F.sum((1 - pred) * (1 - lab)).cast("long").alias("tn"),
    )


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    flag_col: str,
    z_num: int = 196,
    z_den: int = 100,
) -> DataFrame:
    """Per-group two-proportion z-test against the POOLED rate — "is
    this group's success rate significantly different from everyone
    else's?" — with the entire decision in exact integers.

    Group g contributes (k successes, n trials); its complement is
    (K-k, N-n). The pooled two-proportion z statistic squared is
    algebraically identical to the 2x2-table chi-square with 1 df
    (the standard identity z^2 == X^2), so the test uses the
    chi-square form directly:

        X^2 = N * (a*d - b*c)^2 / ((a+b)(c+d)(a+c)(b+d))

    with a=k, b=n-k, c=K-k, d=(N-n)-(K-k). Every term is an int64
    product; the significance decision X^2 > (z_num/z_den)^2 cross-
    multiplies to

        N * (ad - bc)^2 * z_den^2  >  z_num^2 * (row/col products)

    so `significant` is a pure EXACT-ARITHMETIC comparison — no
    sqrt, no float rounding anywhere in the decision, bit-identical
    in any engine. Default threshold z = 1.96 (95% two-sided).
    Output per group: n, k, the pooled totals as n_total/k_total
    (Spark resolves column names case-insensitively, so N beside n
    would be ambiguous), chi2 (ONE IEEE division over
    exactly-rounded operands — both engines cast the same exact
    integers to double, so even the float column hash-replays), and
    significant. Degenerate margins (all-success / all-failure
    pools) yield NULL chi2, significant = 0 — the honest default.

    Plan: ONE hash aggregation to per-group (n, k), a 1-row pooled
    total broadcast back, map-side EXACT algebra in DECIMAL(38,0) —
    num = N*det^2 has a DATA-DEPENDENT det (up to (N/2)^2 on a
    maximally-skewed table), so int64 overflowed on strong effects
    at modest N (caught by the r13 full-registry sf1 sweep);
    decimal(38) holds the worst case to N ~ 2e7 and ANSI-loud-fails
    beyond — pre-scale the table (divide all cells by a common
    factor) for larger pools, where the test is saturated anyway.
    The SQL oracle runs identical algebra in HUGEINT (int128).
    """
    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(flag_col).cast("long")).cast("long").alias("k"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum("k").cast("long").alias("k_total"),
    )
    j = g.crossJoin(F.broadcast(tot))
    # DECIMAL(38,0) arithmetic: num = N*det^2 is O(N * det^2) with a
    # DATA-DEPENDENT det (up to (N/2)^2 for a maximally-skewed 2x2
    # table), so int64 overflows as early as N ~ thousands on strong
    # effects — caught live by the round-13 full-registry sf1 sweep.
    # Decimal(38) holds the worst case to N ~ 2e7 and ANSI-loud-fails
    # beyond (pre-scale the table above that); the SQL oracle runs
    # the same algebra in HUGEINT (int128) — representations differ,
    # both are exact, so results are identical.
    dec = "decimal(38,0)"
    a = F.col("k").cast(dec)
    b = (F.col("n") - F.col("k")).cast(dec)
    c = (F.col("k_total") - F.col("k")).cast(dec)
    d = ((F.col("n_total") - F.col("n")).cast(dec)) - c
    det = a * d - b * c
    num = F.col("n_total").cast(dec) * det * det
    den = (a + b) * (c + d) * (a + c) * (b + d)
    sig = F.when(
        den > 0,
        (
            num * F.lit(z_den * z_den).cast(dec)
            > den * F.lit(z_num * z_num).cast(dec)
        ).cast("long"),
    ).otherwise(F.lit(0))
    return j.select(
        group_col,
        "n",
        "k",
        "n_total",
        "k_total",
        F.when(den > 0, num.cast("double") / den.cast("double")).alias(
            "chi2"
        ),
        sig.alias("significant"),
    )
