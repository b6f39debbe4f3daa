"""functions/evaluation.py — distributed classifier-evaluation
metrics. The load-bearing claims: roc_auc's histogram/window
formulation equals the O(P*N) pairwise Mann-Whitney definition
(including tie credit), degenerate groups yield NULL (not 0.5), and
the bin/threshold counters are exact."""

import random

from kspp_spark.functions.evaluation import (
    calibration_bins,
    confusion_at,
    roc_auc,
)


def _brute_auc(pairs):
    """O(P*N) Mann-Whitney: 2U = #(pos>neg)*2 + #(pos==neg)."""
    pos = [s for s, lab in pairs if lab]
    neg = [s for s, lab in pairs if not lab]
    num = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    return num, 2 * len(pos) * len(neg)


def test_roc_auc_matches_pairwise_definition(spark):
    rng = random.Random(7)
    rows = [
        (
            f"g{i % 3}",
            # positives shifted up but overlapping, with heavy ties
            rng.randint(0, 12) + (3 if rng.random() < 0.4 else 0),
            1 if rng.random() < 0.45 else 0,
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "grp string, score long, label int")
    out = {
        r["grp"]: r
        for r in roc_auc(df, "score", "label", ("grp",)).collect()
    }
    assert set(out) == {"g0", "g1", "g2"}
    for g in out:
        pairs = [(s, lab) for gg, s, lab in rows if gg == g]
        num, den = _brute_auc(pairs)
        r = out[g]
        assert (r["auc_num"], r["auc_den"]) == (num, den)
        assert r["n_pos"] == sum(lab for _, lab in pairs)
        assert r["n_neg"] == len(pairs) - r["n_pos"]
        assert abs(r["auc"] - num / den) < 1e-15


def test_roc_auc_perfect_and_inverted(spark):
    rows = [(i, 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "score long, label int")
    assert roc_auc(df, "score", "label").collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        [(s, 1 - lab) for s, lab in rows], "score long, label int"
    )
    assert roc_auc(inv, "score", "label").collect()[0]["auc"] == 0.0


def test_roc_auc_degenerate_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("b", 2, 1), ("b", 1, 0)],
        "grp string, score long, label int",
    )
    out = {r["grp"]: r for r in roc_auc(df, "score", "label", ("grp",)).collect()}
    assert out["a"]["auc"] is None and out["a"]["auc_den"] == 0
    assert out["b"]["auc"] == 1.0


def test_calibration_bins_totals_and_clamp(spark):
    rows = [(i * 100, i % 2) for i in range(100)] + [(10**6, 1)]
    df = spark.createDataFrame(rows, "score long, label int")
    out = calibration_bins(df, "score", "label", n_bins=10, score_max=10_000)
    got = {r["bin"]: (r["n"], r["n_pos"], r["score_sum"]) for r in out.collect()}
    # rows 0..99 spread evenly over bins 0..9; the 10^6 outlier clamps to 9
    assert sum(n for n, _, _ in got.values()) == 101
    assert got[0] == (10, 5, sum(i * 100 for i in range(10)))
    assert got[9][0] == 11 and got[9][2] == sum(
        i * 100 for i in range(90, 100)
    ) + 10**6


def test_confusion_at_counts(spark):
    df = spark.createDataFrame(
        [(10, 1), (10, 0), (3, 1), (3, 0), (7, 0)],
        "score long, label int",
    )
    r = confusion_at(df, "score", "label", threshold=7).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 2, 1, 1)


def test_two_proportion_ztest_hand_computed(spark):
    """2x2 chi-square against hand-computed cells: group A converts
    30/100 vs the complement's 10/100 — chi2 = 200*(30*90-70*10)^2 /
    (100*100*40*160) = 12.5, significant at z=1.96 (chi2 > 3.8416);
    a tiny difference is not; a degenerate all-success pool yields
    NULL chi2 and significant 0."""
    from kspp_spark.functions.evaluation import two_proportion_ztest

    rows = [("A", 1)] * 30 + [("A", 0)] * 70 + [("B", 1)] * 10 + [("B", 0)] * 90
    df = spark.createDataFrame(rows, "g string, f int")
    got = {r["g"]: r for r in two_proportion_ztest(df, "g", "f").collect()}
    a = got["A"]
    assert (a["n"], a["k"], a["n_total"], a["k_total"]) == (100, 30, 200, 40)
    # chi2 = num/den with num = 200*(30*90-70*10)^2, den = 100*100*40*160
    assert abs(a["chi2"] - 12.5) < 1e-12
    assert a["significant"] == 1
    # symmetric: B's test against its complement is the same table
    assert got["B"]["chi2"] == a["chi2"] and got["B"]["significant"] == 1

    close = spark.createDataFrame(
        [("A", 1)] * 50 + [("A", 0)] * 50 + [("B", 1)] * 52 + [("B", 0)] * 48,
        "g string, f int",
    )
    assert all(
        r["significant"] == 0
        for r in two_proportion_ztest(close, "g", "f").collect()
    )

    degen = spark.createDataFrame(
        [("A", 1)] * 5 + [("B", 1)] * 5, "g string, f int"
    )
    for r in two_proportion_ztest(degen, "g", "f").collect():
        assert r["chi2"] is None and r["significant"] == 0


def test_two_proportion_ztest_big_n_strong_effect_no_overflow(spark):
    """r13 sf1-sweep regression: num = N*det^2 has a DATA-DEPENDENT
    det, so the old int64 algebra ANSI-overflowed on strong effects
    at modest N (2M rows, 80%-vs-10% split -> det ~ 7e11, num ~
    1e30). The DECIMAL(38,0) form must return the obvious verdict
    instead of throwing."""
    from pyspark.sql import functions as F
    from kspp_spark.functions.evaluation import two_proportion_ztest

    df = spark.range(2_000_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.when(
            (F.col("id") % 2 == 0) & (F.col("id") % 10 < 8), 1
        ).when(
            (F.col("id") % 2 == 1) & (F.col("id") % 10 == 1), 1
        ).otherwise(0).alias("f"),
    )
    got = {r["g"]: r for r in two_proportion_ztest(df, "g", "f").collect()}
    assert got["0"]["significant"] == 1 and got["1"]["significant"] == 1
    assert got["0"]["chi2"] > 1000
