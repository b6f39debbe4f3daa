"""Event-sequence analytics over keyed event streams.

The reference's event model is a per-key ordered stream
(include/kspp/kspp.h:335-392 — partition_source delivers events in
offset order per key); sequence analytics like "what follows what"
are written there as stateful C++ processors. Here the same semantics
are one lag window + one aggregation — Catalyst shuffles once on the
user key and the transition matrix is |event types|² rows regardless
of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences (the clickstream bigram model): order each user's
    events by (ts, tiebreak), pair each event with its predecessor
    via lag, then count transitions and distinct users per
    (prev_type, next_type), plus the row-conditional probability
    prob = n / sum(n over prev_type) as ONE exact double division.

    Pass `tiebreak` (e.g. the event id) whenever timestamps can tie —
    without a total order the lag pairing is nondeterministic.

    Scale shape: ONE shuffle on user_col for the lag window (per-user
    partitions are session-sized, never corpus-sized), one hash
    aggregation on the (prev, next) pair — partial aggregation makes
    the shuffle carry at most |types|² rows per mapper — and the
    conditional-probability window runs on the |types|²-row result.
    count_distinct(user) is the only wide column; at extreme
    cardinality swap it for approx_count_distinct.
    """
    order = [F.col(ts_col)]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = W.partitionBy(user_col).orderBy(*order)
    paired = (
        df.withColumn("_prev", F.lag(F.col(type_col)).over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            F.col("_prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
            F.col(user_col).alias("_u"),
        )
    )
    counts = paired.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct("_u").alias("n_users"),
    )
    wt = W.partitionBy("prev_type")
    prob = F.col("n_transitions").cast("double") / F.sum(
        "n_transitions"
    ).over(wt).cast("double")
    return counts.withColumn("prob", prob)
