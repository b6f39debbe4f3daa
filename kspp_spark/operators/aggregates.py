"""Keyed aggregations — the reference's materialized state stores.

Parity targets (SURVEY.md §2.4):
  count_by_key    include/kspp/processors/count.h:9-123
  count_by_value  include/kspp/processors/count_by_value.h:10-126
                  (despite its name: per-key SUM — state_stores/mem_counter_store.h:76-81)
  ktable          include/kspp/processors/ktable.h:8-116
                  (latest-per-key, LWW by event_time; state_stores/mem_store.h:64-83)
  windowed store  state_stores/mem_windowed_store.h:8-285

All of these are single-shuffle hash aggregations with map-side partial
aggregation (Spark's partial+final agg replaces the reference's
incremental counter-store merges). At 100 TB the shuffle is on the
grouping key only, carrying pre-aggregated partials — the cheapest
possible plan for these semantics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def count_by_key(df: DataFrame, key: str | list[str], out: str = "cnt") -> DataFrame:
    """Per-key event count (count.h:92-101). The reference's periodic
    punctuate snapshot == the full batch result; in streaming this runs
    in update mode with a processing-time trigger (see streaming/)."""
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def count_by_value(
    df: DataFrame, key: str | list[str], value: Column | str, out: str = "total"
) -> DataFrame:
    """Per-key additive sum (count_by_value.h + mem_counter_store.h:76-81).
    Out-of-order additions are accepted regardless of timestamp, which
    matches sum's order-insensitivity exactly."""
    keys = [key] if isinstance(key, str) else list(key)
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys).agg(F.sum(v).alias(out))


def ktable(
    df: DataFrame,
    key: str | list[str],
    value_cols: list[str],
    event_time: str = "event_time",
    seq: str | None = None,
    drop_tombstones: bool = True,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Materialize a changelog into latest-value-per-key (ktable.h:8-116).

    LWW semantics per mem_store.h:64-83: a record (update OR delete)
    with an event_time older than the stored one is ignored; equal
    event_time -> later arrival wins (tiebreak on `seq`).

    Implemented as one hash aggregation: max over a struct ordered by
    (event_time[, seq]) carries the winning row's values out — a
    partial-aggregable plan (no window sort, no second shuffle).

    tombstone_col: column whose NULL marks a delete (defaults to the
    first value col). With drop_tombstones, keys whose latest record is
    a delete vanish from the table.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [event_time] + ([seq] if seq else [])
    payload = F.struct(*[F.col(c) for c in order], *[F.col(c) for c in value_cols])
    agg = df.groupBy(*keys).agg(F.max(payload).alias("_w"))
    out = agg.select(
        *keys,
        *[F.col(f"_w.{c}").alias(c) for c in value_cols],
        F.col(f"_w.{event_time}").alias(event_time),
    )
    if drop_tombstones:
        tcol = tombstone_col or value_cols[0]
        out = out.filter(F.col(tcol).isNotNull())
    return out


def windowed_count(
    df: DataFrame,
    event_time: str,
    slot_width: str,
    key: str | list[str] | None = None,
    out: str = "cnt",
) -> DataFrame:
    """Tumbling-window count (mem_windowed_store slot bucketing:
    timestamp / slot_width at mem_windowed_store.h:260-262).
    slot_width e.g. '1 hour'. Returns window_start/window_end columns."""
    keys = [] if key is None else ([key] if isinstance(key, str) else list(key))
    w = F.window(F.col(event_time), slot_width)
    return (
        df.groupBy(w.alias("_w"), *keys)
        .agg(F.count(F.lit(1)).alias(out))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *keys,
            out,
        )
    )


def hopping_count(
    df: DataFrame,
    event_time: str,
    width: str,
    hop: str,
    key: str | list[str] | None = None,
    out: str = "cnt",
) -> DataFrame:
    """Hopping (sliding) window count: windows of `width` starting
    every `hop` — each event lands in width/hop overlapping windows
    (F.window's slideDuration). A tumbling window is the hop == width
    special case. Same code runs under Structured Streaming with a
    watermark for state eviction."""
    keys = [] if key is None else ([key] if isinstance(key, str) else list(key))
    w = F.window(F.col(event_time), width, hop)
    return (
        df.groupBy(w.alias("_w"), *keys)
        .agg(F.count(F.lit(1)).alias(out))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *keys,
            out,
        )
    )


def session_window_count(
    df: DataFrame,
    event_time: str,
    gap: str,
    key: str | list[str],
    out: str = "cnt",
) -> DataFrame:
    """Session windows (gap-based): consecutive events per key merge
    while the gap between them stays under `gap`. Not in the reference
    (only fixed slots exist — mem_windowed_store); added as the
    standard sessionization primitive. Uses Spark's native
    session_window (merging-session state in streaming, one
    aggregation in batch). Returns session_start/session_end =
    [min ts, max ts + gap)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = F.session_window(F.col(event_time), gap)
    return (
        df.groupBy(w.alias("_w"), *keys)
        .agg(F.count(F.lit(1)).alias(out))
        .select(
            *keys,
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            out,
        )
    )


def windowed_sum(
    df: DataFrame,
    event_time: str,
    slot_width: str,
    value: Column | str,
    key: str | list[str] | None = None,
    out: str = "total",
) -> DataFrame:
    """Tumbling-window per-key sum (windowed counter store)."""
    keys = [] if key is None else ([key] if isinstance(key, str) else list(key))
    v = F.col(value) if isinstance(value, str) else value
    w = F.window(F.col(event_time), slot_width)
    return (
        df.groupBy(w.alias("_w"), *keys)
        .agg(F.sum(v).alias(out))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *keys,
            out,
        )
    )


def rollup_agg_exprs(
    measures: dict[str, tuple[str, str]],
) -> tuple[list[Column], list[Column]]:
    """(first_aggs, re_aggs) for a decomposable-measure dict — the
    shared algebra of cascade_rollup (batch) and the streaming
    continuous rollup (streaming/rollup.py): first_aggs aggregate base
    rows; re_aggs merge partials of the SAME measures (count re-sums,
    sum re-sums, min/max re-extremize) and are therefore valid both
    for coarser grains and for merging partials of the same window
    across micro-batches."""
    first_aggs, re_aggs = [], []
    for name, (src, kind) in measures.items():
        if kind == "count":
            first_aggs.append(F.count(F.lit(1)).alias(name))
            re_aggs.append(F.sum(name).alias(name))
        elif kind == "sum":
            first_aggs.append(F.sum(src).alias(name))
            re_aggs.append(F.sum(name).alias(name))
        elif kind == "min":
            first_aggs.append(F.min(src).alias(name))
            re_aggs.append(F.min(name).alias(name))
        elif kind == "max":
            first_aggs.append(F.max(src).alias(name))
            re_aggs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate kind: {kind}")
    return first_aggs, re_aggs


def cascade_rollup(
    df: DataFrame,
    event_time: str,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    grains: tuple[str, ...] = ("hour", "day"),
    persist: bool = False,
    unpersist_after: bool = False,
) -> DataFrame:
    """Multi-grain time rollup computed as a CASCADE (the continuous-
    aggregate / materialized-rollup pattern): the finest grain
    aggregates the base table ONCE; every coarser grain re-aggregates
    the previous grain's partials instead of rescanning. Only
    decomposable aggregates are allowed (count/sum/min/max — count
    re-aggregates as sum), which is exactly what makes the cascade
    algebraically identical to aggregating the base table at each
    grain.

    At 100 TB this is the difference between one fact scan and
    len(grains) fact scans; the coarser aggregations run over rows
    already reduced by the finest grain (orders of magnitude smaller).
    In the physical plan, the finest grain's shuffle is shared across
    the union branches via Spark's exchange reuse — pinned by
    tests/test_plans.py::test_rollup_cascade_scans_base_once.

    measures: {out_name: (source_col, kind)} with kind in
    count|sum|min|max (source_col ignored for count). grains must be
    date_trunc levels ordered finest -> coarsest (e.g. hour, day).
    Output: (grain, window_start, *keys, *measures) unioned over
    grains.

    persist=True caches the finest grain so the base table is scanned
    exactly once even when the optimizer keeps the union branches
    separate (plan-pinned); without it the branches share the
    identical finest-grain exchange only when Spark's runtime exchange
    reuse fires. By default the cache is NOT auto-released (the union
    reads it lazily) — the caller owns it. unpersist_after=True is the
    materialize-and-release form for long-running jobs looping over
    many tables: the full cascade is evaluated eagerly (localCheckpoint)
    while the finest grain is cached, then the cache is dropped before
    returning — no cached partials accumulate, and the returned frame
    is already materialized (its blocks go with it when it is GC'd).
    In a production continuous-aggregate setup the finest grain is
    materialized to storage instead, and coarser grains read it back —
    same algebra, durable partials (streaming/rollup.py).
    """
    if unpersist_after and not persist:
        raise ValueError("unpersist_after requires persist=True")
    first_aggs, re_aggs = rollup_agg_exprs(measures)

    cur = df.groupBy(
        F.date_trunc(grains[0], F.col(event_time)).alias("window_start"), *keys
    ).agg(*first_aggs)
    if persist:
        cur = cur.persist()
    finest = cur  # the persisted handle (cur is reassigned per grain)
    out_cols = ["window_start", *keys, *measures]
    frames = [cur.select(F.lit(grains[0]).alias("grain"), *out_cols)]
    for g in grains[1:]:
        cur = cur.groupBy(
            F.date_trunc(g, F.col("window_start")).alias("window_start"), *keys
        ).agg(*re_aggs)
        frames.append(cur.select(F.lit(g).alias("grain"), *out_cols))
    result = frames[0]
    for f in frames[1:]:
        result = result.unionByName(f)
    if unpersist_after:
        # materialize the whole cascade while the finest grain is
        # cached, then release the cache — the caller gets an
        # already-evaluated frame and owns no cache lifecycle
        result = result.localCheckpoint(eager=True)
        finest.unpersist()
    return result


def scd2_history(
    df: DataFrame,
    key: str | list[str],
    value_cols: list[str],
    event_time: str = "event_time",
    seq: str | None = None,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 view of a changelog: where
    ktable() keeps only the LATEST value per key, this keeps EVERY
    version with its validity interval — the standard warehouse answer
    to "what did this key look like at time T?".

    Input is the same (key, values, event_time) changelog the ktable
    operators consume (tombstone = NULL value marks a delete, closing
    the current version without opening a new one). Output: one row
    per non-delete version with valid_from (its event_time), valid_to
    (the NEXT change's event_time for that key — including a delete —
    or NULL while current), and is_current.

    `seq` tiebreaks equal event_times (same contract as ktable's seq)
    so version order — and therefore every interval — is
    deterministic.

    One shuffle on the key; the interval assignment is a single
    per-key window pass (lead), no self-join. Point-in-time lookup is
    then a plain range predicate:
    valid_from <= T AND (valid_to IS NULL OR T < valid_to) — pushdown-
    friendly, and at 100 TB the history table partitions/z-orders on
    valid_from like any fact.
    """
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)
    tcol = tombstone_col or value_cols[0]
    order = [F.col(event_time)] + ([F.col(seq)] if seq else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    versioned = df.select(
        *keys,
        *value_cols,
        F.col(event_time).alias("valid_from"),
        F.lead(F.col(event_time)).over(w).alias("valid_to"),
    )
    live = versioned.filter(F.col(tcol).isNotNull())
    return live.select(
        *keys,
        *value_cols,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def scd2_lookup_join(
    facts: DataFrame,
    history: DataFrame,
    key: str | list[str],
    fact_time: str = "event_time",
    value_cols: list[str] | None = None,
    how: str = "inner",
    broadcast_history: bool = False,
) -> DataFrame:
    """Point-in-time (as-of) join of a fact stream against an SCD2
    history table (scd2_history / scd2_snapshot output): each fact row
    picks up the dimension version that was valid AT ITS OWN event
    time — valid_from <= t AND (valid_to IS NULL OR t < valid_to).
    The dimensional-join face of the as-of family: asof_join matches
    against raw change events; this matches against the closed
    intervals a warehouse actually stores.

    Because a key's intervals partition time (scd2_history closes each
    version at exactly the next version's valid_from), every fact
    matches AT MOST one version — the join never fans out. Facts
    before the key's first version (or inside a tombstone gap) match
    nothing: dropped under how='inner', kept with NULL dimension
    columns under how='left'.

    Scale shape: the key equality is an equi hash/sort-merge join
    (Catalyst extracts it; the interval predicate applies as a
    post-join filter on the matched key's few versions — never a cross
    product). Dimension histories are usually tiny next to facts:
    broadcast_history=True pins a broadcast hash join, making the
    lookup shuffle-free for the fact side — at 100 TB that is the
    difference between shuffling the fact table and not.

    value_cols selects which history columns ride along (default: all
    except the keys and interval bookkeeping). Output: facts.* +
    value_cols + valid_from (the matched version's start — drop it if
    unwanted).

    Reference: no kspp equivalent (ktable joins see only the LATEST
    value, join.h:212-311) — beyond-reference warehouse operator.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if how not in ("inner", "left"):
        raise ValueError("scd2_lookup_join: how must be 'inner' or 'left'")
    if value_cols is None:
        value_cols = [
            c
            for c in history.columns
            if c not in keys and c not in ("valid_from", "valid_to", "is_current")
        ]
    # a fact column sharing a name with a carried history column (or
    # with the interval bookkeeping) would make the post-join select
    # ambiguous — fail with the fix instead of an AMBIGUOUS_REFERENCE
    clashes = set(facts.columns) & ({*value_cols, "valid_from", "valid_to"})
    if clashes:
        raise ValueError(
            "scd2_lookup_join: fact column(s) "
            f"{sorted(clashes)} collide with history output columns — "
            "rename them on one side or narrow value_cols"
        )
    h = history.select(
        *[F.col(k).alias(f"_h_{k}") for k in keys],
        *value_cols,
        "valid_from",
        "valid_to",
    )
    if broadcast_history:
        h = F.broadcast(h)
    t = facts[fact_time]  # facts-side reference: unambiguous even if a
    # history value column shares the fact_time name
    cond = [facts[k] == F.col(f"_h_{k}") for k in keys] + [
        F.col("valid_from") <= t,
        F.col("valid_to").isNull() | (t < F.col("valid_to")),
    ]
    joined = facts.join(h, reduce(lambda a, b: a & b, cond), how)
    return joined.select(*facts.columns, *value_cols, "valid_from")
