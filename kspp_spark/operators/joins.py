"""Joins — kspp's five key-equi-join flavors (SURVEY.md §2.5).

Parity targets: include/kspp/processors/join.h
  kstream_left_join   join.h:28-118   stream event -> lookup in table
  kstream_inner_join  join.h:120-209
  ktable_left_join    join.h:212-311  change on either side -> re-emit
  ktable_inner_join   join.h:314-406
  ktable_outer_join   join.h:408-508

Two surfaces:

1. Relational form (``kstream_*_join`` / ``ktable_*_join``): join of a
   stream/table DataFrame against a materialized table — a plain Spark
   join. Catalyst picks broadcast-hash for small dims (the common kspp
   deployment: dimension table in a mem/RocksDB store) or sort-merge
   for large-large; at 100 TB co-partitioned bucketing removes the
   shuffle entirely.

2. Changelog-replay form (``changelog_*``): reproduces the reference's
   *emitted output sequence* — one output row per input change,
   including tombstones on miss (join.h:290-294) — verified against the
   golden vectors in tests/test8_join.cpp:133-354. Implemented as a
   single window aggregation per key (no per-row Python, no driver
   loop): per-side running state = max(struct(event_time, seq, value))
   over an event-ordered window, which is exactly the LWW store replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

# ---------------------------------------------------------------- relational


def kstream_left_join(
    stream: DataFrame, table: DataFrame, on: str | list[str], broadcast: bool = True
) -> DataFrame:
    """Stream-table lookup join (join.h:28-118): every stream row out,
    table columns null on miss."""
    t = F.broadcast(table) if broadcast else table
    return stream.join(t, on=on, how="left")


def kstream_inner_join(
    stream: DataFrame, table: DataFrame, on: str | list[str], broadcast: bool = True
) -> DataFrame:
    """Stream-table lookup join, misses dropped (join.h:181-189)."""
    t = F.broadcast(table) if broadcast else table
    return stream.join(t, on=on, how="inner")


def ktable_left_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    return left.join(right, on=on, how="left")


def ktable_inner_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    return left.join(right, on=on, how="inner")


def ktable_outer_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    return left.join(right, on=on, how="full_outer")


# ------------------------------------------------------------- as-of join


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    ts: str,
    seq: str,
    right_payload: list[str],
    prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: pair each left row with the LATEST right row at
    (ts, seq) strictly before it (per key) — `direction="backward"`,
    the default. `"forward"` pairs with the EARLIEST right row strictly
    after; `"nearest"` takes whichever of the two is closer in event
    time (ties prefer backward). Not in the reference (SURVEY §2.5 —
    kspp has only key-equi joins); added because event-time attribution
    is a standard stream-analytics need.

    Spark-first implementation: ONE union + ONE window aggregation —
    no range-join explosion, no per-row lookup. The right payload rides
    in a struct; max-over-growing-window replays the right side's state
    at every left row (identical machinery to the changelog joins, so
    it scales the same way: shuffle on key, local sort, no quadratic
    blow-up even with many right rows per key).
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = F.struct(F.col(ts).alias("_ts"), F.col(seq).alias("_seq"),
                       *[F.col(c) for c in right_payload])
    lt = left.withColumn("_side", F.lit(1)).withColumn(
        "_rp", F.lit(None).cast(right.select(payload).schema[0].dataType)
    )
    rt = right.select(
        *keys, F.col(ts), F.col(seq), F.lit(0).alias("_side"), payload.alias("_rp")
    )
    lcols = [c for c in left.columns]
    union = lt.select(*lcols, "_side", "_rp").unionByName(
        rt.select(
            *keys,
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in lcols if c not in keys + [ts, seq]],
            ts,
            seq,
            "_side",
            "_rp",
        )
    )
    # strictly-before: right rows sort ahead of a left row with equal
    # (ts, seq) via _side, and the window EXCLUDES the current row's
    # own side-switch by ranging to the previous row for left rows?
    # Simpler: order by (ts, seq, _side); right state at a left row =
    # max over rows up to current (right rows with (ts,seq) < left's,
    # plus right rows at identical (ts,seq) — impossible since seq is
    # unique across the union's source events).
    order = W.partitionBy(*keys).orderBy(ts, seq, "_side")
    wb = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = order.rowsBetween(W.currentRow, W.unboundedFollowing)
    # max/min over the payload struct order by (_ts, _seq, …): max of
    # the preceding frame = latest-before; min of the following frame =
    # earliest-after. The left row's own NULL payload is skipped by
    # both. One WindowExec computes every frame (same partition/order).
    back_state = F.max(F.col("_rp")).over(wb)
    fwd_state = F.min(F.col("_rp")).over(wf)
    if direction == "backward":
        state = back_state
    elif direction == "forward":
        state = fwd_state
    elif direction == "nearest":
        lt_us = F.unix_micros(F.col(ts))
        b_us = F.unix_micros(back_state["_ts"])
        f_us = F.unix_micros(fwd_state["_ts"])
        state = (
            F.when(back_state.isNull(), fwd_state)
            .when(fwd_state.isNull(), back_state)
            .when(lt_us - b_us <= f_us - lt_us, back_state)
            .otherwise(fwd_state)
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")
    out = union.withColumn("_rstate", state).filter(F.col("_side") == 1)
    return out.select(
        *lcols,
        *[
            F.col(f"_rstate.{c}").alias(f"{prefix}{c}")
            for c in ["_ts", "_seq"] + right_payload
        ],
    ).withColumnsRenamed({f"{prefix}_ts": f"{prefix}ts", f"{prefix}_seq": f"{prefix}seq"})


# ---------------------------------------------------------- changelog replay
#
# Input changelogs: columns (key, value, event_time) + optional seq.
# Output: (key, event_time, left, right, tombstone) — one row per
# emitted record; tombstone=true rows model kspp's null-pair deletes.


def _tagged_union(left: DataFrame, right: DataFrame, table_first: bool) -> DataFrame:
    """Union the two changelogs with a side tag and a deterministic
    within-timestamp order. table_first puts side R (the table) ahead of
    side L at equal event_time — the reference processes + commits the
    table before the stream each tick (join.h:75-79)."""
    l_pri = F.lit(1 if table_first else 0)
    r_pri = F.lit(0 if table_first else 1)
    lt = left.select(
        "key",
        F.col("value").alias("_lv"),
        F.lit(None).cast(right.schema["value"].dataType).alias("_rv"),
        "event_time",
        l_pri.alias("_pri"),
        (F.col("seq") if "seq" in left.columns else F.lit(0)).alias("seq"),
        F.lit("L").alias("_side"),
    )
    rt = right.select(
        "key",
        F.lit(None).cast(left.schema["value"].dataType).alias("_lv"),
        F.col("value").alias("_rv"),
        "event_time",
        r_pri.alias("_pri"),
        (F.col("seq") if "seq" in right.columns else F.lit(0)).alias("seq"),
        F.lit("R").alias("_side"),
    )
    return lt.unionByName(rt)


def _with_states(events: DataFrame) -> DataFrame:
    """Running LWW state of each side at every event.

    max(struct(event_time, _pri, seq, value)) over an event-ordered
    growing window == the value a mem_store would hold after applying
    every event up to and including this row (mem_store.h:64-83).
    Null-value events still produce a struct (tombstone applied) —
    only rows of the *other* side are excluded (their struct is null,
    which max() skips).
    """
    w = (
        W.partitionBy("key")
        .orderBy("event_time", "_pri", "seq")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    l_upd = F.when(
        F.col("_side") == "L", F.struct("event_time", "_pri", "seq", F.col("_lv").alias("v"))
    )
    r_upd = F.when(
        F.col("_side") == "R", F.struct("event_time", "_pri", "seq", F.col("_rv").alias("v"))
    )
    return events.withColumn("_lstate", F.max(l_upd).over(w)["v"]).withColumn(
        "_rstate", F.max(r_upd).over(w)["v"]
    )


def changelog_stream_table_join(
    stream: DataFrame, table: DataFrame, how: str = "left"
) -> DataFrame:
    """kstream-ktable join replay (join.h:28-209).

    Emits one row per non-tombstone stream event, paired with the
    table's LWW state as of that event (table changes at the same
    event_time are applied first). how='left' keeps misses with null
    right (test8_join.cpp:133-155); how='inner' drops them (:171-190).
    """
    ev = _with_states(_tagged_union(stream, table, table_first=True))
    out = ev.filter((F.col("_side") == "L") & F.col("_lv").isNotNull()).select(
        "key",
        "event_time",
        F.col("_lv").alias("left"),
        F.col("_rstate").alias("right"),
        F.lit(False).alias("tombstone"),
    )
    if how == "inner":
        out = out.filter(F.col("right").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported stream-table join flavor: {how}")
    return out


def changelog_table_table_join(
    left: DataFrame, right: DataFrame, how: str = "left"
) -> DataFrame:
    """ktable-ktable join replay (join.h:212-508, "old semantics").

    Any change on either side emits, per the golden vectors
    (test8_join.cpp:207-354):
      left:  L state null -> tombstone, else (L, R?)        (join.h:290-294)
      inner: either state null -> tombstone, else (L, R)    (join.h:385-389)
      outer: both states null -> tombstone, else (L?, R?)   (join.h:474-491)
    """
    ev = _with_states(_tagged_union(left, right, table_first=False))
    ls, rs = F.col("_lstate"), F.col("_rstate")
    if how == "left":
        tomb = ls.isNull()
    elif how == "inner":
        tomb = ls.isNull() | rs.isNull()
    elif how == "outer":
        tomb = ls.isNull() & rs.isNull()
    else:
        raise ValueError(f"unsupported table-table join flavor: {how}")
    return ev.select(
        "key",
        "event_time",
        F.when(~tomb, ls).alias("left"),
        F.when(~tomb, rs).alias("right"),
        tomb.alias("tombstone"),
    )


# ----------------------------------------------------------- cogroup


def cogroup_apply(left, right, key, fn, schema):
    """Per-key pairwise merge of two DataFrames with arbitrary Python
    logic — the general form of the reference's table-table join
    machinery, where both sides' per-key state is presented together
    (join.h:228-229 feeds both sides through one event queue per key).

    Runs as Arrow-batched cogrouped pandas (`fn(left_pdf, right_pdf) ->
    pdf`): one shuffle on the key for each side, then keys process in
    parallel across executors. Use ONLY when no relational join/agg
    expresses the merge — this leaves whole-stage codegen.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(fn, schema=schema)
    )


# ------------------------------------------------------ interval join


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    cell: float,
    max_cells: int = 4096,
) -> DataFrame:
    """Point-in-interval join by GRID BUCKETING — the Spark-first
    answer to `p BETWEEN lo AND hi` (inclusive both ends): Catalyst
    has no equi-key for a pure range predicate, so the naive spelling
    executes as BroadcastNestedLoopJoin — every point against every
    interval, O(|P|x|I|), the classic scale-killer the plan-contract
    suite bans everywhere else. Bucketing restores an equi-key:

      1. every interval explodes to the grid cells it overlaps
         (sequence(floor(lo/cell), floor(hi/cell)) — span/cell + 1
         rows per interval);
      2. every point maps to its ONE cell (floor(p/cell));
      3. equi-join on the cell id, exact BETWEEN re-check inside the
         join condition.

    Each qualifying (point, interval) pair meets in EXACTLY one cell
    (the point's), so no post-join distinct is needed — output
    multiplicity is exactly SQL's. floor(x/cell) is monotone in IEEE
    doubles, so lo <= p <= hi guarantees cell(lo) <= cell(p) <=
    cell(hi): bucketing can never MISS a pair, only admit false
    candidates that the exact re-check kills (identity to the naive
    join — the heavy_hitters certification pattern).

    `cell` tunes the trade: small cells = more explode rows per
    interval, fewer false candidates; large cells = the reverse.
    Pick ~ the median interval span. `max_cells` bounds the per-row
    explode (a mis-sized cell on a huge interval would otherwise
    fan out unboundedly); exceeding it raises at plan-build time via
    a runtime assert column.

    Not in the reference (kspp joins are key-equi only, join.h);
    added because range lookup (IP ranges, price bands, time
    windows, geo tiles) is a standard analytics need. Scale shape:
    one explode + one hash equi-join — shuffle keyed by cell id, AQE
    skew-join-eligible (a hot cell splits), no nested loop anywhere.
    """
    if cell <= 0:
        raise ValueError("interval_join: cell must be > 0")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"interval_join: column name collision {sorted(overlap)}; "
            "alias one side first"
        )
    for c in ("_cell", "_lo_c", "_hi_c"):
        if c in points.columns or c in intervals.columns:
            raise AssertionError(f"interval_join: reserved column {c!r}")
    lo_c = F.floor(F.col(lo_col).cast("double") / F.lit(float(cell))).cast("long")
    hi_c = F.floor(F.col(hi_col).cast("double") / F.lit(float(cell))).cast("long")
    # fail loudly on a fan-out above max_cells instead of silently
    # truncating coverage: raise_error is lazy per row, so the guard
    # costs nothing on conforming data
    span_ok = (hi_c - lo_c) < F.lit(max_cells)
    iv = intervals.where(F.col(lo_col) <= F.col(hi_col)).select(
        "*",
        F.explode(
            F.when(span_ok, F.sequence(lo_c, hi_c)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"interval_join: interval spans > {max_cells} "
                            "cells; raise `cell` or `max_cells`"
                        )
                    )
                ).cast("array<bigint>")
            )
        ).alias("_cell"),
    )
    pt = points.select(
        "*",
        F.floor(F.col(point_col).cast("double") / F.lit(float(cell)))
        .cast("long")
        .alias("_cell"),
    )
    joined = pt.join(
        iv,
        (pt["_cell"] == iv["_cell"])
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col)),
    )
    return joined.select(
        *[pt[c] for c in points.columns],
        *[iv[c] for c in intervals.columns],
    )


def radius_join(
    left: DataFrame,
    right: DataFrame | None,
    radius: int,
    x: str = "x",
    y: str = "y",
    id_col: str = "id",
    max_cells: int = 1 << 40,
    explode_side: str = "left",
) -> DataFrame:
    """Planar radius join (ST_DWithin on projected/integer
    coordinates): every pair of points within Euclidean distance
    `radius`, found from a grid-cell equi-join — the 2D
    generalization of the grid-bucketed range join, and the spatial
    primitive behind proximity dedup, store-catchment joins, and
    neighbor feature aggregation once coordinates are projected to
    integer units (micro-degrees on an equirectangular projection,
    meters on a national grid — the caller picks the projection;
    keeping trig OUT of the operator is what makes it exact and
    engine-portable, the PSI/log() lesson applied to geo).

    Correctness: cell side d = radius, cell = (x DIV d, y DIV d)
    with FLOOR division toward -infinity for negative coordinates.
    Any pair within distance r has |dx| <= r and |dy| <= r, so the
    right point's cell is one of the left point's 3x3 neighbor
    cells — exploding ONE side to its 9 neighbors and equi-joining
    on the home cell of the OTHER side is a provable candidate
    superset; the exact integer check dx^2 + dy^2 <= r^2 keeps true
    pairs only (candidates share neighbor cells so |dx|,|dy| < 2d
    and the int64 squares cannot overflow for radius < 2^30).
    Self-join form (right=None) emits each pair once as (a < b).

    Which side eats the 9x explode is the caller's size call:
    `explode_side="left"` (default) explodes `left`,
    `explode_side="right"` explodes `right` — pass the SMALLER
    input on the exploded side so the 9x row multiplication lands
    on the cheap relation (for the self-join there is only one
    side and the parameter is ignored). Coordinate domain: cell
    ids are coord DIV radius with floor semantics, exact for the
    whole int64 range, but the exploded side's cell id takes a ±1
    neighbor offset — callers must keep |coord| <= 2^62 (any real
    projection is orders of magnitude inside this) so the offset
    cannot overflow under ANSI.

    Scale shape: one 9x explode of the chosen (smaller) side + ONE
    hash equi-join on the cell id + a map-side exact check — never
    a cross product (plan-pinned); skew from dense cells is
    ordinary equi-join skew (AQE-splittable). `max_cells`
    loud-fails degenerate radii (a radius so small the grid id
    space overflows sanity) rather than silently exploding."""
    if radius < 1:
        raise ValueError("radius_join: radius must be >= 1")
    if radius >= (1 << 30):
        raise ValueError("radius_join: radius must be < 2^30")
    if explode_side not in ("left", "right"):
        raise ValueError(
            "radius_join: explode_side must be 'left' or 'right'"
        )
    d = radius
    selfjoin = right is None
    r = left if selfjoin else right

    def cell(col):
        # floor division toward -infinity (a point at x=-1 must not
        # share cell 0 with x=+1 yet still be its neighbor),
        # overflow-safe over the whole int64 domain: truncate-
        # toward-zero DIV, then subtract 1 for negative inexact
        # quotients. The previous -(((-x) + d - 1) DIV d) form
        # negated x and ANSI-overflowed at INT64_MIN; here DIV never
        # sees a -1 divisor, and the -1 adjustment only fires on an
        # inexact quotient, so d=1 (the only d whose quotient can
        # itself be INT64_MIN) never adjusts.
        return F.expr(
            f"({col} DIV {d}) - (CASE WHEN {col} < 0 "
            f"AND {col} % {d} != 0 THEN 1 ELSE 0 END)"
        )

    la = left.select(
        F.col(id_col).alias("_a"),
        F.col(x).alias("_ax"),
        F.col(y).alias("_ay"),
        cell(x).alias("_acx"),
        cell(y).alias("_acy"),
    )
    rb = r.select(
        F.col(id_col).alias("_b"),
        F.col(x).alias("_bx"),
        F.col(y).alias("_by"),
        cell(x).alias("_bcx"),
        cell(y).alias("_bcy"),
    )

    def explode9(side, cxn, cyn):
        # 3x3 neighborhood of the home cell
        s = side.select(
            "*",
            F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("_ox"),
        ).select(
            "*",
            F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("_oy"),
        )
        return s.select(
            *[c for c in side.columns if c not in (cxn, cyn)],
            (F.col(cxn) + F.col("_ox")).alias("_jx"),
            (F.col(cyn) + F.col("_oy")).alias("_jy"),
        )

    if selfjoin or explode_side == "left":
        la = explode9(la, "_acx", "_acy")
        rb = rb.withColumnsRenamed({"_bcx": "_jx", "_bcy": "_jy"})
    else:
        rb = explode9(rb, "_bcx", "_bcy")
        la = la.withColumnsRenamed({"_acx": "_jx", "_acy": "_jy"})
    j = la.join(rb, ["_jx", "_jy"])
    if selfjoin:
        j = j.where(F.col("_a") < F.col("_b"))
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    d2 = dx * dx + dy * dy
    # no distinct needed: the non-exploded side joins on its HOME
    # cell only, which appears exactly once among the exploded
    # point's 9 neighbor cells — every qualifying pair is emitted
    # exactly once
    # r^2 as a PYTHON long literal: F.lit(radius) * F.lit(radius)
    # is int32 * int32 and ANSI-overflows past radius ~46341
    return j.where(d2 <= F.lit(radius * radius).cast("long")).select(
        F.col("_a").alias("a"),
        F.col("_b").alias("b"),
        d2.cast("long").alias("dist2"),
    )


def knn_radius_join(
    left: DataFrame,
    right: DataFrame | None,
    k: int,
    radius: int,
    x: str = "x",
    y: str = "y",
    id_col: str = "id",
    explode_side: str = "left",
) -> DataFrame:
    """Radius-capped spatial kNN join: for every LEFT point, its k
    nearest RIGHT points among those within Euclidean distance
    `radius` (ST_DWithin + per-point top-k) — the "nearest k
    stores / sensors / neighbors" companion to radius_join's
    "everything within r", and the standard exact formulation when
    the application has a distance cap (geo matching almost always
    does: a nearest store 400 km away is not a match). Within the
    cap the result is EXACT — the 3x3 grid-cell candidate set is a
    provable superset of all pairs within r (radius_join's
    invariant), so the top-k over it is the true capped top-k;
    points with fewer than k in-radius neighbors return what
    exists. Uncapped global kNN would need data-dependent ring
    expansion (unbounded worst case); callers wanting it should
    raise the cap, which only widens the candidate band.

    Ranking is deterministic: ORDER BY (dist2, neighbor id) — ties
    at equal distance break toward the smaller id, so the result
    hash-replays in SQL. Self-form (right=None) ranks each point's
    neighbors EXCLUDING itself (a != b, both directions — unlike
    radius_join's once-per-pair a < b cut, every point gets its own
    neighbor list).

    Scale shape: the radius_join candidate plan (one 9x explode of
    the `explode_side` input + ONE hash equi-join on the cell id +
    map-side exact check — never a cross product) + one
    row_number window partitioned by the left id. The rank<=k
    filter compiles to Spark's WindowGroupLimit (Spark >= 3.5):
    each shuffle map task keeps only its local top-k per point
    before the exchange, so the window never materializes a dense
    cell's full candidate list on one reducer. Output: (a, b,
    dist2, rk), at most k rows per left point.

    Reference parity: kspp has no spatial operator family; this and
    radius_join cover the gap a geo-enabled deployment of the
    reference would fill with an external PostGIS hop
    (ST_DWithin/KNN `<->`), re-expressed as pure Spark relational
    algebra."""
    if k < 1:
        raise ValueError("knn_radius_join: k must be >= 1")
    cand = radius_join(
        left,
        right if right is not None else left.alias("_knn_rhs"),
        radius,
        x=x,
        y=y,
        id_col=id_col,
        explode_side=explode_side,
    )
    if right is None:
        cand = cand.where(F.col("a") != F.col("b"))
    w = W.partitionBy("a").orderBy(F.col("dist2").asc(), F.col("b").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("a", "b", "dist2", F.col("rk").cast("long").alias("rk"))
    )
