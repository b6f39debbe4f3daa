"""Custom stateful operators — the pieces Spark has no built-in for.

Parity targets (SURVEY.md §2.3, §4):
  rate_limiter  include/kspp/processors/rate_limiter.h:12-87
  token bucket  include/kspp/state_stores/mem_token_bucket_store.h:13-57
  delay         include/kspp/processors/delay.h:5-74
  windowed table w/ expiry tombstones
                include/kspp/state_stores/mem_windowed_store.h:89-135

Token-bucket semantics (mem_token_bucket_store.h):
  per-key bucket starts full (capacity C, fill time T ms =>
  fillrate C/T per ms). On an event at ts:
    delta = floor((ts - tstamp) * fillrate); if delta > 0:
      tstamp = ts; tokens = min(C, tokens + delta)
    accept iff tokens > 0, consuming one.
  Note tstamp only advances when at least one whole token accrued —
  fractional refill is never lost (reference behavior, kept exactly).

This is inherently sequential per key, so it runs as an Arrow-batched
grouped-pandas op: batch = applyInPandas (one pass per key, ordered by
event time), streaming = applyInPandasWithState (state carries
(tokens, tstamp) across micro-batches). Keys process in parallel
across executors; there is no global coordination — scales with key
cardinality, not data volume.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame


def _run_bucket(
    ts_ms: Iterable[int], capacity: int, fillrate_per_ms: float, tokens: float, tstamp: int
) -> tuple[list[bool], float, int]:
    """Replay the reference bucket over an event-time-sorted sequence.
    Returns (accept flags, final tokens, final tstamp)."""
    out = []
    for ts in ts_ms:
        delta = int((ts - tstamp) * fillrate_per_ms)
        if delta > 0:
            tstamp = ts
            # float() matters: min() may return the int capacity, and an
            # int written into the DOUBLE state column deserializes as
            # null after checkpoint recovery
            tokens = min(float(capacity), tokens + delta)
        if tokens > 0:
            tokens -= 1
            out.append(True)
        else:
            out.append(False)
    return out, tokens, tstamp


def rate_limit_batch(
    df: DataFrame,
    key: str,
    event_time: str,
    filltime_ms: int,
    capacity: int,
    seq: str | None = None,
) -> DataFrame:
    """Batch token-bucket rate limiter: keeps accepted rows only
    (rate_limiter.h:52-58 drops and counts rejects). Deterministic:
    events replay per key ordered by (event_time[, seq])."""
    fillrate = capacity / filltime_ms
    order = [event_time] + ([seq] if seq else [])
    out_schema = df.schema

    def limit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        ts = (pdf[event_time].astype("int64") // 1_000_000).tolist()  # ns -> ms
        flags, _, _ = _run_bucket(ts, capacity, fillrate, float(capacity), 0)
        return pdf[pd.Series(flags, index=pdf.index)]

    return df.groupBy(key).applyInPandas(limit, schema=out_schema)


def rate_limit_stream(
    df: DataFrame,
    key: str,
    event_time: str,
    filltime_ms: int,
    capacity: int,
    seq: str | None = None,
):
    """Streaming token-bucket rate limiter via applyInPandasWithState.
    State = (tokens, tstamp) per key, exactly the reference's bucket.
    `seq` breaks event-time ties deterministically, matching
    rate_limit_batch's replay order."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    fillrate = capacity / filltime_ms
    order = [event_time] + ([seq] if seq else [])
    out_schema = df.schema
    state_schema = "tokens double, tstamp long"

    def limit(key_, pdf_iter, state: GroupState):
        if state.exists:
            tokens, tstamp = state.get
        else:
            tokens, tstamp = float(capacity), 0
        # buffer the whole micro-batch for this key before sorting:
        # applyInPandasWithState splits a key's rows into multiple Arrow
        # chunks past arrow.maxRecordsPerBatch, and sorting each chunk
        # independently would replay events out of global order
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(order, kind="mergesort")
            ts = (pdf[event_time].astype("int64") // 1_000_000).tolist()
            flags, tokens, tstamp = _run_bucket(ts, capacity, fillrate, tokens, tstamp)
            yield pdf[pd.Series(flags, index=pdf.index)]
        state.update((float(tokens), int(tstamp)))

    return df.groupBy(key).applyInPandasWithState(
        limit,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def throughput_limit_batch(
    df: DataFrame,
    event_time: str,
    msgs_per_sec: float,
    partition_key: str | None = None,
    seq: str | None = None,
) -> DataFrame:
    """thoughput_limiter.h:12-85 parity: a token bucket of capacity 1
    refilling every 1000/msgs_per_sec ms — the reference constructs
    exactly mem_token_bucket_store(ms(1000/messages_per_sec), 1) keyed
    on the constant 0, i.e. ONE bucket per partition source. Here
    `partition_key=None` is the single-partition topology (one global
    bucket); pass a partition column to mirror the reference's
    per-partition processors.

    The reference limits in processing time (thoughput_limiter.h:9
    "right now this is processing time rate limiting"); the Spark form
    replays deterministically in event time — the admission sequence
    the reference produces when consuming at the events' own pace.
    For SOURCE-level admission on a streaming read, use
    `source_throughput_options` (maxOffsetsPerTrigger) instead — that
    is backpressure; this operator is the drop-excess form.
    """
    filltime_ms = max(1, int(round(1000.0 / msgs_per_sec)))
    if partition_key is None:
        from pyspark.sql import functions as F

        tagged = df.withColumn("_tl_key", F.lit(0))
        out = rate_limit_batch(tagged, "_tl_key", event_time, filltime_ms, 1, seq)
        return out.drop("_tl_key")
    return rate_limit_batch(df, partition_key, event_time, filltime_ms, 1, seq)


def throughput_limit_stream(
    df: DataFrame,
    event_time: str,
    msgs_per_sec: float,
    partition_key: str | None = None,
    seq: str | None = None,
):
    """Streaming form of throughput_limit_batch: the same capacity-1
    bucket carried across micro-batches via applyInPandasWithState."""
    filltime_ms = max(1, int(round(1000.0 / msgs_per_sec)))
    if partition_key is None:
        from pyspark.sql import functions as F

        tagged = df.withColumn("_tl_key", F.lit(0))
        out = rate_limit_stream(tagged, "_tl_key", event_time, filltime_ms, 1, seq)
        return out.drop("_tl_key")
    return rate_limit_stream(df, partition_key, event_time, filltime_ms, 1, seq)


def source_throughput_options(
    msgs_per_sec: float, trigger_sec: float = 1.0
) -> dict[str, str]:
    """The backpressure mapping of thoughput_limiter: cap records
    ADMITTED per micro-batch at the source instead of dropping in-plan.
    Apply to a Kafka readStream (`.options(**source_throughput_options
    (1000))`) together with a processingTime trigger of `trigger_sec`;
    file sources take the analogous maxFilesPerTrigger (per-file
    granularity). Spark then paces the scan itself — no operator state,
    no dropped records, which is what a 100 TB backfill actually wants.
    """
    return {"maxOffsetsPerTrigger": str(max(1, int(msgs_per_sec * trigger_sec)))}


def delay_stream(
    df: DataFrame,
    key: str,
    value: str,
    event_time: str,
    delay_ms: int,
    watermark_delay: str | None = None,
):
    """Streaming delay (delay.h:40-50): the reference releases a record
    once the topology tick passes event_time + delay. Spark mapping:
    the topology tick (topology.cpp process loop) is the stream's
    event-time WATERMARK — deterministic and replay-stable, unlike a
    wall clock: re-running the same data releases the same records in
    the same batches, and the operator terminates under availableNow
    (a ProcessingTimeTimeout design spins empty micro-batches forever
    because shouldRunAnotherBatch is unconditionally true for it).

    Operates on the canonical changelog shape (key, value: string,
    event_time) — like the reference, which delays opaque serded
    records; map a struct value through to_json first if needed.
    Records whose event_time + delay is <= the watermark flow through;
    younger records buffer in group state with an EventTimeTimeout at
    their maturity instant, so they release as soon as the watermark
    passes it even with no new input for their key. Released records
    carry the ORIGINAL event_time (the reference forwards the record
    untouched). Note the watermark is computed from the PREVIOUS
    batch's max event time, so release lags one micro-batch behind
    data arrival — the price of determinism. Batch-mode delay is an
    identity (every event_time <= the batch tick), matching topology
    flush.

    LATE-DATA CAVEAT: withWatermark makes Spark DROP input rows older
    than the watermark before they reach this operator, whereas the
    reference (delay.h) eventually forwards every record. A record
    arriving out-of-order across micro-batches by more than
    `watermark_delay` is silently discarded, not delayed-and-released.
    The default therefore sizes the watermark to the DELAY DURATION
    (disorder up to delay_ms survives — usually ample, since a stream
    needing a delay operator tolerates at least that much lateness);
    pass an explicit `watermark_delay` sized to your stream's real
    disorder bound if it exceeds the delay.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if watermark_delay is None:
        watermark_delay = f"{delay_ms} milliseconds"

    out_schema = (
        f"{key} string, {value} string, {event_time} timestamp"
    )

    def hold(key_, pdf_iter, state: GroupState):
        vals: list = []
        times: list = []
        if state.exists:
            (vals, times) = state.get
            vals, times = list(vals), list(times)
        for pdf in pdf_iter:
            vals.extend(pdf[value].tolist())
            times.extend((pdf[event_time].astype("int64") // 1_000_000).tolist())
        wm = state.getCurrentWatermarkMs()
        ready_idx = [i for i, t in enumerate(times) if t + delay_ms <= wm]
        pend_idx = [i for i, t in enumerate(times) if t + delay_ms > wm]
        if pend_idx:
            state.update(([vals[i] for i in pend_idx], [times[i] for i in pend_idx]))
            # fire when the watermark reaches the earliest maturity.
            # Spark fires EventTimeTimeout only when the watermark
            # STRICTLY exceeds the armed timestamp, while the release
            # predicate above is inclusive (t + delay <= wm) — arm at
            # maturity-1 so the two agree when the watermark lands
            # exactly on the maturity instant. Must stay strictly
            # ahead of the current watermark, hence the wm+1 floor.
            next_fire = min(times[i] + delay_ms for i in pend_idx)
            state.setTimeoutTimestamp(max(next_fire - 1, wm + 1))
        elif state.exists:
            state.remove()
        if ready_idx:
            yield pd.DataFrame(
                {
                    key: [key_[0]] * len(ready_idx),
                    value: [vals[i] for i in ready_idx],
                    event_time: pd.to_datetime(
                        [times[i] for i in ready_idx], unit="ms"
                    ),
                }
            )

    return (
        df.withWatermark(event_time, watermark_delay)
        .groupBy(key)
        .applyInPandasWithState(
            hold,
            outputStructType=out_schema,
            stateStructType="vals array<string>, times array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_table_join_stream(
    stream: DataFrame, table: DataFrame, how: str = "left"
):
    """STREAMING kstream-ktable changelog join (join.h:28-209) — the
    incremental form of operators/joins.changelog_stream_table_join,
    reproducing the reference's emission sequence (golden vectors
    test8_join.cpp:133-190): one output row per non-tombstone stream
    event, paired with the table's LWW state as of that event; 'inner'
    drops misses, 'left' keeps them with null right.

    Both inputs are streaming changelogs in the canonical shape
    (key string, value string, event_time timestamp[, seq long]);
    NULL value = tombstone. The table side's state is carried across
    micro-batches in group state (per-key LWW (value, ts, seq) —
    exactly the mem_store the reference attaches to its ktable).
    Within a micro-batch events replay in (event_time, table-first,
    seq) order, the reference's tick order (join.h:75-79 processes the
    table before the stream each tick). Across micro-batches the join
    matches the reference when each key's events arrive time-ordered
    across batches — the per-partition ordering a Kafka changelog
    topic guarantees; a table update arriving AFTER a newer one is
    ignored rather than regressing the state.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"unsupported stream-table join flavor: {how}")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from kspp_spark.operators.joins import _tagged_union

    ev = _tagged_union(stream, table, table_first=True)
    out_schema = (
        "key string, event_time timestamp, left string, right string,"
        " tombstone boolean"
    )
    # r_live distinguishes "no table row yet" from "tombstoned": both
    # join as null, but only a live state survives LWW comparisons
    state_schema = "r_val string, r_ts long, r_seq long, r_live boolean"
    inner = how == "inner"

    def join(key_, pdf_iter, state: GroupState):
        if state.exists:
            r_val, r_ts, r_seq, r_live = state.get
            if not r_live:
                r_val = None
        else:
            r_val, r_ts, r_seq = None, -(2**62), -(2**62)
        # concat before sorting — a key's micro-batch arrives as multiple
        # Arrow chunks past arrow.maxRecordsPerBatch, and per-chunk sorts
        # would let table updates replay after stream events they precede
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["event_time", "_pri", "seq"], kind="mergesort")
            out_rows = []
            ts_ms = (pdf["event_time"].astype("int64") // 1_000_000).tolist()
            # (itertuples renames _-prefixed columns; use plain lists)
            it = zip(
                pdf["_side"].tolist(),
                pdf["_lv"].tolist(),
                pdf["_rv"].tolist(),
                pdf["seq"].tolist(),
                pdf["event_time"].tolist(),
                ts_ms,
            )
            for side, lv, rv, seq, et, ts in it:
                if side == "R":
                    if (ts, seq) >= (r_ts, r_seq):  # never regress LWW
                        r_val, r_ts, r_seq = rv, ts, seq
                elif lv is not None:  # stream tombstones emit nothing
                    if r_val is not None or not inner:
                        out_rows.append((key_[0], et, lv, r_val, False))
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=["key", "event_time", "left", "right", "tombstone"],
                )
        state.update((r_val, int(r_ts), int(r_seq), r_val is not None))

    return ev.groupBy("key").applyInPandasWithState(
        join,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def table_table_join_stream(
    left: DataFrame, right: DataFrame, how: str = "left"
):
    """STREAMING ktable-ktable changelog join (join.h:212-508, "old
    semantics") — the incremental form of
    operators/joins.changelog_table_table_join, closing the last gap vs
    the reference's continuous table-table joins: BOTH sides' LWW state
    rides in group state, so the golden emission sequence
    (test8_join.cpp:207-354) — including the impl-specific tombstones —
    is reproduced across micro-batch boundaries with no batch recompute.

    Inputs are streaming changelogs in the canonical shape (key string,
    value string, event_time timestamp[, seq long]); NULL value =
    tombstone. A change on EITHER side emits one output row:
      left:  L state null -> tombstone, else (L, R?)     (join.h:290-294)
      inner: either state null -> tombstone, else (L, R) (join.h:385-389)
      outer: both states null -> tombstone, else (L?, R?)(join.h:474-491)

    Within a micro-batch events replay in (event_time, left-first, seq)
    order — table_first=False, matching the batch replay and the
    reference's topology wiring order (join.h:228-229 registers left
    then right). Across micro-batches the join matches the reference
    when each key's events arrive time-ordered across batches — the
    per-partition ordering a Kafka changelog topic guarantees; a side's
    update arriving AFTER a newer one updates nothing but still emits
    (the reference's store applies-or-ignores then always fires).

    Scale: state is O(1) per key (two LWW cells); keys shard across
    executors by the groupBy — the same bounded-state property as the
    reference's per-partition mem_store.
    """
    if how not in ("left", "inner", "outer"):
        raise ValueError(f"unsupported table-table join flavor: {how}")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from kspp_spark.operators.joins import _tagged_union

    ev = _tagged_union(left, right, table_first=False)
    out_schema = (
        "key string, event_time timestamp, left string, right string,"
        " tombstone boolean"
    )
    # a null *_val with a real *_ts is a tombstoned cell; "never seen"
    # carries ts=NEG — emission treats both as "no value" (reference
    # behavior), but LWW comparisons still order correctly
    state_schema = (
        "l_val string, l_ts long, l_seq long,"
        " r_val string, r_ts long, r_seq long"
    )
    NEG = -(2**62)

    def join(key_, pdf_iter, state: GroupState):
        if state.exists:
            l_val, l_ts, l_seq, r_val, r_ts, r_seq = state.get
        else:
            l_val, l_ts, l_seq = None, NEG, NEG
            r_val, r_ts, r_seq = None, NEG, NEG
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["event_time", "_pri", "seq"], kind="mergesort")
            out_rows = []
            ts_ms = (pdf["event_time"].astype("int64") // 1_000_000).tolist()
            it = zip(
                pdf["_side"].tolist(),
                pdf["_lv"].tolist(),
                pdf["_rv"].tolist(),
                pdf["seq"].tolist(),
                pdf["event_time"].tolist(),
                ts_ms,
            )
            for side, lv, rv, seq, et, ts in it:
                if side == "L":
                    if (ts, seq) >= (l_ts, l_seq):  # never regress LWW
                        l_val, l_ts, l_seq = lv, ts, seq
                else:
                    if (ts, seq) >= (r_ts, r_seq):
                        r_val, r_ts, r_seq = rv, ts, seq
                if how == "left":
                    tomb = l_val is None
                elif how == "inner":
                    tomb = l_val is None or r_val is None
                else:
                    tomb = l_val is None and r_val is None
                out_rows.append(
                    (
                        key_[0],
                        et,
                        None if tomb else l_val,
                        None if tomb else r_val,
                        tomb,
                    )
                )
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=["key", "event_time", "left", "right", "tombstone"],
                )
        state.update(
            (l_val, int(l_ts), int(l_seq), r_val, int(r_ts), int(r_seq))
        )

    return ev.groupBy("key").applyInPandasWithState(
        join,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_table_stream(
    df: DataFrame,
    key: str,
    value: str,
    event_time: str,
    slot_ms: int,
    n_slots: int,
    watermark_delay: str = "0 seconds",
):
    """Windowed table with expiry tombstones — the reference's
    `mem_windowed_store` (mem_windowed_store.h):

      * records bucket into slots of `slot_ms` by ts // slot_ms
        (mem_windowed_store.h:260-262);
      * per (key, slot) the latest value wins (LWW by event time, stale
        updates ignored — mem_store.h:75-77 semantics);
      * a record older than the oldest kept slot is dropped on insert
        (late-data drop, mem_windowed_store.h:132-135);
      * when event time advances so a slot falls out of the most recent
        `n_slots`, GC evicts it and EMITS A TOMBSTONE (null value) per
        evicted key downstream (mem_windowed_store.h:89-101).

    Spark shape: applyInPandasWithState grouped by key. Event-time
    progress = the stream's watermark (the reference's topology tick,
    topology.cpp:236-253); eviction fires via EventTimeTimeout when the
    watermark passes a slot's expiry, so tombstones flow even for keys
    with no new input. Output rows: (key, slot_start, value,
    event_time); tombstone = null value with event_time = expiry tick.

    State per key is O(n_slots) — bounded regardless of input volume,
    the property that makes this safe at 100 TB.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key} string, slot_start timestamp, {value} string, {event_time} timestamp"
    )
    state_schema = "slots array<long>, vals array<string>, times array<long>"

    def expiry_of(slot: int) -> int:
        # slot is expired once the newest live slot index > slot + n_slots - 1,
        # i.e. when event time reaches (slot + n_slots) * slot_ms
        return (slot + n_slots) * slot_ms

    def proc(key_, pdf_iter, state: GroupState):
        slots: dict[int, tuple[str, int]] = {}
        if state.exists:
            s, v, t = state.get
            slots = {int(si): (vi, int(ti)) for si, vi, ti in zip(s, v, t)}
        wm = state.getCurrentWatermarkMs()
        out_rows = []
        # concat chunks before the event-time sort (multi-chunk groups
        # otherwise replay out of global order — see stream_table_join)
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(event_time, kind="mergesort")
            ts_ms = (pdf[event_time].astype("int64") // 1_000_000).tolist()
            vals = pdf[value].tolist()
            for ts, val in zip(ts_ms, vals):
                slot = ts // slot_ms
                if expiry_of(slot) <= wm:
                    continue  # late: slot already outside retention
                cur = slots.get(slot)
                if cur is not None and cur[1] > ts:
                    continue  # stale update ignored (LWW)
                slots[slot] = (val, ts)
                out_rows.append((key_[0], slot * slot_ms, val, ts))
        # GC: evict expired slots, emitting tombstones
        for slot in sorted(s for s in slots if expiry_of(s) <= wm):
            out_rows.append((key_[0], slot * slot_ms, None, expiry_of(slot)))
            del slots[slot]
        if slots:
            keep = sorted(slots)
            state.update(
                (
                    keep,
                    [slots[s][0] for s in keep],
                    [slots[s][1] for s in keep],
                )
            )
            # re-fire when the watermark passes the earliest live expiry
            next_fire = min(expiry_of(s) for s in keep)
            state.setTimeoutTimestamp(max(next_fire, wm + 1))
        elif state.exists:
            state.remove()
        if out_rows:
            yield pd.DataFrame(
                {
                    key: [r[0] for r in out_rows],
                    "slot_start": pd.to_datetime([r[1] for r in out_rows], unit="ms"),
                    value: [r[2] for r in out_rows],
                    event_time: pd.to_datetime([r[3] for r in out_rows], unit="ms"),
                }
            )

    return (
        df.withWatermark(event_time, watermark_delay)
        .groupBy(key)
        .applyInPandasWithState(
            proc,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
