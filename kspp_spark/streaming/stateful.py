"""Custom stateful operators — the pieces Spark has no built-in for.

Parity targets (SURVEY.md §2.3, §4):
  rate_limiter  include/kspp/processors/rate_limiter.h:12-87
  token bucket  include/kspp/state_stores/mem_token_bucket_store.h:13-57
  delay         include/kspp/processors/delay.h:5-74

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

import math
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F


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
            tokens = min(capacity, tokens + delta)
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
):
    """Streaming token-bucket rate limiter via applyInPandasWithState.
    State = (tokens, tstamp) per key, exactly the reference's bucket."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    fillrate = capacity / filltime_ms
    out_schema = df.schema
    state_schema = "tokens double, tstamp long"

    def limit(key_, pdf_iter, state: GroupState):
        if state.exists:
            tokens, tstamp = state.get
        else:
            tokens, tstamp = float(capacity), 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(event_time, kind="mergesort")
            ts = (pdf[event_time].astype("int64") // 1_000_000).tolist()
            flags, tokens, tstamp = _run_bucket(ts, capacity, fillrate, tokens, tstamp)
            yield pdf[pd.Series(flags, index=pdf.index)]
        state.update((tokens, tstamp))

    return df.groupBy(key).applyInPandasWithState(
        limit,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def delay_stream(
    df: DataFrame,
    key: str,
    value: str,
    event_time: str,
    delay_ms: int,
    now_ms_fn=None,
):
    """Streaming delay (delay.h:40-50): hold each record until
    event_time + delay <= the processing tick, then release with the
    ORIGINAL event_time (the reference forwards the untouched record).

    Operates on the canonical changelog shape (key, value: string,
    event_time) — like the reference, which delays opaque serded
    records; map a struct value through to_json first if needed.
    Buffered rows live in group state as parallel arrays; a
    processing-time timeout re-fires the group to drain matured rows
    even when no new input arrives. Batch-mode delay is an identity
    (every event_time <= the batch tick), matching topology flush.

    now_ms_fn: injectable clock (tests); defaults to wall clock.
    """
    import time as _time

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    now_fn = now_ms_fn or (lambda: int(_time.time() * 1000))
    out_schema = (
        f"{key} string, {value} string, {event_time} timestamp"
    )

    def hold(key_, pdf_iter, state: GroupState):
        now_ms = now_fn()
        vals: list = []
        times: list = []
        if state.exists:
            (vals, times) = state.get
            vals, times = list(vals), list(times)
        for pdf in pdf_iter:
            vals.extend(pdf[value].tolist())
            times.extend((pdf[event_time].astype("int64") // 1_000_000).tolist())
        ready_idx = [i for i, t in enumerate(times) if t + delay_ms <= now_ms]
        pend_idx = [i for i, t in enumerate(times) if t + delay_ms > now_ms]
        if pend_idx:
            state.update(([vals[i] for i in pend_idx], [times[i] for i in pend_idx]))
            state.setTimeoutDuration(500)
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

    return df.groupBy(key).applyInPandasWithState(
        hold,
        outputStructType=out_schema,
        stateStructType="vals array<string>, times array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
