"""Canonical changelog record model.

Reference semantics (include/kspp/krecord.h:12-64): a record is
(key, value, event_time_ms); a NULL value is a tombstone (delete).
Here a *changelog* is any DataFrame with three designated columns
(default names ``key``, ``value``, ``event_time``) plus an optional
``seq`` column for arrival-order tiebreaks at equal event_time
(the reference's per-partition queue preserves arrival order;
include/kspp/internal/event_queue.h:16-117).

All stateful operators (ktable, joins, windowed stores) resolve
conflicts last-write-wins by (event_time, seq): an update or delete
with an *older* event_time than the stored record is ignored
(state_stores/mem_store.h:64-83); equal event_time -> later arrival
wins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F, Window as W


@dataclass(frozen=True)
class ChangelogCols:
    key: str = "key"
    value: str = "value"
    event_time: str = "event_time"
    seq: str | None = None  # arrival-order tiebreak; None = use event_time only

    def order_cols(self, df: DataFrame) -> list[Column]:
        cols = [F.col(self.event_time)]
        if self.seq and self.seq in df.columns:
            cols.append(F.col(self.seq))
        return cols


DEFAULT_COLS = ChangelogCols()


def as_changelog(
    df: DataFrame,
    key: str,
    value: str | Column,
    event_time: str,
    seq: str | None = None,
) -> DataFrame:
    """Project an arbitrary DataFrame into canonical changelog shape."""
    value_col = F.col(value) if isinstance(value, str) else value
    out = df.select(
        F.col(key).alias("key"),
        value_col.alias("value"),
        F.col(event_time).alias("event_time"),
        *([F.col(seq).alias("seq")] if seq else []),
    )
    return out


def is_tombstone(cols: ChangelogCols = DEFAULT_COLS) -> Column:
    return F.col(cols.value).isNull()


def latest_state_window(cols: ChangelogCols = DEFAULT_COLS):
    """Window for per-key state replay in event order."""
    order = [F.col(cols.event_time)]
    if cols.seq:
        order.append(F.col(cols.seq))
    return W.partitionBy(cols.key).orderBy(*order)
