"""Keyset-pagination incremental JDBC source (CDC-style table polling).

Parity target: the reference's Postgres/SQLServer pollers
(libraries/kspp-pg/postgres_read_cursor.cpp:77-95 builds
  WHERE (ts = last_ts AND id > last_id) OR (ts > last_ts)
  ORDER BY ts, id LIMIT n
and libraries/kspp-tds mirrors it for FreeTDS). The reference re-reads
a trailing window at EOF ("rescrape") to catch rows committed with
older timestamps.

Spark design: each poll is a bounded `spark.read.jdbc` with the keyset
predicate pushed down to the database (shows up in the remote query's
WHERE — the DB's (ts, id) index does the work, Spark never scans the
table). The poll loop runs driver-side but each fetched batch is a
distributed DataFrame; for parallel snapshot loads, partition on the
id column via the standard JDBC partitioning options.

At 100 TB scale this source is for *dimension/CDC ingest* (bounded
deltas per poll), not bulk facts — bulk loads should come through
files/Kafka. That matches the reference's use (table mirroring into
topics).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession


def sql_literal(v) -> str:
    """Render a Python cursor value as an ANSI-SQL literal so the keyset
    predicate is valid against a real database (not Python repr): datetimes
    become TIMESTAMP '...' literals, strings are single-quote-escaped,
    numbers pass through. This is what the remote WHERE clause actually
    executes, so injection-safe quoting matters even for trusted cursors."""
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, datetime.datetime):
        return "TIMESTAMP '" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    if isinstance(v, datetime.date):
        return "DATE '" + v.isoformat() + "'"
    if isinstance(v, (int, float)):
        # inf/nan render as bare `inf`/`nan` — invalid SQL that would
        # produce a malformed remote WHERE clause; they can never be
        # valid keyset cursor values, so fail loudly instead
        if isinstance(v, float) and not math.isfinite(v):
            raise ValueError(f"non-finite float is not a valid SQL literal: {v!r}")
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def keyset_predicate(ts_col: str, id_col: str, last_ts, last_id) -> str:
    """The exact resume predicate of postgres_read_cursor.cpp:77-95,
    with cursor values rendered as proper SQL literals."""
    ts_lit, id_lit = sql_literal(last_ts), sql_literal(last_id)
    return (
        f"(({ts_col} = {ts_lit} AND {id_col} > {id_lit}) OR ({ts_col} > {ts_lit}))"
    )


class FileOffsetStorage:
    """Cursor persistence for the CDC poller across restarts — the
    reference's fs_offset_storage (utils/offset_storage_provider.h:48-60),
    generalized from a single int64 offset to the (last_ts, last_id)
    keyset cursor. JSON on any local path; datetimes ISO-encoded.
    (Kafka-path offsets don't need this — Spark checkpointing covers
    them, offset_storage_provider.h's own note.)"""

    def __init__(self, path: str) -> None:
        self.path = path

    def load(self):
        import datetime
        import json
        import os

        if not os.path.exists(self.path):
            return None  # OFFSET_END semantics: start fresh
        with open(self.path) as f:
            d = json.load(f)
        ts = d["last_ts"]
        if d.get("ts_kind") == "datetime":
            ts = datetime.datetime.fromisoformat(ts)
        return ts, d["last_id"]

    def save(self, last_ts, last_id) -> None:
        import datetime
        import json
        import os

        kind = "datetime" if isinstance(last_ts, datetime.datetime) else "plain"
        ts = last_ts.isoformat() if kind == "datetime" else last_ts
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_ts": ts, "last_id": last_id, "ts_kind": kind}, f)
        os.replace(tmp, self.path)  # atomic (persist_offset durability)


class NullOffsetStorage:
    """null_offset_storage parity: never resumes, never persists."""

    def load(self):
        return None

    def save(self, last_ts, last_id) -> None:
        pass


@dataclass
class JdbcKeysetSource:
    """Incremental keyset reader.

    >>> src = JdbcKeysetSource(spark, url, "public.orders", ts_col="updated_at",
    ...                        id_col="order_id", batch_size=50_000,
    ...                        offset_store=FileOffsetStorage("/var/run/orders.cursor"))
    >>> for batch_df in src.poll_forever():  # or src.poll_once()
    ...     process(batch_df)
    """

    spark: SparkSession
    url: str
    table: str
    ts_col: str
    id_col: str
    batch_size: int = 50_000
    properties: dict = field(default_factory=dict)
    # rescrape: on EOF re-read rows with ts >= last_ts - rescrape_window
    # (postgres_consumer rescrape policy)
    rescrape_window: int | None = None
    last_ts: object = None
    last_id: object = None
    # injectable page fetcher (query_string) -> DataFrame; defaults to
    # spark.read.jdbc — swappable for tests / non-JDBC backends
    fetch_fn: Callable[[str], DataFrame] | None = None
    # cursor persistence across restarts (FileOffsetStorage /
    # NullOffsetStorage / anything with load()->(ts,id)|None, save(ts,id))
    offset_store: object = None

    def __post_init__(self) -> None:
        if self.offset_store is not None and self.last_ts is None:
            stored = self.offset_store.load()
            if stored is not None:
                self.last_ts, self.last_id = stored

    def _query(self) -> str:
        where = ""
        if self.last_ts is not None:
            where = "WHERE " + keyset_predicate(
                self.ts_col, self.id_col, self.last_ts, self.last_id
            )
        return (
            f"(SELECT * FROM {self.table} {where} "
            f"ORDER BY {self.ts_col}, {self.id_col} LIMIT {self.batch_size}) AS _kspp_page"
        )

    def _fetch(self, query: str) -> DataFrame:
        if self.fetch_fn is not None:
            return self.fetch_fn(query)
        return self.spark.read.jdbc(self.url, query, properties=self.properties)

    def poll_once(self) -> DataFrame | None:
        """Fetch the next page; None when caught up. Advances the cursor
        to the page's max (ts, id) — the caller is responsible for
        checkpointing (last_ts, last_id) if resume across restarts is
        needed (reference: offset_storage_provider.h)."""
        df = self._fetch(self._query())
        # Materialize the page ONCE (localCheckpoint executes the remote
        # query eagerly and pins the result): deriving the cursor and the
        # yielded batch from separate executions of a LIMIT-ed query is a
        # correctness bug — rows committed between the two executions can
        # shift the page, advancing the cursor past rows never delivered.
        df = df.localCheckpoint(eager=True)
        rows = df.orderBy(self.ts_col, self.id_col).tail(1)
        if not rows:
            return None
        last = rows[0]
        self.last_ts = last[self.ts_col]
        self.last_id = last[self.id_col]
        if self.offset_store is not None:
            self.offset_store.save(self.last_ts, self.last_id)
        return df

    def rescrape(self) -> None:
        """Rewind the cursor by `rescrape_window` (reference: the
        postgres consumer re-reads a trailing window at EOF to catch
        rows committed out of timestamp order). Re-read rows are
        expected to be deduped downstream (ktable upsert / LWW sink) —
        the at-least-once contract of the reference. last_id resets to
        a floor so the whole trailing window qualifies."""
        if self.rescrape_window is None or self.last_ts is None:
            return
        import datetime

        if isinstance(self.last_ts, datetime.datetime):
            self.last_ts = self.last_ts - datetime.timedelta(
                milliseconds=self.rescrape_window
            )
        else:
            self.last_ts = self.last_ts - self.rescrape_window
        self.last_id = None if self.last_id is None else type(self.last_id)()

    def poll_forever(
        self, on_eof: Callable[[], None] | None = None
    ) -> Iterator[DataFrame]:
        """Generator of delta batches; yields until caught up, calls
        on_eof (e.g. sleep) between polls, then applies the rescrape
        policy if configured. Combine with foreachBatch-style downstream
        processing for the streaming pipeline."""
        while True:
            batch = self.poll_once()
            if batch is None:
                if on_eof is None:
                    return
                on_eof()
                self.rescrape()
                continue
            yield batch
