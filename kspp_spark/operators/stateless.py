"""Stateless transforms — the reference's projection/filter layer.

Parity targets (SURVEY.md §2.3):
  filter            include/kspp/processors/filter.h:6-79
  flat_map          include/kspp/processors/flat_map.h:8-150
  transform/_value  include/kspp/processors/transform.h:10-168
  merge             include/kspp/processors/merge.h:6-183
  visitor           include/kspp/processors/visitor.h:8-71
  repartition_by_fk include/kspp/processors/repartition.h:9-101

Everything here is a thin, named composition of built-in DataFrame ops,
so the whole chain stays inside whole-stage codegen and Catalyst can
push filters/pruning through it. No Python executes per-row.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame, functions as F


def filter_(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Keep rows matching predicate (filter.h:43-56). Pushed to the scan
    by Catalyst when the predicate references scan columns."""
    return df.filter(predicate)


def transform(df: DataFrame, *exprs: Column | str) -> DataFrame:
    """1->1 reshaping (transform.h:92-168): an arbitrary projection."""
    return df.select(*exprs)


def transform_value(df: DataFrame, **named_exprs: Column) -> DataFrame:
    """Rewrite/add value columns, key untouched (transform.h:10-89)."""
    return df.withColumns(dict(named_exprs))


def flat_map(
    df: DataFrame,
    explode_col: Column,
    alias: str,
    keep: Iterable[str] = (),
    where: Column | None = None,
) -> DataFrame:
    """1->N expansion (flat_map.h:8-150). The extractor is expressed as
    an array-producing Column (split/regexp_extract_all/sequence/...)
    which is then exploded JVM-side — the kspp callback-per-record
    becomes a vectorized generator, no Python involved.
    """
    out = df.select(*keep, F.explode(explode_col).alias(alias))
    if where is not None:
        out = out.filter(where)
    return out


def merge(*dfs: DataFrame, by_name: bool = True) -> DataFrame:
    """Fan-in union of same-typed streams (merge.h:6-183). Spark's
    union is a no-shuffle narrow op; per-queue arrival order is not
    preserved (the reference only guarantees order per upstream queue,
    which downstream stateful ops re-establish by event_time anyway).
    """
    if not dfs:
        raise ValueError("merge() needs at least one DataFrame")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d) if by_name else out.union(d)
    return out


def visitor(df: DataFrame, fn: Callable) -> None:
    """Terminal side-effect per record (visitor.h:8-71). Runs on the
    executors via foreach; use foreachPartition-style fn for batching."""
    df.foreach(fn)


def repartition_by_foreign_key(
    df: DataFrame,
    routing: DataFrame,
    key: str,
    fk: str,
    broadcast_routing: bool = True,
) -> DataFrame:
    """Re-key a stream by a foreign key looked up in a routing table
    (repartition.h:60-74). Records with no routing entry are dropped
    (repartition.h:64-73) -> inner join. The subsequent repartition
    co-locates rows by fk for downstream keyed ops; with a small
    routing table the lookup itself is a broadcast join (no shuffle
    until the intentional re-key).
    """
    r = routing.select(key, fk)
    if broadcast_routing:
        r = F.broadcast(r)
    return df.join(r, on=key, how="inner").repartition(F.col(fk))


def flat_map_pandas(df: DataFrame, extract, schema) -> DataFrame:
    """Arbitrary-Python 1->N extractor — the escape hatch matching
    kspp's full flat_map surface (flat_map.h:12: any C++ callback
    emitting 0..N records, possibly changing key and value types) for
    logic genuinely inexpressible as Column operations.

    `extract(row) -> iterable of tuples` runs per input row but rows
    move through Arrow batches (mapInPandas), so transfer is columnar
    and the op is partition-parallel with no shuffle. Prefer
    `flat_map` (JVM explode) whenever the extraction IS expressible —
    this exists for the remaining cases (recursive parsers, external
    pure-Python libraries, ...).
    """
    import pandas as pd

    names = [f.strip().split(" ")[0] for f in schema.split(",")] if isinstance(
        schema, str
    ) else [f.name for f in schema.fields]

    def gen(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                out.extend(extract(row))
            yield pd.DataFrame(out, columns=names)

    return df.mapInPandas(gen, schema)
