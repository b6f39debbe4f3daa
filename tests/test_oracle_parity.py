"""Replicates the driver's correctness gate locally at sf0.001:
run each queries() entry in Spark AND its oracle_sql() in DuckDB,
compare row count, column names, and the order-insensitive multiset of
values (exact — including bitwise-equal doubles, which the engine
guarantees by computing in DECIMAL or order-deterministic double
arithmetic)."""

import datetime
import math
import struct

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack("<d", v).hex()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return repr(v)


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in df_pandas[cols].iterrows()
    ]
    return cols, sorted(rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


# Queries whose filters only select rows at larger SFs — parity runs
# them against sf0.01 so the comparison is never trivially empty.
SF01_DIR = "/root/testdata/sf0.01"
SF_OVERRIDE = {"volume_shipping": SF01_DIR, "promo_suppliers": SF01_DIR}


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF01_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, duck, duck01, name):
    sf_dir = SF_OVERRIDE.get(name, SF_DIR)
    con = duck01 if sf_dir == SF01_DIR else duck
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    ddf = con.sql(ORACLES[name]).df()
    assert len(ddf) > 0, f"{name}: oracle returns no rows at {sf_dir} — trivial test"
    s_cols, s_rows = _canon(sdf)
    d_cols, d_rows = _canon(ddf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
