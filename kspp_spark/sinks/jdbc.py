"""JDBC/DBAPI upsert sink: auto-DDL + executemany callables.

Parity targets (libraries/kspp-pg):
  auto-DDL       postgres_producer.cpp:147-163 creates the target table
                 from the first record's Avro schema via
                 pq::avro2sql_create_table_statement
                 (postgres_avro_utils.cpp:370-395: per-field SQL type
                 from avro_type_to_oid/to_string, NOT NULL for
                 non-union fields, PRIMARY KEY from the id columns).
  upsert batch   postgres_producer.cpp:178-238 builds batched
                 INSERT .. ON CONFLICT (keys) DO UPDATE SET; deletes at
                 :277 are DELETE .. WHERE key IN (...).

Spark mapping: the batching/dedupe/tombstone-splitting logic lives in
writers.foreach_batch_upsert (one LWW aggregation per micro-batch);
this module supplies the missing concrete pieces — the CREATE TABLE
generator from a Spark schema and DBAPI executemany upsert_fn /
delete_fn implementations — so a Postgres (or any ON CONFLICT-capable
DBAPI engine: sqlite for tests) round trip works out of the box.

Scale: executemany runs per-partition on executors (connection per
partition, like the reference's max-http-connection bound); the driver
only runs the one-time DDL. Row volume per batch is whatever the
micro-batch holds — the LWW dedupe upstream has already collapsed it
to one row per key.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import types as T


def _sql_type(dt: T.DataType, dialect: str) -> str:
    """Spark type -> SQL column type, mirroring the reference's
    avro_type_to_oid + to_string mapping (postgres_avro_utils.cpp:283-351):
    string->text, bytes->bytea, int->integer, long->bigint,
    float->float4, double->float8, bool->boolean, array->text[].
    Types the Avro path can't carry (timestamp, date, decimal) map to
    their natural SQL types."""
    pg = dialect == "postgres"
    if isinstance(dt, T.StringType):
        return "text"
    if isinstance(dt, T.BinaryType):
        return "bytea" if pg else "blob"
    if isinstance(dt, (T.ByteType, T.ShortType)):
        return "smallint"
    if isinstance(dt, T.IntegerType):
        return "integer"
    if isinstance(dt, T.LongType):
        return "bigint"
    if isinstance(dt, T.FloatType):
        return "float4" if pg else "real"
    if isinstance(dt, T.DoubleType):
        return "float8" if pg else "real"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.DecimalType):
        return f"numeric({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType) and pg:
        return _sql_type(dt.elementType, dialect) + "[]"
    # arrays on non-pg engines, maps, structs: JSON text (the reference
    # comments the same array-as-json fallback, postgres_avro_utils.cpp:300)
    return "text"


def schema_to_create_table(
    schema: T.StructType,
    table: str,
    key_cols: list[str],
    dialect: str = "postgres",
    if_not_exists: bool = True,
) -> str:
    """CREATE TABLE statement from a Spark schema — the
    avro2sql_create_table_statement equivalent: one column per field,
    NOT NULL when the field is non-nullable (the reference derives
    nullability from the avro union wrapper), PRIMARY KEY from
    key_cols."""
    missing = [k for k in key_cols if k not in schema.fieldNames()]
    if missing:
        raise ValueError(f"key columns {missing} not in schema")
    cols = []
    for f in schema.fields:
        null = "" if f.nullable and f.name not in key_cols else " NOT NULL"
        cols.append(f"{f.name} {_sql_type(f.dataType, dialect)}{null}")
    ine = "IF NOT EXISTS " if if_not_exists else ""
    pk = f", PRIMARY KEY ({', '.join(key_cols)})" if key_cols else ""
    return f"CREATE TABLE {ine}{table} (\n  " + ",\n  ".join(cols) + pk + "\n)"


def dbapi_upsert_callables(
    connect: Callable[[], "object"],
    table: str,
    key_cols: list[str],
    value_cols: list[str],
    event_time: str = "event_time",
    paramstyle: str = "qmark",
) -> tuple[Callable[[list[tuple]], None], Callable[[list[tuple]], None]]:
    """(upsert_fn, delete_fn) for writers.foreach_batch_upsert, backed
    by DBAPI executemany.

    upsert: INSERT .. ON CONFLICT (keys) DO UPDATE SET — the
    reference's statement shape (avro2sql_build_insert_1 +
    avro2sql_build_upsert_2); valid PostgreSQL and sqlite >= 3.24.
    delete: DELETE .. WHERE keys match (postgres_producer.cpp:277).

    `connect` must be a PICKLABLE zero-arg factory (e.g.
    functools.partial(psycopg2.connect, dsn) or
    functools.partial(sqlite3.connect, path, timeout=30)) — it runs
    inside executor workers, one connection per partition. paramstyle:
    'qmark' (?, sqlite) or 'format' (%s, psycopg2).
    """
    ph = "?" if paramstyle == "qmark" else "%s"
    all_cols = [*key_cols, *value_cols, event_time]
    upd_cols = [*value_cols, event_time]
    upsert_sql = (
        f"INSERT INTO {table} ({', '.join(all_cols)}) "
        f"VALUES ({', '.join([ph] * len(all_cols))}) "
        f"ON CONFLICT ({', '.join(key_cols)}) DO UPDATE SET "
        + ", ".join(f"{c} = excluded.{c}" for c in upd_cols)
    )
    delete_sql = (
        f"DELETE FROM {table} WHERE "
        + " AND ".join(f"{c} = {ph}" for c in key_cols)
    )

    def _run(sql: str, rows: list[tuple]) -> None:
        if not rows:
            return
        conn = connect()
        try:
            cur = conn.cursor()
            cur.executemany(sql, rows)
            conn.commit()
        finally:
            conn.close()

    def upsert_fn(rows: list[tuple]) -> None:
        _run(upsert_sql, rows)

    def delete_fn(rows: list[tuple]) -> None:
        _run(delete_sql, rows)

    return upsert_fn, delete_fn


def dbapi_upsert_sink(
    connect: Callable[[], "object"],
    schema: T.StructType,
    table: str,
    key_cols: list[str],
    value_cols: list[str],
    event_time: str = "event_time",
    dialect: str = "sqlite",
    auto_create: bool = True,
) -> Callable[["object", int], None]:
    """Complete foreachBatch sink: auto-DDL on first batch (driver-side,
    like the reference's lazy create on the first non-delete message,
    postgres_producer.cpp:147-163) + LWW-deduped upsert/delete batches
    through DBAPI executemany on executors. Usable directly on a batch
    DataFrame (`sink(df, 0)`) or under writeStream.foreachBatch."""
    from kspp_spark.sinks.writers import foreach_batch_upsert

    paramstyle = "format" if dialect == "postgres" else "qmark"
    upsert_fn, delete_fn = dbapi_upsert_callables(
        connect, table, key_cols, value_cols, event_time, paramstyle
    )
    inner = foreach_batch_upsert(
        key_cols, value_cols, upsert_fn, delete_fn, event_time
    )
    created = []

    def write_batch(batch, batch_id: int) -> None:
        if auto_create and not created:
            ddl = schema_to_create_table(schema, table, key_cols, dialect)
            conn = connect()
            try:
                conn.cursor().execute(ddl)
                conn.commit()
            finally:
                conn.close()
            created.append(True)
        inner(batch, batch_id)

    return write_batch
