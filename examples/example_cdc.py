"""Incremental CDC table scrape — the reference's postgres source
pattern (postgres_read_cursor.cpp keyset pagination): repeated
SELECT ... WHERE (ts = last_ts AND id > last_id) OR (ts > last_ts)
ORDER BY ts, id LIMIT n, with the cursor persisted so a restart
resumes where it left off. Runs self-contained here by pointing the
fetch at an in-memory table standing in for the database."""

import os
import tempfile

from kspp_spark.sources.jdbc_keyset import FileOffsetStorage, JdbcKeysetSource
from kspp_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def fake_db(spark, rows):
    spark.createDataFrame(rows, "id long, ts long, payload string")\
        .createOrReplaceTempView("cdc_table")
    return lambda q: spark.sql(q[1 : q.rfind(")")])


def main() -> None:
    spark = get_spark("example_cdc")
    rows = [(i, 10 * (i // 3), f"row-{i}") for i in range(10)]
    with tempfile.TemporaryDirectory() as d:
        store = FileOffsetStorage(f"{d}/cursor.json")
        src = JdbcKeysetSource(
            spark, url="", table="cdc_table", ts_col="ts", id_col="id",
            batch_size=4, fetch_fn=fake_db(spark, rows), offset_store=store,
        )
        total = 0
        while (page := src.poll_once()) is not None and page.count() > 0:
            n = page.count()
            total += n
            print(f"page: {n} rows, cursor=(ts={src.last_ts}, id={src.last_id})")
        print(f"scraped {total} rows")
        # restart: a NEW source over the same offset store resumes —
        # only rows newer than the stored cursor come back
        rows2 = rows + [(10, 40, "row-10"), (11, 40, "row-11")]
        src2 = JdbcKeysetSource(
            spark, url="", table="cdc_table", ts_col="ts", id_col="id",
            batch_size=4, fetch_fn=fake_db(spark, rows2), offset_store=store,
        )
        delta = src2.poll_once()
        print(f"after restart: {delta.count()} new rows (the delta only)")
    spark.stop()


if __name__ == "__main__":
    main()
