"""Golden join-semantics vectors from the reference's test8.

Input scripts and expected output sequences transcribed from
/root/reference/tests/test8_join.cpp:90-109 (streams) and :133-354
(expected emissions per join flavor). These are the primary oracle for
the five join flavors and ktable LWW semantics.
"""

import pytest
from pyspark.sql import types as T

from kspp_spark.operators.joins import (
    changelog_stream_table_join,
    changelog_table_table_join,
)

SCHEMA = T.StructType(
    [
        T.StructField("key", T.IntegerType()),
        T.StructField("value", T.StringType()),
        T.StructField("event_time", T.LongType()),
    ]
)

# test8_join.cpp:90-99  (ts, value) on key=42; None = tombstone
STREAM_1 = [(1, None), (3, "A"), (5, "B"), (7, None), (9, "C"), (12, None), (15, "D")]
# test8_join.cpp:101-109
STREAM_2 = [(2, None), (4, "a"), (6, "b"), (8, None), (10, "c"), (11, None), (13, None), (14, "d")]


def make(spark, script):
    rows = [(42, v, ts) for ts, v in script]
    return spark.createDataFrame(rows, SCHEMA)


def emitted(df):
    rows = df.orderBy("event_time").collect()
    out = []
    for r in rows:
        if r.tombstone:
            out.append((r.event_time, None))
        else:
            out.append((r.event_time, (r.left, r.right)))
    return out


def test_kstream_ktable_left_join(spark):
    # test8_join.cpp:133-155
    expected = [(3, ("A", None)), (5, ("B", "a")), (9, ("C", None)), (15, ("D", "d"))]
    got = emitted(changelog_stream_table_join(make(spark, STREAM_1), make(spark, STREAM_2), "left"))
    assert got == expected


def test_kstream_ktable_inner_join(spark):
    # test8_join.cpp:171-190
    expected = [(5, ("B", "a")), (15, ("D", "d"))]
    got = emitted(
        changelog_stream_table_join(make(spark, STREAM_1), make(spark, STREAM_2), "inner")
    )
    assert got == expected


def test_ktable_ktable_left_join(spark):
    # test8_join.cpp:207-244 ("old semantics" incl. impl-specific tombstones)
    expected = [
        (1, None),
        (2, None),
        (3, ("A", None)),
        (4, ("A", "a")),
        (5, ("B", "a")),
        (6, ("B", "b")),
        (7, None),
        (8, None),
        (9, ("C", None)),
        (10, ("C", "c")),
        (11, ("C", None)),
        (12, None),
        (13, None),
        (14, None),
        (15, ("D", "d")),
    ]
    got = emitted(changelog_table_table_join(make(spark, STREAM_1), make(spark, STREAM_2), "left"))
    assert got == expected


def test_ktable_ktable_inner_join(spark):
    # test8_join.cpp:261-300
    expected = [
        (1, None),
        (2, None),
        (3, None),
        (4, ("A", "a")),
        (5, ("B", "a")),
        (6, ("B", "b")),
        (7, None),
        (8, None),
        (9, None),
        (10, ("C", "c")),
        (11, None),
        (12, None),
        (13, None),
        (14, None),
        (15, ("D", "d")),
    ]
    got = emitted(changelog_table_table_join(make(spark, STREAM_1), make(spark, STREAM_2), "inner"))
    assert got == expected


def test_ktable_ktable_outer_join(spark):
    # test8_join.cpp:317-354
    expected = [
        (1, None),
        (2, None),
        (3, ("A", None)),
        (4, ("A", "a")),
        (5, ("B", "a")),
        (6, ("B", "b")),
        (7, (None, "b")),
        (8, None),
        (9, ("C", None)),
        (10, ("C", "c")),
        (11, ("C", None)),
        (12, None),
        (13, None),
        (14, (None, "d")),
        (15, ("D", "d")),
    ]
    got = emitted(changelog_table_table_join(make(spark, STREAM_1), make(spark, STREAM_2), "outer"))
    assert got == expected


@pytest.mark.parametrize("how", ["left", "inner", "outer"])
def test_table_table_multi_key_independence(spark, how):
    """Keys replay independently (per-partition semantics)."""
    a = spark.createDataFrame([(1, "x", 10), (2, "y", 11)], SCHEMA)
    b = spark.createDataFrame([(1, "p", 12), (3, "q", 13)], SCHEMA)
    out = changelog_table_table_join(a, b, how)
    keys = {r.key for r in out.collect()}
    assert keys == {1, 2, 3}
