"""kspp_spark — a PySpark-native analytics/stream-processing engine.

A from-scratch re-expression of the capabilities of bitbouncer/kspp
(a C++17 Kafka-Streams-style framework; see /root/reference) on top of
Apache Spark: DataFrame/SQL for the batch surface, Structured Streaming
for the streaming surface, Catalyst/Tungsten for optimization.

Canonical record model (reference: include/kspp/krecord.h:12-64):
a changelog DataFrame with columns ``(key, value, event_time)`` where a
NULL ``value`` is a tombstone (delete for that key). All operators are
plain functions over DataFrames so Catalyst sees one logical plan
end-to-end — no driver-side loops, no per-record Python in hot paths.
"""

from kspp_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
