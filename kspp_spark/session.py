"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same conf scales to a cluster —
AQE handles runtime re-planning (skew joins, partition coalescing),
shuffle partitions default to cores locally but should be ~2-3x total
executor cores on a real cluster (or left to AQE's initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def prometheus_metrics_conf() -> dict[str, str]:
    """Spark confs exposing the Prometheus scrape surface: driver
    /metrics/prometheus (PrometheusServlet), per-executor metrics via
    the UI endpoint, and streaming progress metrics. Returned as a dict
    so cluster submitters (spark-submit --conf) and get_spark share one
    definition."""
    return {
        "spark.ui.prometheus.enabled": "true",
        "spark.metrics.conf.*.sink.prometheusServlet.class": (
            "org.apache.spark.metrics.sink.PrometheusServlet"
        ),
        "spark.metrics.conf.*.sink.prometheusServlet.path": (
            "/metrics/prometheus"
        ),
        "spark.sql.streaming.metricsEnabled": "true",
    }


def get_spark(
    app_name: str = "kspp_spark",
    shuffle_partitions: int | None = None,
    metrics_prometheus: bool = False,
) -> SparkSession:
    """`metrics_prometheus=True` enables the Prometheus scrape surface
    the reference exposes via its prometheus_pushgateway_utils
    (METRICS.md maps kspp's metric names to Spark's): the driver serves
    executor + streaming metrics at /metrics/prometheus on the Spark UI
    port — the standard cluster observability wiring, opt-in because it
    forces the UI on."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "true" if metrics_prometheus else "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long
        # and convert in io.load (Spark has no native nanos type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if metrics_prometheus:
        for k, v in prometheus_metrics_conf().items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
