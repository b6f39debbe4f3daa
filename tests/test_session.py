"""Session-factory conf wiring (observability opt-in).

Parity target: the reference pushes metrics through
prometheus_pushgateway_utils (utils/prometheus_pushgateway_utils.h);
Spark's native equivalent is the PrometheusServlet scrape endpoint —
METRICS.md maps the metric names. These tests pin that get_spark's
opt-in flag actually submits those confs (monkeypatched builder: a
second real session can't be created inside the suite, and getOrCreate
on an existing one silently drops static confs).
"""

import kspp_spark.session as session_mod
from kspp_spark.session import prometheus_metrics_conf


def test_prometheus_conf_mapping():
    conf = prometheus_metrics_conf()
    assert conf["spark.ui.prometheus.enabled"] == "true"
    assert (
        conf["spark.metrics.conf.*.sink.prometheusServlet.class"]
        == "org.apache.spark.metrics.sink.PrometheusServlet"
    )
    assert (
        conf["spark.metrics.conf.*.sink.prometheusServlet.path"]
        == "/metrics/prometheus"
    )
    assert conf["spark.sql.streaming.metricsEnabled"] == "true"


class _FakeContext:
    def setLogLevel(self, level):
        pass


class _FakeSession:
    sparkContext = _FakeContext()


class _FakeBuilder:
    def __init__(self, record):
        self._record = record

    def master(self, m):
        return self

    def appName(self, n):
        return self

    def config(self, k, v):
        self._record[k] = v
        return self

    def getOrCreate(self):
        return _FakeSession()


def _confs_submitted(monkeypatch, **kwargs):
    record = {}

    class _FakeSparkSession:
        builder = _FakeBuilder(record)

    monkeypatch.setattr(session_mod, "SparkSession", _FakeSparkSession)
    session_mod.get_spark("conf_probe", **kwargs)
    return record

def test_get_spark_submits_prometheus_confs(monkeypatch):
    record = _confs_submitted(monkeypatch, metrics_prometheus=True)
    for k, v in prometheus_metrics_conf().items():
        assert record[k] == v
    # the servlet serves through the UI — flag must force the UI on
    assert record["spark.ui.enabled"] == "true"


def test_get_spark_default_leaves_metrics_off(monkeypatch):
    record = _confs_submitted(monkeypatch)
    assert "spark.ui.prometheus.enabled" not in record
    assert record["spark.ui.enabled"] == "false"
