"""Golden vectors for the connection-string utilities — the exact
assertions of the reference's tests/test7_cluster_uri.cpp and
tests/test7_url_vector.cpp."""

import os

from kspp_spark.utils import ClusterUri, split_url_list


def test_cluster_uri_trivial_with_path():
    # test7_cluster_uri.cpp: scheme lowercased, multi-host authority,
    # path preserved, str() round-trip
    uri = ClusterUri.parse("Zk://127.0.0.1:2181,192.168.100.44:2181/nisseGul")
    assert uri.good
    assert uri.scheme == "zk"
    assert uri.authority == "127.0.0.1:2181,192.168.100.44:2181"
    assert uri.path == "/nisseGul"
    assert str(uri) == "zk://127.0.0.1:2181,192.168.100.44:2181/nisseGul"


def test_cluster_uri_no_path():
    uri = ClusterUri.parse("Zk://127.0.0.1:2181,192.168.100.44:2181")
    assert uri.good and uri.path == ""
    assert str(uri) == "zk://127.0.0.1:2181,192.168.100.44:2181"


def test_cluster_uri_ipv6_authority():
    s = "https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321,[::1]:5555,[0:0:0:0:0:0:0:1]:1432"
    uri = ClusterUri.parse(s)
    assert uri.good
    assert uri.scheme == "https"
    assert uri.authority == (
        "[2001:db8:85a3:0:0:8a2e:370:7334]:4321,[::1]:5555,[0:0:0:0:0:0:0:1]:1432"
    )
    assert uri.path == ""
    assert str(uri) == s


def test_cluster_uri_strips_whitespace_in_host_list():
    uri = ClusterUri.parse(
        "https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321, [::1]:5555 ,[0:0:0:0:0:0:0:1]:1432"
    )
    assert uri.good
    assert uri.authority == (
        "[2001:db8:85a3:0:0:8a2e:370:7334]:4321,[::1]:5555,[0:0:0:0:0:0:0:1]:1432"
    )


def test_cluster_uri_ipv6_path_split_outside_brackets():
    uri = ClusterUri.parse("http://[::1]:1432/chroot/x")
    assert uri.authority == "[::1]:1432" and uri.path == "/chroot/x"


def test_cluster_uri_bad_inputs():
    assert ClusterUri.parse("zk://") is None
    assert ClusterUri.parse("no-scheme-no-default") is None


def test_split_url_list_full_urls():
    # test7_url_vector.cpp: each element a complete URL
    v = split_url_list(
        "Https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh,"
        " https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh"
    )
    assert len(v) == 2
    for url in v:
        assert url.good
        assert url.scheme == "https"
        assert url.authority == "[2001:db8:85a3:0:0:8a2e:370:7334]:4321"
        assert url.path == "/hfadsjkh"
        assert str(url) == "https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh"


def test_split_url_list_default_scheme():
    v = split_url_list(
        "Https://[2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh,"
        " [2001:db8:85a3:0:0:8a2e:370:7334]:4321/hfadsjkh",
        "https",
    )
    assert len(v) == 2
    assert all(u.scheme == "https" and u.good for u in v)
    assert v[0].path == v[1].path == "/hfadsjkh"


def test_split_url_list_drops_empty_and_bad():
    v = split_url_list("http://a:1, ,b:2", "http")
    assert [str(u) for u in v] == ["http://a:1", "http://b:2"]


def test_cluster_config_env_parity(tmp_path, monkeypatch):
    """cluster_config load_config_from_env parity (env.cpp:33-66,
    cluster_config.cpp:37-59): same KSPP_* variables and defaults;
    feature flags gate what loads; bad broker lists are fatal;
    missing TLS material warns and is ignored."""
    import warnings as _w

    from kspp_spark.config import (
        KAFKA,
        SCHEMA_REGISTRY,
        STATE_STORE,
        ClusterConfig,
    )

    monkeypatch.setenv("KSPP_KAFKA_BROKER_URL", "ssl://b1:9093, b2:9093")
    monkeypatch.setenv("KSPP_SCHEMA_REGISTRY_URL", "http://reg:8081")
    monkeypatch.setenv("KSPP_STATE_STORE_ROOT", str(tmp_path / "state"))
    monkeypatch.setenv("KSPP_CA_CERT", str(tmp_path / "missing.pem"))

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        cfg = ClusterConfig(
            consumer_group="g1", flags=KAFKA | SCHEMA_REGISTRY | STATE_STORE
        ).load_config_from_env()
    assert cfg.consumer_group == "g1"
    assert cfg.brokers == "ssl://b1:9093, b2:9093"
    assert cfg.schema_registry_uri == "http://reg:8081"
    assert os.path.isdir(cfg.storage_root)
    # missing CA cert: warn-and-ignore, client auth never attempted
    assert any("ca_cert not found" in str(w.message) for w in caught)
    assert cfg.ca_cert_path == "" and cfg.client_cert_path == ""

    # random consumer group when empty (consumer_group_or_random)
    assert ClusterConfig().consumer_group != ClusterConfig().consumer_group

    # fatal on an unparseable broker list (cluster_config.cpp:71)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad broker config"):
        ClusterConfig().set_brokers("   ")


def test_cluster_config_kafka_options_translation(tmp_path):
    """kafka_options(): schemes drop out of bootstrap.servers, select
    the security protocol, and configured TLS material translates to
    the Java client's KIP-651 PEM configs (the librdkafka-style
    ssl.*.location names the reference uses are NOT understood by the
    Apache Kafka Java client Spark embeds — emitting them would leave
    SSL with no trust/client auth); mixed schemes are rejected."""
    import pytest as _pytest

    from kspp_spark.config import ClusterConfig

    cfg = ClusterConfig(consumer_group="g")
    cfg.set_brokers("plaintext://b1:9092,b2:9092")
    o = cfg.kafka_options()
    assert o["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert o["kafka.security.protocol"] == "PLAINTEXT"
    assert "kafka.ssl.truststore.location" not in o

    ca = tmp_path / "ca.pem"; ca.write_text("CA PEM")
    cert = tmp_path / "c.pem"; cert.write_text("CERT CHAIN PEM")
    key = tmp_path / "k.pem"; key.write_text("KEY PEM")
    cfg.set_brokers("ssl://b1:9093")
    assert cfg.set_ca_cert_path(str(ca))
    assert cfg.set_private_key_path(str(cert), str(key), "pw")
    o = cfg.kafka_options()
    assert o["kafka.security.protocol"] == "SSL"
    # CA file is a valid PEM truststore as-is (location form)
    assert o["kafka.ssl.truststore.type"] == "PEM"
    assert o["kafka.ssl.truststore.location"] == str(ca)
    # separate cert/key files have no two-file Java keystore form —
    # contents ride inline via the KIP-651 string configs
    assert o["kafka.ssl.keystore.type"] == "PEM"
    assert o["kafka.ssl.keystore.certificate.chain"] == "CERT CHAIN PEM"
    assert o["kafka.ssl.keystore.key"] == "KEY PEM"
    assert o["kafka.ssl.key.password"] == "pw"
    # no librdkafka-style names leak through (the Java client would
    # ignore them and log 'not a known config')
    assert not [k for k in o if ".location" in k and "store" not in k]

    # PKCS12/JKS keystore FILE alternative: key material stays
    # file-based (never inlined into the option map, which Spark may
    # surface unredacted in plans/UI/event logs)
    p12 = tmp_path / "client.p12"; p12.write_bytes(b"\x00binary keystore")
    assert cfg.set_private_key_path(str(p12), str(p12), "storepw")
    o = cfg.kafka_options()
    assert o["kafka.ssl.keystore.type"] == "PKCS12"
    assert o["kafka.ssl.keystore.location"] == str(p12)
    assert o["kafka.ssl.keystore.password"] == "storepw"
    assert "kafka.ssl.keystore.key" not in o
    assert cfg.set_private_key_path(str(cert), str(key), "pw")  # restore

    cfg.set_brokers("plaintext://a:9092,ssl://b:9093")
    with _pytest.raises(ValueError, match="mixed broker schemes"):
        cfg.kafka_options()

    # incomplete client auth (key missing) is ignored wholesale
    cfg2 = ClusterConfig(consumer_group="g2")
    assert not cfg2.set_private_key_path(str(cert), str(tmp_path / "nope"))
    assert cfg2.client_cert_path == ""


def test_materialize_once_routing(spark, tmp_path):
    """io.materialize_once (VERDICT r13 item #5): without a session
    checkpoint dir it is a localCheckpoint (blocks on executors, loud
    failure on loss); with one set it routes through the RELIABLE
    checkpoint so the materialized frame survives executor loss."""
    from kspp_spark.io import materialize_once

    df = spark.range(100).selectExpr("id", "id * 2 as v")

    # no checkpoint dir configured -> local checkpoint
    assert spark.sparkContext.getCheckpointDir() is None
    local = materialize_once(df, eager=True)
    assert local.rdd.context is spark.sparkContext
    assert local.count() == 100
    # the lineage is cut: the plan reads a LogicalRDD, not range()
    opt = local._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in opt and "Range" not in opt

    # with a checkpoint dir -> reliable checkpoint files under it
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        reliable = materialize_once(df, eager=True)
        assert reliable.count() == 100
        # the eager reliable checkpoint wrote RDD blocks under the dir
        ckpt_files = list((tmp_path / "ckpt").rglob("part-*"))
        assert ckpt_files, "no reliable-checkpoint files written"
    finally:
        # unset so later tests in this shared session keep the
        # localCheckpoint path (Scala field: Option[String] var —
        # the setter's JVM name has a $ so it needs getattr)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty()
        )
        assert sc.getCheckpointDir() is None
