"""Golden vectors for the connection-string utilities — the exact
assertions of the reference's tests/test7_cluster_uri.cpp and
tests/test7_url_vector.cpp."""

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
