from borges_ray.canonical import canonicalize, canonicalize_batch, host_of, partition_of, stable_hash


def test_lowercase_host_and_scheme():
    assert canonicalize("HTTP://HOST-1.EXAMPLE/p/1") == "http://host-1.example/p/1"


def test_default_port_stripped():
    assert canonicalize("http://a.example:80/x") == "http://a.example/x"
    assert canonicalize("https://a.example:443/x") == "https://a.example/x"
    assert canonicalize("http://a.example:8080/x") == "http://a.example:8080/x"


def test_fragment_stripped():
    assert canonicalize("http://a.example/p/1#sec2") == "http://a.example/p/1"


def test_query_sorted_and_kept():
    assert canonicalize("http://a.example/q?b=2&a=1") == "http://a.example/q?a=1&b=2"
    assert canonicalize("http://a.example/q?") == "http://a.example/q"


def test_relative_resolution():
    base = "http://a.example/p/1"
    assert canonicalize("/p/2", base) == "http://a.example/p/2"
    assert canonicalize("../p/3", base) == "http://a.example/p/3"
    assert canonicalize("p/4", base) == "http://a.example/p/p/4"
    assert canonicalize("#frag", base) == "http://a.example/p/1"


def test_empty_path():
    assert canonicalize("http://a.example") == "http://a.example/"


def test_non_http_rejected():
    assert canonicalize("mailto:x@y.z") is None
    assert canonicalize("javascript:void(0)") is None
    assert canonicalize("ftp://a.example/f") is None


def test_host_of_and_partition_stability():
    u = "http://host-3.example/p/9"
    assert host_of(u) == "host-3.example"
    assert partition_of(u, 16) == stable_hash(u) % 16
    assert stable_hash(u) == stable_hash(u)


def test_batch_matches_scalar():
    urls = ["HTTP://A.EXAMPLE/x#f", "/rel", "mailto:z", "http://b.example/q?b=1&a=2"]
    bases = ["http://a.example/", "http://a.example/d/", "http://a.example/", "http://b.example/"]
    assert canonicalize_batch(urls, bases) == [canonicalize(u, b) for u, b in zip(urls, bases)]


def test_url_features_batch():
    import pandas as pd

    from borges_ray.canonical import url_features_batch

    out = url_features_batch(pd.Series([
        "https://www.site7.example.com/a/b/c123?x=1&y=2",
        "http://site9.example.com:8080/p42",
        "http://site0.example.com/",
        "HTTPS://UP.example.com/A//B/",   # double slash collapses
        "http://h.example.com/p?only=1",
    ]))
    assert out["scheme"].tolist() == ["https", "http", "http", "https",
                                      "http"]
    assert out["host"].tolist() == [
        "www.site7.example.com", "site9.example.com", "site0.example.com",
        "up.example.com", "h.example.com"]
    assert out["path_depth"].tolist() == [3, 1, 0, 2, 1]
    assert out["n_params"].tolist() == [2, 0, 0, 0, 1]
    assert out["host_digits"].tolist() == [1, 1, 1, 0, 0]
    assert out["url_len"].tolist() == [46, 33, 25, 28, 29]
