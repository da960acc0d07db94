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


def test_url_features_batch_vs_urlsplit_reference():
    """Seeded-random URLs: the vectorized regex kernels must agree with
    a pure urllib.urlsplit-based reference on every feature."""
    from urllib.parse import urlsplit

    import numpy as np
    import pandas as pd

    from borges_ray.canonical import url_features_batch

    rng = np.random.default_rng(11)
    schemes = ["http", "https", "HTTP", "Https"]
    hosts = ["a.example.com", "x9.y.example.net", "WWW.Site3.ORG",
             "h0st-1.example.com", "plain"]
    urls = []
    for _ in range(400):
        sch = schemes[rng.integers(len(schemes))]
        host = hosts[rng.integers(len(hosts))]
        port = ["", ":80", ":8080"][rng.integers(3)]
        segs = ["seg%d" % rng.integers(100)
                for _ in range(rng.integers(0, 5))]
        path = "/" + "/".join(segs) if segs else ["", "/"][rng.integers(2)]
        nq = int(rng.integers(0, 4))
        q = "&".join(f"k{j}=v{rng.integers(10)}" for j in range(nq))
        urls.append(sch + "://" + host + port + path + ("?" + q if q else ""))

    out = url_features_batch(pd.Series(urls))
    for i, u in enumerate(urls):
        p = urlsplit(u)
        segs = [s for s in p.path.split("/") if s]
        host = p.hostname or ""
        assert out["scheme"].iat[i] == p.scheme.lower(), u
        assert out["host"].iat[i] == host, u
        assert out["host_len"].iat[i] == len(host), u
        assert out["host_digits"].iat[i] == sum(c.isdigit() for c in host), u
        assert out["path_depth"].iat[i] == len(segs), u
        nq = len(p.query.split("&")) if p.query else 0
        assert out["n_params"].iat[i] == nq, u
        assert out["url_len"].iat[i] == len(u), u


def test_url_template_batch():
    import pandas as pd

    from borges_ray.canonical import url_template_batch

    out = url_template_batch(pd.Series([
        "https://a.com/cal/2026/08/19?x=1",
        "http://b.com:8080/page/421",
        "https://a.com",
        "https://c.com/v2/item09x7/",
    ]))
    assert out["host"].tolist() == ["a.com", "b.com", "a.com", "c.com"]
    assert out["template"].tolist() == [
        "/cal/N/N/N", "/page/N", "/", "/vN/itemNxN/"]
