"""Pluggable-fetcher seam + downloader-middleware hook points.

The engine selects its fetch stage through ``EngineConfig.fetcher`` and
wraps it with ``request_middlewares`` / ``response_middlewares`` — the
deployment seam for a real HTTP fetcher (reference:
``Borges/spiders/Elsevier/paper_xml.py:73-76``, ``AIP/aip_spider.py:16-64``)
and the Scrapy-middleware surface (``Borges/settings.py:93-104``).  No
network: the HTTP skeleton is exercised with an injected transport.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from borges_ray.pipelines.crawl import EngineConfig, collect_crawled, run_crawl
from borges_ray.stages.fetch import (HttpFetchSession, fetch_selected,
                                     write_pages_bucketed)
from borges_ray.synth import synth_pages, synth_robots, synth_seeds

N_PAGES = 400
SEED = 42


@pytest.fixture(scope="module")
def web(tmp_path_factory):
    pages = synth_pages(SEED, N_PAGES)
    seeds = synth_seeds(SEED, N_PAGES)
    robots = synth_robots(SEED, N_PAGES)
    root = tmp_path_factory.mktemp("seamweb")
    pages_root = str(root / "pages")
    write_pages_bucketed(pages.select(["url", "html"]), pages_root,
                         num_buckets=4)
    return pages, seeds, robots, pages_root, str(root)


def _cfg(**kw) -> EngineConfig:
    return EngineConfig(max_rounds=4, num_partitions=8, num_buckets=4,
                        num_seen_shards=2, **kw)


def test_fetcher_seam_conformance(web, ray_session, tmp_path):
    """A config-selected fetcher wrapping the in-corpus probe must produce
    byte-identical crawled rows to the built-in dispatch."""
    _pages, seeds, robots, pages_root, _ = web

    ck_a = str(tmp_path / "a")
    run_crawl(pages_root, seeds, robots.to_pandas(), _cfg(flaky=True),
              ck_a, resume=False)

    def my_fetcher(sel: rd.Dataset, cfg: EngineConfig, rnd: int) -> rd.Dataset:
        return fetch_selected(sel, pages_root, cfg.num_buckets,
                              flaky=cfg.flaky)

    ck_b = str(tmp_path / "b")
    run_crawl(pages_root, seeds, robots.to_pandas(),
              _cfg(flaky=True, fetcher=my_fetcher), ck_b, resume=False)

    a = collect_crawled(ck_a).to_pandas().set_index("url").sort_index()
    b = collect_crawled(ck_b).to_pandas().set_index("url").sort_index()
    assert list(a.index) == list(b.index)
    for col in ("status", "attempts", "extracted_text", "fetch_round",
                "host_seq", "lang", "n_links"):
        assert (a[col].to_numpy() == b[col].to_numpy()).all(), col


def test_middlewares_hook_points(web, ray_session, tmp_path):
    """Request middleware filters the selection before fetch; response
    middleware rewrites fetched rows before parse."""
    _pages, seeds, robots, pages_root, _ = web

    ck_a = str(tmp_path / "a")
    run_crawl(pages_root, seeds, robots.to_pandas(), _cfg(), ck_a,
              resume=False)
    base = collect_crawled(ck_a).to_pandas()
    # pick a host that was actually crawled to block via middleware
    blocked_host = base.loc[base["status"] == 200, "host"].iloc[0]

    def drop_host(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["host"] != blocked_host]

    def tag_teapot(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out.loc[out["status"] == 404, "status"] = 418
        return out

    ck_b = str(tmp_path / "b")
    run_crawl(pages_root, seeds, robots.to_pandas(),
              _cfg(request_middlewares=(drop_host,),
                   response_middlewares=(tag_teapot,)), ck_b, resume=False)
    out = collect_crawled(ck_b).to_pandas()
    assert (out["host"] != blocked_host).all()
    assert (out["status"] != 404).all()
    assert (out["status"] == 418).any() or not (base["status"] == 404).any()


def test_http_fetch_session_contract(ray_session):
    """Interface-level skeleton test with an injected transport: contract
    columns, retry-until-200 semantics, and per-host token-bucket pacing
    recorded on the virtual clock."""
    calls: dict[str, int] = {}

    def transport(url: str):
        n = calls.get(url, 0) + 1
        calls[url] = n
        if url.endswith("/flaky") and n < 3:
            return 500, None
        if url.endswith("/missing"):
            return 404, None
        return 200, f"<html>{url}</html>"

    fs = HttpFetchSession(transport, min_interval_ms=750)
    t = pa.table({
        "url": ["http://a.com/1", "http://a.com/flaky", "http://b.com/1",
                "http://a.com/2", "http://b.com/missing"],
        "host": ["a.com", "a.com", "b.com", "a.com", "b.com"],
    })
    out = fs(t)
    got = out.to_pandas().set_index("url")
    assert got.loc["http://a.com/1", "status"] == 200
    assert got.loc["http://a.com/1", "attempts"] == 1
    assert got.loc["http://a.com/flaky", "status"] == 200
    assert got.loc["http://a.com/flaky", "attempts"] == 3
    assert got.loc["http://b.com/missing", "status"] == 404
    assert got.loc["http://b.com/missing", "html"] is None
    assert got.loc["http://a.com/1", "html"] == b"<html>http://a.com/1</html>"

    # token bucket: per-host schedule gaps >= min_interval_ms
    for host in ("a.com", "b.com"):
        s = sorted(got.loc[got["host"] == host, "sched_ms"])
        assert all(b - a >= 750 for a, b in zip(s, s[1:])), (host, s)


def test_http_fetcher_through_engine(web, ray_session, tmp_path):
    """End-to-end: the HTTP skeleton drives a crawl through the seam, with
    the transport answering from the synthetic corpus — identical crawled
    url set to the in-corpus probe path."""
    pages, seeds, robots, pages_root, _ = web
    corpus = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))

    def transport(url: str):
        h = corpus.get(url)
        return (200, h) if h is not None else (404, None)

    def http_fetcher(sel: rd.Dataset, cfg: EngineConfig, rnd: int):
        from borges_ray.stages.fetch import fetch_selected_http
        return fetch_selected_http(sel, transport=transport,
                                   min_interval_ms=0, concurrency=(1, 2))

    ck_a = str(tmp_path / "a")
    run_crawl(pages_root, seeds, robots.to_pandas(), _cfg(), ck_a,
              resume=False)
    ck_b = str(tmp_path / "b")
    run_crawl(pages_root, seeds, robots.to_pandas(),
              _cfg(fetcher=http_fetcher), ck_b, resume=False)
    a = collect_crawled(ck_a).to_pandas().set_index("url").sort_index()
    b = collect_crawled(ck_b).to_pandas().set_index("url").sort_index()
    assert list(a.index) == list(b.index)
    for col in ("status", "extracted_text", "fetch_round", "host_seq"):
        assert (a[col].to_numpy() == b[col].to_numpy()).all(), col


def test_http_fetch_session_real_clock_bucket(ray_session):
    """sleep=True honors the PER-HOST schedule on the real clock: an
    interleaved 2-host batch with min_interval=150ms needs ~1 interval
    total (two hosts proceed in parallel slots), not one interval per
    row — and per-host gaps stay >= the interval."""
    import time as _time

    from borges_ray.stages.fetch import HttpFetchSession

    fs = HttpFetchSession(lambda u: (200, "<x>"), min_interval_ms=150,
                          sleep=True)
    t = pa.table({
        "url": ["http://a.com/1", "http://b.com/1",
                "http://a.com/2", "http://b.com/2"],
        "host": ["a.com", "b.com", "a.com", "b.com"],
    })
    t0 = _time.monotonic()
    out = fs(t).to_pandas()
    elapsed = _time.monotonic() - t0
    # second request per host waits one interval; hosts overlap
    assert 0.10 <= elapsed < 0.60, elapsed
    for host in ("a.com", "b.com"):
        sc = sorted(out.loc[out["host"] == host, "sched_ms"])
        assert all(b - a >= 150 for a, b in zip(sc, sc[1:])), (host, sc)
