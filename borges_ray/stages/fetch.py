"""Fetch-as-join: the frontier probes the pages corpus by canonical URL.

The reference's fetch is a live HTTP GET (S10-S12); in this engine the web
IS a Parquet corpus (SURVEY.md §2.5), so fetch = equi-join of the selected
frontier against ``pages`` on canonical url; a miss models a 404.

Scale shape: the corpus is written **hash-bucketed by url**
(``bucket=<stable_hash(url) % B>/`` hive dirs).  A crawl round fetches a
politeness-bounded set of URLs (per-host budget × hosts), which is orders of
magnitude smaller than the corpus — so the join is: group the selected
frontier by bucket (tiny shuffle), then each group reads ONLY its bucket's
files with an ``isin`` filter pushed into the Parquet scan.  The 100 TB
corpus is never shuffled and never fully scanned per round.

The fetch stage is PLUGGABLE: ``EngineConfig.fetcher`` selects any
callable ``(selected, cfg, rnd) -> Dataset`` honoring the fetch contract
(status/attempts/html) — :class:`HttpFetchSession` below is the actor-pool
HTTP skeleton (session state in ``__init__``, per-host token bucket) a
real deployment selects; everything downstream is unchanged.  Request /
response middleware hooks wrap the stage (``Borges/settings.py:93-104``).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data as rd

from ..canonical import stable_hash

BUCKET_COL = "pbucket"

#: Deterministic transient-failure model (T6/F5 parity — the reference
#: retries each DOI up to 3 times with widening waits,
#: ``Borges/spiders/Elsevier/paper_xml.py:141-173``, and records hard
#: failures as error rows rather than failing the job).  A url fails its
#: first k attempts where k is a stable function of the url — so the oracle
#: and the engine observe identical outcomes with zero wall-clock sleeps.
MAX_FETCH_ATTEMPTS = 3


def transient_fail_count(url: str) -> int:
    """How many initial attempts fail for this url (0 for ~93%)."""
    h = stable_hash("flaky:" + url) % 100
    if h < 5:
        return 1
    if h < 7:
        return 2
    if h < 8:
        return MAX_FETCH_ATTEMPTS  # permanent: exhausts the retry budget
    return 0


def apply_flaky(url: str, status: int) -> tuple[int, int]:
    """(final_status, attempts) under the retry policy; 404s don't retry."""
    if status != 200:
        return status, 1
    fails = transient_fail_count(url)
    if fails >= MAX_FETCH_ATTEMPTS:
        return 503, MAX_FETCH_ATTEMPTS
    return 200, fails + 1


def bucket_of_urls(urls: pd.Series | list[str], num_buckets: int) -> list[int]:
    return [stable_hash(u) % num_buckets for u in urls]


def write_pages_bucketed(pages: pa.Table, root: str, num_buckets: int = 16) -> None:
    """Lay the corpus out hash-bucketed by url (one dir per bucket)."""
    buckets = pa.array(bucket_of_urls(pages["url"].to_pylist(), num_buckets), pa.int32())
    t = pages.append_column(BUCKET_COL, buckets)
    for b in range(num_buckets):
        sub = t.filter(pc.equal(t[BUCKET_COL], pa.scalar(b, pa.int32())))
        d = os.path.join(root, f"{BUCKET_COL}={b}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub.drop_columns([BUCKET_COL]), os.path.join(d, "part-0.parquet"))


def write_pages_bucketed_ds(pages_ds: rd.Dataset, root: str, num_buckets: int = 16) -> None:
    """Same layout, written distributed: add the bucket column per batch and
    let ``write_parquet`` partition on it (for the bench-scale corpus)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pa.array(bucket_of_urls(t["url"].to_pylist(), num_buckets), pa.int32())
        return t.append_column(BUCKET_COL, b)

    pages_ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        root, partition_cols=[BUCKET_COL]
    )


def fetch_selected(selected: rd.Dataset, pages_root: str, num_buckets: int,
                   flaky: bool = False) -> rd.Dataset:
    """selected(url, host, depth, priority, host_seq, partition) →
    + (status, attempts, html): left-join against the bucketed corpus.

    One ``groupby(bucket)`` over the politeness-bounded selection (tiny
    shuffle), then a bucket-local Parquet probe per group.  With ``flaky``
    the deterministic transient-failure + retry model applies (T6):
    exhausted retries become status-503 error rows that flow to metrics
    instead of failing the job (the reference's except-pass ≈
    error-row-and-continue, SURVEY.md §4 Retries).
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pa.array(bucket_of_urls(t["url"].to_pylist(), num_buckets),
                     pa.int32())
        return t.append_column(BUCKET_COL, b)

    bucketed = selected.map_batches(add_bucket, batch_format="pyarrow")

    def probe(t: pa.Table) -> pa.Table:
        """Arrow end-to-end: the bucket's hits stay an Arrow string column
        from the Parquet scan through the output block (no Python dict of
        page payloads), matched back to the frontier order with
        ``index_in`` + ``take`` — nulls are the 404s."""
        b = t[BUCKET_COL][0].as_py()
        path = os.path.join(pages_root, f"{BUCKET_COL}={int(b)}")
        out = t.drop_columns([BUCKET_COL])
        urls = out["url"].combine_chunks() if out["url"].num_chunks != 1 \
            else out["url"].chunk(0)
        if os.path.isdir(path):
            dset = pads.dataset(path, format="parquet")
            hit = dset.to_table(columns=["url", "html"],
                                filter=pc.field("url").isin(urls))
        else:
            hit = pa.table({"url": pa.array([], pa.string()),
                            "html": pa.array([], pa.binary())})
        idx = pc.index_in(urls, value_set=hit["url"].combine_chunks())
        html = pc.take(hit["html"].combine_chunks(), idx)
        # status comes from URL membership, not html validity: a corpus
        # row with a stored-NULL payload is still a 200 (the old
        # dict-membership contract)
        status = pc.if_else(pc.is_valid(idx),
                            pa.scalar(200, pa.int64()),
                            pa.scalar(404, pa.int64()))
        if flaky:
            # the retry model hashes each url (T6) — per-row by nature,
            # but the selection is politeness-bounded so the loop is tiny
            # relative to the payload column, which never leaves Arrow
            pairs = [apply_flaky(u, s) for u, s in
                     zip(urls.to_pylist(), status.to_pylist())]
            status = pa.array([p[0] for p in pairs], pa.int64())
            attempts = pa.array([p[1] for p in pairs], pa.int64())
            html = pc.if_else(pc.equal(status, 200), html,
                              pa.nulls(len(out), html.type))
        else:
            attempts = pa.array([1] * len(out), pa.int64())
        return (out.append_column("attempts", attempts)
                .append_column("html", html)
                .append_column("status", status))

    return bucketed.groupby(BUCKET_COL).map_groups(probe,
                                                   batch_format="pyarrow")


class FetchSession:
    """Stateful fetch-session ACTOR: login bootstrap + API-key pool rotation
    (T2/S13).

    Mirrors the reference's session patterns with deterministic semantics:

    - **Login bootstrap** (``Borges/spiders/AIP/aip_spider.py:16-64``): the
      session token is established ONCE per actor in ``__init__`` — the
      place a real deployment performs the login POST and stores cookies.
    - **Key rotation** (``Borges/spiders/Elsevier/paper_index.py:329-348``):
      when a fetch exhausts its retry budget (the deterministic quota model,
      :func:`transient_fail_count` ≥ MAX), the actor advances to the next
      key in the pool; after the last key it wraps and counts a
      full-pool-exhausted event (the reference prints "Hitting quota for
      all API keys" and stops — we record and continue, SURVEY.md §4
      error-row semantics).

    Output rows are IDENTICAL to :func:`fetch_selected` (status, attempts,
    html) plus a ``key_idx`` column recording which key served each row —
    the parity property the conformance test asserts."""

    def __init__(self, pages_root: str, num_buckets: int,
                 api_keys: tuple[str, ...], flaky: bool = False):
        assert api_keys, "FetchSession needs a non-empty key pool"
        self.pages_root = pages_root
        self.num_buckets = num_buckets
        self.keys = tuple(api_keys)
        self.flaky = flaky
        # login bootstrap — once per actor (real deployment: POST /login,
        # keep the cookie jar / bearer token here)
        self.session_token = stable_hash("session:" + self.keys[0])
        self.key_idx = 0
        self.pool_exhausted_events = 0

    def _rotate(self) -> None:
        self.key_idx += 1
        if self.key_idx >= len(self.keys):
            self.key_idx = 0
            self.pool_exhausted_events += 1

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_parts = []
        tmp = df.copy()
        tmp[BUCKET_COL] = bucket_of_urls(tmp["url"], self.num_buckets)
        for b, g in tmp.groupby(BUCKET_COL, sort=False):
            path = os.path.join(self.pages_root, f"{BUCKET_COL}={int(b)}")
            urls = g["url"].tolist()
            if os.path.isdir(path):
                dset = pads.dataset(path, format="parquet")
                hit = dset.to_table(columns=["url", "html"],
                                    filter=pc.field("url").isin(urls))
                hits = dict(zip(hit["url"].to_pylist(), hit["html"].to_pylist()))
            else:
                hits = {}
            o = g.drop(columns=[BUCKET_COL]).copy()
            statuses, attempts, key_idxs = [], [], []
            for u in urls:
                s = 200 if u in hits else 404
                a = 1
                if self.flaky:
                    s, a = apply_flaky(u, s)
                    if s == 503:   # quota-style exhaustion → rotate key
                        self._rotate()
                statuses.append(s)
                attempts.append(a)
                key_idxs.append(self.key_idx)
            o["attempts"] = attempts
            o["html"] = [hits.get(u) if s == 200 else None
                         for u, s in zip(urls, statuses)]
            o["status"] = statuses
            o["key_idx"] = pd.Series(key_idxs, index=o.index, dtype="int32")
            out_parts.append(o)
        if not out_parts:
            out = df.copy()
            for c, d in (("attempts", "int64"), ("status", "int64")):
                out[c] = pd.Series(dtype=d)
            out["html"] = pd.Series(dtype=object)
            out["key_idx"] = pd.Series(dtype="int32")
            return out
        return pd.concat(out_parts, ignore_index=True)


def fetch_selected_sessions(selected: rd.Dataset, pages_root: str,
                            num_buckets: int, api_keys: tuple[str, ...],
                            flaky: bool = False, concurrency=(1, 4)) -> rd.Dataset:
    """Session-actor fetch path: same rows as :func:`fetch_selected` (plus
    ``key_idx``), with per-actor login + key-pool state.  The pool stays
    small (below node CPUs) so it never starves the upstream stages."""
    return selected.map_batches(
        FetchSession,
        fn_constructor_kwargs={"pages_root": pages_root,
                               "num_buckets": num_buckets,
                               "api_keys": tuple(api_keys), "flaky": flaky},
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    )


class RenderSession:
    """Headless-browser fetch ACTOR (S12): per-actor browser-handle state
    with render wait/timeout config — the semantics of the reference's
    Splash path, ``SplashRequest(args={'wait': 10, 'timeout': 90,
    'images_enabled': False})`` (``Borges/spiders/RSC/metadata.py:36-39``)
    behind the splash middleware stack (``Borges/settings.py:93-104``).

    Deterministic stub: the "browser" is a per-actor handle (opened in
    ``__init__``, recycled every ``pages_per_handle`` renders — real
    headless browsers leak and get restarted) and a page's virtual render
    time is a stable function of its url bounded by ``render_wait_ms``
    (Splash waits ``wait`` seconds for the page to settle).  A render time
    at or past ``timeout_ms`` returns status 504 with no html — with the
    reference's default 10 s wait vs 90 s timeout that branch never fires,
    so crawled rows are byte-identical to :func:`fetch_selected` (the
    parity contract the conformance test asserts) plus ``render_ms`` and
    ``handle_gen`` bookkeeping columns.
    """

    def __init__(self, pages_root: str, num_buckets: int,
                 render_wait_ms: int = 10_000, timeout_ms: int = 90_000,
                 pages_per_handle: int = 64, flaky: bool = False,
                 images_enabled: bool = False,
                 resource_timeout_ms: int = 90_000):
        self.pages_root = pages_root
        self.num_buckets = num_buckets
        self.render_wait_ms = render_wait_ms
        self.timeout_ms = timeout_ms
        self.pages_per_handle = pages_per_handle
        self.flaky = flaky
        self.images_enabled = images_enabled
        # Splash's resource_timeout (settings.py middleware surface): a
        # SUB-resource slower than this is aborted but the page itself
        # still renders (partial) — unlike timeout_ms, it never 504s.
        self.resource_timeout_ms = resource_timeout_ms
        self.handle_gen = 0
        self.pages_rendered = 0
        self._open_handle()

    def _open_handle(self) -> None:
        """(Re)start the browser handle — once per actor init and after
        every ``pages_per_handle`` renders."""
        self.handle_gen += 1
        self.handle_token = stable_hash(f"browser:{self.handle_gen}")
        self.pages_rendered = 0

    def render_ms_of(self, url: str) -> int:
        """Virtual settle time for this page, bounded by the configured
        wait (images-off renders settle in half the budget)."""
        budget = self.render_wait_ms if self.images_enabled else self.render_wait_ms // 2
        return stable_hash("render:" + url) % max(budget, 1)

    def resources_skipped_of(self, url: str) -> int:
        """How many of the page's sub-resources (a stable 0-7 per url)
        exceed ``resource_timeout_ms`` and get aborted mid-render.  Each
        resource's virtual load time is a stable hash in [0, 30 s); at
        the reference default (90 s) nothing ever skips, preserving the
        byte-parity contract with the plain fetch path."""
        n_res = stable_hash("nres:" + url) % 8
        return sum(
            1 for i in range(n_res)
            if stable_hash(f"res:{url}:{i}") % 30_000 >= self.resource_timeout_ms)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_parts = []
        tmp = df.copy()
        tmp[BUCKET_COL] = bucket_of_urls(tmp["url"], self.num_buckets)
        for b, g in tmp.groupby(BUCKET_COL, sort=False):
            path = os.path.join(self.pages_root, f"{BUCKET_COL}={int(b)}")
            urls = g["url"].tolist()
            if os.path.isdir(path):
                dset = pads.dataset(path, format="parquet")
                hit = dset.to_table(columns=["url", "html"],
                                    filter=pc.field("url").isin(urls))
                hits = dict(zip(hit["url"].to_pylist(), hit["html"].to_pylist()))
            else:
                hits = {}
            o = g.drop(columns=[BUCKET_COL]).copy()
            statuses, attempts, render_ms, handle_gens, res_skipped = \
                [], [], [], [], []
            for u in urls:
                s = 200 if u in hits else 404
                a = 1
                if self.flaky:
                    s, a = apply_flaky(u, s)
                r = 0
                skipped = 0
                if s == 200:
                    r = self.render_ms_of(u)
                    skipped = self.resources_skipped_of(u)
                    if r >= self.timeout_ms:
                        s = 504  # render timeout: page dropped, html None
                    self.pages_rendered += 1
                    if self.pages_rendered >= self.pages_per_handle:
                        self._open_handle()
                statuses.append(s)
                attempts.append(a)
                render_ms.append(r)
                handle_gens.append(self.handle_gen)
                res_skipped.append(skipped)
            o["attempts"] = attempts
            o["html"] = [hits.get(u) if s == 200 else None
                         for u, s in zip(urls, statuses)]
            o["status"] = statuses
            o["render_ms"] = pd.Series(render_ms, index=o.index, dtype="int64")
            o["handle_gen"] = pd.Series(handle_gens, index=o.index, dtype="int32")
            o["resources_skipped"] = pd.Series(res_skipped, index=o.index,
                                               dtype="int32")
            out_parts.append(o)
        if not out_parts:
            out = df.copy()
            for c, d in (("attempts", "int64"), ("status", "int64"),
                         ("render_ms", "int64"), ("handle_gen", "int32"),
                         ("resources_skipped", "int32")):
                out[c] = pd.Series(dtype=d)
            out["html"] = pd.Series(dtype=object)
            return out
        return pd.concat(out_parts, ignore_index=True)


def fetch_selected_render(selected: rd.Dataset, pages_root: str,
                          num_buckets: int, *, render_wait_ms: int = 10_000,
                          timeout_ms: int = 90_000,
                          resource_timeout_ms: int = 90_000,
                          flaky: bool = False,
                          concurrency=(1, 4)) -> rd.Dataset:
    """Browser-render fetch path (S12): same rows as :func:`fetch_selected`
    plus ``render_ms``/``handle_gen``, with per-actor browser-handle state.
    Render work is the expensive stage in a real deployment — the actor
    pool bounds concurrent browser handles per node."""
    return selected.map_batches(
        RenderSession,
        fn_constructor_kwargs={"pages_root": pages_root,
                               "num_buckets": num_buckets,
                               "render_wait_ms": render_wait_ms,
                               "timeout_ms": timeout_ms,
                               "resource_timeout_ms": resource_timeout_ms,
                               "flaky": flaky},
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Pluggable fetcher seam (the "real HTTP" deployment path)
# ---------------------------------------------------------------------------
#
# The engine selects its fetch stage through ``EngineConfig.fetcher`` — any
# callable ``(selected: rd.Dataset, cfg, rnd: int) -> rd.Dataset`` whose
# output carries the fetch contract columns ``status`` (int), ``attempts``
# (int) and ``html`` (string, null on non-200) alongside the selection's
# passthrough columns.  The in-corpus probe (:func:`fetch_selected`) is the
# default implementation; :class:`HttpFetchSession` below is the actor-pool
# HTTP skeleton a real deployment would select (reference:
# ``Borges/spiders/Elsevier/paper_xml.py:73-76``,
# ``AIP/aip_spider.py:16-64`` — session bootstrap + per-request GETs).

FETCH_CONTRACT_COLS = ("status", "attempts", "html")


class HttpFetchSession:
    """Actor-pool HTTP fetch SKELETON (T1/T2 deployment seam).

    One actor = one HTTP session: the session/opener is built ONCE in
    ``__init__`` (the login-bootstrap point — cookies, bearer tokens, the
    reference's ``aip_spider.py:16-64`` POST) and every batch row is
    fetched through it, paced by a per-host token bucket.

    No network exists in this sandbox, so the transport is INJECTED: pass
    ``transport(url) -> (status, body)``.  With ``transport=None`` the
    actor builds a stdlib ``urllib`` opener and performs real GETs — the
    production path, exercised here only at the interface level (pytest
    injects a deterministic transport and asserts pacing + contract).

    Pacing: ``min_interval_ms`` per host on a virtual clock.  Each row's
    scheduled time is ``max(now, next_allowed[host])``; with
    ``sleep=True`` the actor really waits (deployment), with ``False`` it
    only records the schedule in ``sched_ms`` (tests assert the per-host
    gaps without wall-clock cost).  Selection order within a batch is
    preserved — politeness already interleaves hosts upstream, so the
    bucket rarely actually blocks.
    """

    def __init__(self, transport=None, *, min_interval_ms: int = 1000,
                 max_attempts: int = MAX_FETCH_ATTEMPTS,
                 timeout_s: float = 30.0, sleep: bool = False,
                 headers: tuple = ()):
        if transport is None:
            import urllib.request
            opener = urllib.request.build_opener()
            opener.addheaders = list(headers) or opener.addheaders

            def transport(url: str) -> tuple[int, str | None]:
                try:
                    with opener.open(url, timeout=timeout_s) as r:
                        return r.status, r.read().decode("utf-8", "replace")
                except Exception:
                    return 599, None

        self.transport = transport
        self.min_interval_ms = int(min_interval_ms)
        self.max_attempts = int(max_attempts)
        self.sleep = bool(sleep)
        self.next_allowed: dict[str, float] = {}
        self.clock_ms = 0.0

    def _schedule(self, host: str) -> float:
        """Reserve the host's next slot.  With ``sleep=False`` time is a
        VIRTUAL clock that only advances to reserved slots (tests read
        the schedule); with ``sleep=True`` the clock is the real
        monotonic clock and the caller sleeps until the reserved slot —
        per HOST, so an interleaved selection of K hosts proceeds at
        ~K requests per interval, and an idle host never waits."""
        import time as _time

        now = (_time.monotonic() * 1000.0 if self.sleep else self.clock_ms)
        t = max(now, self.next_allowed.get(host, 0.0))
        self.next_allowed[host] = t + self.min_interval_ms
        self.clock_ms = t
        return t

    def __call__(self, t: pa.Table) -> pa.Table:
        import time as _time

        urls = t["url"].to_pylist()
        hosts = (t["host"].to_pylist() if "host" in t.column_names
                 else [u.split("/")[2] if "//" in u else u for u in urls])
        statuses, attempts, htmls, sched = [], [], [], []
        for u, h in zip(urls, hosts):
            at = self._schedule(h)
            if self.sleep:
                wait = at - _time.monotonic() * 1000.0
                if wait > 0:
                    _time.sleep(wait / 1000.0)
            s, body, n = 0, None, 0
            for n in range(1, self.max_attempts + 1):
                s, body = self.transport(u)
                if s == 200 or s == 404:
                    break
            statuses.append(int(s))
            attempts.append(int(n))
            if s == 200 and body is not None:
                # html is BINARY engine-wide (the corpus column type)
                htmls.append(body.encode("utf-8") if isinstance(body, str)
                             else bytes(body))
            else:
                htmls.append(None)
            sched.append(at)
        return (t.append_column("attempts", pa.array(attempts, pa.int64()))
                .append_column("html", pa.array(htmls, pa.binary()))
                .append_column("status", pa.array(statuses, pa.int64()))
                .append_column("sched_ms", pa.array(sched, pa.float64())))


def fetch_selected_http(selected: rd.Dataset, *, transport=None,
                        min_interval_ms: int = 1000, sleep: bool = False,
                        concurrency=(1, 4)) -> rd.Dataset:
    """HTTP-skeleton fetch path behind the same seam as
    :func:`fetch_selected` — an actor pool of :class:`HttpFetchSession`.
    The ``sched_ms`` bookkeeping column is dropped so downstream sees the
    standard fetch contract."""
    return selected.map_batches(
        HttpFetchSession,
        fn_constructor_kwargs={"transport": transport,
                               "min_interval_ms": min_interval_ms,
                               "sleep": sleep},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).drop_columns(["sched_ms"])
