"""Deterministic synthetic-web generator (pages / seeds / robots tables).

Plays the role of the live web the reference's spiders hit.  Everything is
derived from ``(seed, n_pages)`` — row-for-row reproducible, no wall clock,
no external data (FIXTURES.md §1-3).

Design choices mirroring the reference:

- **Zipf-distributed hosts**: a few hosts dominate the page count, mirroring
  the one journal (JPDAP) the reference had to hand-split into 120 files
  (``Borges/spiders/IOP/scripts/download_via_sftp.py:128-136``) — the skew
  fixture for salted repartitioning.
- **Outlink mix** exercising canonicalization (M1): relative / absolute /
  uppercase-host / default-port / fragment / unsorted-query / duplicate
  links, plus excluded-type (F2), nofollow, dead (404-path, F5) and
  robots-disallowed links.
- **Golden columns**: ``text`` is exactly ``extract_text(html)`` and ``lang``
  exactly ``tag_lang(text)`` — the generator asserts both, so the per-row
  byte-identical invariant is checkable against the table itself.

Generation is per-page-index deterministic (an rng seeded by
``(seed, page_index)``), so any index range can be generated independently —
that is what lets :func:`synth_pages_dataset` build the big bench corpus in
parallel with Ray without any cross-task coordination.
"""

from __future__ import annotations

import html as _htmlmod

import numpy as np
import pyarrow as pa

from .canonical import stable_hash
from .extract import COPYRIGHT_SENTINEL, extract_text, tag_lang_batch

BASE_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_VOCAB = (
    "crystal oxide phase lattice anode cathode electrolyte polymer alloy "
    "spectrum thermal doping bandgap catalyst membrane synthesis annealing "
    "diffraction microscopy voltage capacity cycling stability interface "
    "nanowire perovskite ceramic sintering grain defect vacancy dopant "
    "conductivity impedance electrode separator binder cell stack module"
).split()

_CJK_CHARS = [chr(c) for c in range(0x4E00, 0x4E00 + 64)]

USER_AGENT = "CederGroup@berkeley-TDMCrawler"  # Borges/settings.py:20


def _host_counts(seed: int, n_pages: int) -> list[int]:
    """Zipf split of ``n_pages`` across hosts (host 0 is the hot host)."""
    n_hosts = max(3, int(round(n_pages**0.45)))
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    w = 1.0 / ranks
    w /= w.sum()
    counts = np.floor(w * n_pages).astype(np.int64)
    counts[0] += n_pages - counts.sum()
    return [int(c) for c in counts if c > 0]


class WebPlan:
    """O(hosts) summary of the synthetic web; cheap to rebuild anywhere.

    ``words_lo``/``words_hi`` size the page bodies: tests use the small
    default; the bench corpus uses Common-Crawl-ish page sizes (hundreds of
    words) so fetched+parsed throughput is measured on realistic payloads.
    """

    def __init__(self, seed: int, n_pages: int, words_lo: int = 20, words_hi: int = 80):
        self.seed = seed
        self.n_pages = n_pages
        self.words_lo = words_lo
        self.words_hi = words_hi
        self.counts = _host_counts(seed, n_pages)
        self.hosts = [f"host-{h}.example" for h in range(len(self.counts))]
        starts = np.zeros(len(self.counts) + 1, dtype=np.int64)
        np.cumsum(self.counts, out=starts[1:])
        self.starts = starts  # global page index range per host
        rng = np.random.default_rng(seed)
        self.delay_ms = [int(rng.choice([250, 500, 1000, 2000])) for _ in self.hosts]
        # every third host disallows /private/ (FIXTURES.md §3)
        self.disallow = [["/private/"] if h % 3 == 0 else [] for h in range(len(self.hosts))]

    def host_of_index(self, idx: int) -> tuple[int, int]:
        h = int(np.searchsorted(self.starts, idx, side="right") - 1)
        return h, idx - int(self.starts[h])

    def url_of(self, host_idx: int, local_idx: int) -> str:
        host = self.hosts[host_idx]
        n = self.counts[host_idx]
        # a sliver of special paths per host: one query-string page, and
        # /private/ pages on disallowing hosts
        if local_idx == n - 1 and n >= 4:
            return f"http://{host}/q?a=1&b=2"
        if self.disallow[host_idx] and n >= 8 and n - 4 <= local_idx < n - 1:
            return f"http://{host}/private/{local_idx}"
        return f"http://{host}/p/{local_idx}"


def _page_row(plan: WebPlan, idx: int) -> dict:
    h, li = plan.host_of_index(idx)
    host = plan.hosts[h]
    n_local = plan.counts[h]
    url = plan.url_of(h, li)
    rng = np.random.default_rng((plan.seed, 7919, idx))

    # ---- golden text ----------------------------------------------------
    n_words = int(rng.integers(plan.words_lo, plan.words_hi))
    words = [(_VOCAB[int(i)]) for i in rng.integers(0, len(_VOCAB), n_words)]
    kind = int(rng.integers(0, 10))
    if kind == 0:  # cjk page
        words = ["".join(_CJK_CHARS[int(i)] for i in rng.integers(0, 64, 4)) for _ in range(n_words)]
    elif kind == 1:  # mixed page
        for j in range(0, n_words, 4):
            words[j] = "".join(_CJK_CHARS[int(i)] for i in rng.integers(0, 64, 3))
    text = " ".join(words) + " & co."  # entity round-trip exercised on every page

    # ---- body html (escape + inline markup that extract_text removes) ---
    esc = _htmlmod.escape(text)
    mid = len(esc) // 2
    sp = esc.find(" ", mid)
    if sp > 0:
        esc = esc[:sp] + " <b>" + esc[sp + 1 :] + "</b>"
    body = esc
    if int(rng.integers(0, 4)) == 0:  # copyright sentinel stripped on extract (M12)
        body += _htmlmod.escape(COPYRIGHT_SENTINEL)
    if int(rng.integers(0, 5)) == 0:  # nested div inside content (balanced scan)
        body = '<div class="sec">' + body + "</div>"

    # ---- outlinks (the crawl graph) -------------------------------------
    anchors: list[str] = []

    def tgt(host_i: int, local: int) -> str:
        return plan.url_of(host_i, local % max(1, plan.counts[host_i]))

    n_links = int(rng.integers(2, 7))
    for k in range(n_links):
        style = int(rng.integers(0, 8))
        j = int(rng.integers(0, n_local)) if n_local else 0
        if style <= 2:  # same-host absolute-path link
            href = f"/p/{j}" if plan.url_of(h, j).endswith(f"/p/{j}") else plan.url_of(h, j)[len(f"http://{host}"):]
        elif style == 3:  # cross-host absolute
            oh = int(rng.integers(0, len(plan.hosts)))
            href = tgt(oh, int(rng.integers(0, 10**6)))
        elif style == 4:  # uppercase host + default port (canonicalization)
            oh = int(rng.integers(0, len(plan.hosts)))
            t = tgt(oh, int(rng.integers(0, 10**6)))
            href = t.replace("http://", "HTTP://").replace(".example/", ".EXAMPLE:80/", 1)
        elif style == 5:  # fragment variant of a same-host page
            href = f"/p/{j}#sec{k}"
        elif style == 6:  # relative ../ form
            href = f"../p/{j}"
        else:  # dead link (404 path)
            href = f"/missing/{int(rng.integers(0, 10**6))}"
        anchors.append(f'<a href="{href}" class="article">x</a>')
        if style == 0:  # duplicate link (dupefilter exercise)
            anchors.append(f'<a href="{href}" class="article">x</a>')
    # unsorted-query link to this host's query page, if it has one
    if plan.counts[h] >= 4:
        anchors.append(f'<a href="/q?b=2&a=1" class="article">q</a>')
    # excluded-type + nofollow links (must NOT expand — F2)
    anchors.append(f'<a href="/p/{li}" class="cover">cover</a>')
    anchors.append(f'<a href="/missing/nf" class="article" rel="nofollow">nf</a>')
    if plan.disallow[h] and n_local >= 8:
        anchors.append(f'<a href="/private/{n_local - 3}" class="article">p</a>')

    html_doc = (
        f"<html><head><title>page {idx}</title></head><body>"
        f'<div id="maincontent">{body}</div>'
        f'<div id="nav">{"".join(anchors)}</div>'
        f"</body></html>"
    ).encode("utf-8")

    warc_ts = BASE_EPOCH_US + (stable_hash(url) % 31_536_000) * 1_000_000
    return {"url": url, "warc_ts": warc_ts, "html": html_doc, "text": text}


def synth_pages_range(seed: int, n_pages: int, lo: int, hi: int,
                      verify: bool = False, words_lo: int = 20,
                      words_hi: int = 80) -> pa.Table:
    """Generate pages for global indices ``[lo, hi)`` as one Arrow table."""
    plan = WebPlan(seed, n_pages, words_lo, words_hi)
    rows = [_page_row(plan, i) for i in range(lo, min(hi, plan.starts[-1]))]
    if verify:
        for r in rows:
            assert extract_text(r["html"]) == r["text"], r["url"]
    texts = [r["text"] for r in rows]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(tag_lang_batch(texts), pa.string()),
        }
    )


def synth_pages(seed: int, n_pages: int, verify: bool = False,
                words_lo: int = 20, words_hi: int = 80) -> pa.Table:
    return synth_pages_range(seed, n_pages, 0, n_pages, verify=verify,
                             words_lo=words_lo, words_hi=words_hi)


def synth_seeds(seed: int, n_pages: int) -> pa.Table:
    """Crawl roots: page 0 of each of the top hosts + two dead URLs
    (mirrors ``start_urls.yaml`` + dead-path 404 handling)."""
    plan = WebPlan(seed, n_pages)
    n_seed_hosts = max(1, len(plan.hosts) // 3)
    urls = [plan.url_of(h, 0) for h in range(n_seed_hosts)]
    urls += [f"http://{plan.hosts[0]}/missing/seed-dead", "http://never-seen.example/"]
    prios = list(range(len(urls), 0, -1))
    ts = [BASE_EPOCH_US] * len(urls)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "priority": pa.array(prios, pa.int32()),
                     "seed_ts": pa.array(ts, pa.timestamp("us"))})


def synth_robots(seed: int, n_pages: int, allow_all: bool = False) -> pa.Table:
    """Per-host policy table; ``allow_all=True`` reproduces the reference's
    ``ROBOTSTXT_OBEY = False`` (``Borges/settings.py:23``) with a uniform
    1000 ms delay (= ``DOWNLOAD_DELAY = 1``, ``Borges/settings.py:31``)."""
    plan = WebPlan(seed, n_pages)
    if allow_all:
        dis: list[list[str]] = [[] for _ in plan.hosts]
        delay = [1000] * len(plan.hosts)
    else:
        dis = plan.disallow
        delay = plan.delay_ms
    return pa.table({
        "host": pa.array(plan.hosts, pa.string()),
        "disallow_prefixes": pa.array(dis, pa.list_(pa.string())),
        # RFC 9309 Allow carve-outs: none in the standard web (the gate
        # reduces to plain prefix blocking); conformance tests inject
        # carve-outs by overriding this column
        "allow_prefixes": pa.array([[] for _ in plan.hosts],
                                   pa.list_(pa.string())),
        "crawl_delay_ms": pa.array(delay, pa.int64()),
        "user_agent": pa.array([USER_AGENT] * len(plan.hosts), pa.string()),
    })


def synth_pages_dataset(seed: int, n_pages: int, chunk: int = 20_000,
                        words_lo: int = 20, words_hi: int = 80):
    """Parallel generation as a Ray Dataset (for the bench corpus): each task
    generates an independent index range — no coordination, no shared state."""
    import ray.data as rd

    n_chunks = max(1, (n_pages + chunk - 1) // chunk)
    ds = rd.range(n_chunks)

    def gen(batch):
        tables = [synth_pages_range(seed, n_pages, int(i) * chunk, (int(i) + 1) * chunk,
                                    words_lo=words_lo, words_hi=words_hi)
                  for i in batch["id"]]
        return pa.concat_tables(tables)

    return ds.map_batches(gen, batch_size=1, batch_format="pandas")
