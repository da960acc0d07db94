"""Single-process oracle crawler embodying the reference's semantics.

This is the executable specification the Ray engine must match (FIXTURES.md
§4): plain Python dicts — no Ray, no Arrow — implementing Borges' crawl
semantics directly:

- **Insert-if-absent dedup at enqueue** (``Borges/db_scripts/insert_jl.py:28-41``,
  Scrapy dupefilter ``Borges/settings.py:103``): the URL-seen set is "URLs
  ever enqueued", seeds included.
- **Per-host politeness clock** (``DOWNLOAD_DELAY = 1`` at
  ``Borges/settings.py:31`` generalized to per-host ``crawl_delay_ms``):
  Scrapy's delay is CONTINUOUS wall time (per-slot ``next_request_time``),
  so each host carries a virtual clock across rounds.  Round ``r`` spans
  virtual time ``[r·round_ms, (r+1)·round_ms)``; the host fetches at
  ``t = max(clock, r·round_ms), t+delay, …`` while ``t`` is inside the
  round, then the clock advances past its last fetch — a host with
  ``delay = 1.7×round_ms`` fetches in rounds 0, 1, 3, 5, … (~0.59/round),
  not once per round as a truncated integer budget would.
- **Deterministic per-host order** (§2.10: per-shard sequential, cross-shard
  free): within a host, selection order is (priority desc, discovered_round
  asc, url asc); ``host_seq`` numbers the host's fetches across rounds.
- **Robots gate at enqueue** (the surface of ``ROBOTSTXT_OBEY``,
  ``Borges/settings.py:23``): a disallowed URL is recorded with status 999
  and never fetched; an allow-all robots table reproduces the reference's
  robots-off behaviour.
- **Fetch = lookup in the pages table** (SURVEY.md §2.5): a miss is a 404.
- **Extraction**: THE same pure kernels (`borges_ray.extract`) as the
  distributed engine — the byte-identical contract.

Crawl-round algorithm (shared spec, engine mirrors it exactly):

round i:
  1. per host: budget = fetch slots of the host's virtual clock within
     this round's window (``ceil((round_end - max(clock, round_start)) /
     delay)``, floored at 0); select top ``budget`` frontier rows by
     (priority desc, discovered_round asc, url asc); assign ``host_seq``
     and advance the clock by ``delay`` per selected row.
  2. fetch selected against pages; status 200/404.
  3. parse 200s: extract text/lang/links; canonicalize links against the
     page URL; children carry depth+1, priority = max(0, parent-1),
     discovered_round = i+1.
  4. dedup new links within the round (winner = max priority, min depth,
     min parent_url — order-free), then against the seen set; robots-check
     survivors: blocked → status-999 record; allowed → frontier.
  5. leftover (unselected) frontier + new links form round i+1's frontier.
Stop when the frontier is empty or ``max_rounds`` reached.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from borges_ray.canonical import canonicalize, host_of, partition_of
from borges_ray.extract import extract_links, extract_text, tag_lang_batch
from borges_ray.stages.fetch import apply_flaky
from borges_ray.stages.politeness import host_active


@dataclass
class CrawlConfig:
    round_ms: int = 10_000
    default_delay_ms: int = 1000
    max_rounds: int = 50
    max_depth: int | None = None
    num_partitions: int = 16
    flaky: bool = False          # T6 deterministic retry model (shared kernel)
    night_shift: bool = False    # F9 time-of-day host gating (shared kernel)


@dataclass
class CrawlResult:
    crawled: list[dict] = field(default_factory=list)   # CRAWLED schema rows
    seen: list[dict] = field(default_factory=list)      # SEEN schema rows
    metrics: list[dict] = field(default_factory=list)   # per (round, partition)


def _robots_blocked(url: str, host: str, robots: dict[str, dict]) -> bool:
    """RFC 9309 longest-match: the longest matching rule wins; an Allow
    rule wins length ties; no matching rule -> not blocked.  Policies
    without an allow_prefixes key behave as before (disallow-only)."""
    pol = robots.get(host)
    if pol is None:
        return False
    path = url.split(host, 1)[1] if host in url else "/"
    dis = pol["disallow_prefixes"]
    alw = pol.get("allow_prefixes") or ()
    best_dis = max((len(p) for p in dis if path.startswith(p)), default=-1)
    if best_dis < 0:
        return False
    best_alw = max((len(p) for p in alw if path.startswith(p)), default=-1)
    return best_alw < best_dis


def _delay_ms(host: str, robots: dict[str, dict], cfg: CrawlConfig) -> int:
    pol = robots.get(host)
    return pol["crawl_delay_ms"] if pol else cfg.default_delay_ms


def crawl(
    pages: dict[str, bytes],
    seeds: list[tuple[str, int]],
    robots: dict[str, dict],
    cfg: CrawlConfig = CrawlConfig(),
) -> CrawlResult:
    """pages: canonical url → html bytes; seeds: (url, priority);
    robots: host → {disallow_prefixes, crawl_delay_ms}."""
    res = CrawlResult()
    seen: set[str] = set()
    frontier: dict[str, dict] = {}  # canonical url -> frontier row
    host_seq: dict[str, int] = {}
    next_allowed: dict[str, int] = {}  # host -> virtual clock (ms)

    def enqueue(cands: list[dict], rnd: int) -> tuple[int, int]:
        """Dedup vs seen + robots gate; returns (n_new, n_blocked)."""
        new = blocked = 0
        for c in cands:
            u = c["url"]
            if u in seen:
                continue
            if cfg.max_depth is not None and c["depth"] > cfg.max_depth:
                continue
            seen.add(u)
            res.seen.append({"url": u, "partition": partition_of(u, cfg.num_partitions),
                             "seen_round": rnd})
            if _robots_blocked(u, c["host"], robots):
                blocked += 1
                res.crawled.append({
                    "url": u, "host": c["host"], "depth": c["depth"],
                    "fetch_round": rnd, "host_seq": -1, "status": 999,
                    "attempts": 0, "extracted_text": "", "lang": "", "n_links": 0,
                })
                continue
            new += 1
            frontier[u] = c
        return new, blocked

    # round 0 enqueue: seeds (canonicalized, dedup'd like any candidate)
    seed_cands = []
    for url, prio in seeds:
        cu = canonicalize(url)
        if cu is None:
            continue
        seed_cands.append({"url": cu, "host": host_of(cu), "depth": 0,
                           "priority": prio, "discovered_round": 0, "parent_url": ""})
    enqueue(seed_cands, 0)

    for rnd in range(cfg.max_rounds):
        if not frontier:
            break
        # 1. politeness selection per host
        by_host: dict[str, list[dict]] = {}
        for row in frontier.values():
            by_host.setdefault(row["host"], []).append(row)
        selected: list[dict] = []
        for host, rows in by_host.items():
            if not host_active(host, rnd, cfg.night_shift):
                continue
            delay = _delay_ms(host, robots, cfg)
            start = max(next_allowed.get(host, 0), rnd * cfg.round_ms)
            end = (rnd + 1) * cfg.round_ms
            budget = max(0, -((start - end) // delay))  # ceil((end-start)/delay)
            rows.sort(key=lambda r: (-r["priority"], r["discovered_round"], r["url"]))
            take = rows[:budget]
            for r in take:
                seq = host_seq.get(host, 0)
                host_seq[host] = seq + 1
                selected.append({**r, "host_seq": seq})
            if take:
                next_allowed[host] = start + len(take) * delay
        for r in selected:
            del frontier[r["url"]]

        # 2-3. fetch + parse
        new_cands: list[dict] = []
        fetched = missed = links_emitted = 0
        texts_for_lang: list[str] = []
        crawled_rows: list[dict] = []
        for r in selected:
            html = pages.get(r["url"])
            status = 200 if html is not None else 404
            attempts = 1
            if cfg.flaky:
                status, attempts = apply_flaky(r["url"], status)
            if status != 200:
                missed += 1
                crawled_rows.append({**{k: r[k] for k in ("url", "host", "depth", "host_seq")},
                                     "fetch_round": rnd, "status": status,
                                     "attempts": attempts,
                                     "extracted_text": "", "lang": "", "n_links": 0})
                texts_for_lang.append("")
                continue
            fetched += 1
            text = extract_text(html)
            links = extract_links(html)
            child_rows = 0
            for href, _cls in links:
                cu = canonicalize(href, base=r["url"])
                if cu is None:
                    continue
                child_rows += 1
                new_cands.append({
                    "url": cu, "host": host_of(cu), "depth": r["depth"] + 1,
                    "priority": max(0, r["priority"] - 1),
                    "discovered_round": rnd + 1, "parent_url": r["url"],
                })
            links_emitted += child_rows
            crawled_rows.append({**{k: r[k] for k in ("url", "host", "depth", "host_seq")},
                                 "fetch_round": rnd, "status": 200,
                                 "attempts": attempts,
                                 "extracted_text": text, "lang": None,
                                 "n_links": child_rows})
            texts_for_lang.append(text)
        langs = tag_lang_batch(texts_for_lang)
        for row, lang in zip(crawled_rows, langs):
            row["lang"] = lang if row["status"] == 200 else ""
        res.crawled.extend(crawled_rows)

        # 4. within-round winner dedup (order-free deterministic)
        best: dict[str, dict] = {}
        for c in new_cands:
            cur = best.get(c["url"])
            key = (-c["priority"], c["depth"], c["parent_url"])
            if cur is None or key < (-cur["priority"], cur["depth"], cur["parent_url"]):
                best[c["url"]] = c
        n_new, n_blocked = enqueue(sorted(best.values(), key=lambda c: c["url"]), rnd + 1)

        res.metrics.append({
            "round": rnd, "partition": -1, "frontier_size": len(frontier) + len(selected),
            "selected": len(selected), "fetched": fetched, "missed": missed,
            "blocked": n_blocked, "links_emitted": links_emitted, "links_new": n_new,
        })
    return res
