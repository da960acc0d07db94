"""robots.txt parsing — raw policy text → the engine's structured policy
table (RFC 9309-lite).

The reference disables robots handling outright (``ROBOTSTXT_OBEY = False``,
``Borges/settings.py:23``) and the engine's crawl loop consumes an
already-structured per-host policy table (``synth.synth_robots``).  This
stage closes the gap between raw crawled ``/robots.txt`` bodies and that
table, so a real deployment can feed fetched policy text straight into the
seen/robots gate.

Supported subset (documented, deterministic):

- ``User-agent`` groups: consecutive UA lines share the rule group that
  follows; a UA line after rules starts a new group.
- Group selection: a group naming OUR agent exactly (case-insensitive)
  beats ``*``; no matching group → allow all.
- ``Disallow`` / ``Allow``: empty value = ignored; non-empty values are
  path prefixes (no wildcard expansion).  Per-path precedence is RFC
  9309 §2.2.2 longest-match-wins with Allow winning length ties
  (:func:`robots_allowed`); the crawl gate (``stages/links.py``)
  consumes the disallow side with an empty allow list, where the rule
  reduces to plain prefix blocking.
- ``Crawl-delay``: seconds (int or float) → ms; absent → ``default_delay_ms``.
- Comments (``#`` to end of line), unknown directives, and blank lines are
  ignored (blank lines do NOT end a group — grouping is UA-line driven).

Pure per-row parsing — no shuffle; runs as a vectorized-batch map stage.
"""

from __future__ import annotations

import re

import pandas as pd
import ray.data as rd

DEFAULT_DELAY_MS = 1000


def parse_robots_text(text: str, user_agent: str,
                      default_delay_ms: int = DEFAULT_DELAY_MS,
                      ) -> tuple[list[str], list[str], int]:
    """One robots.txt body → (sorted disallow prefixes, sorted allow
    prefixes, crawl_delay_ms) for ``user_agent``.  ``Allow`` (RFC 9309
    §2.2.2) carves exceptions out of disallowed subtrees; precedence is
    decided per-path by :func:`robots_allowed` (longest match wins,
    allow wins length ties).  An empty Allow value is ignored like an
    empty Disallow."""
    ua = user_agent.lower()
    # groups: list of (agents, disallows, allows, delay_ms or None)
    groups: list[tuple[list[str], list[str], list[str], int | None]] = []
    agents: list[str] = []
    rules: list[str] = []
    allows: list[str] = []
    delay: int | None = None
    in_rules = False

    def flush():
        nonlocal agents, rules, allows, delay, in_rules
        if agents:
            groups.append((agents, rules, allows, delay))
        agents, rules, allows, delay, in_rules = [], [], [], None, False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            agents.append(val.lower())
        elif key == "disallow":
            in_rules = True
            if val:
                rules.append(val)
        elif key == "allow":
            in_rules = True
            if val:
                allows.append(val)
        elif key == "crawl-delay":
            in_rules = True
            try:
                delay = int(float(val) * 1000)
            except ValueError:
                pass
    flush()

    chosen = star = None
    for agents_, rules_, allows_, delay_ in groups:
        if ua in agents_ and chosen is None:
            chosen = (rules_, allows_, delay_)
        if "*" in agents_ and star is None:
            star = (rules_, allows_, delay_)
    pick = chosen if chosen is not None else star
    if pick is None:
        return [], [], default_delay_ms
    dis, alw, dly = pick
    return (sorted(set(dis)), sorted(set(alw)),
            dly if dly is not None else default_delay_ms)


_RULE_RE_CACHE: dict[str, "re.Pattern"] = {}


def _rule_matches(path: str, pattern: str) -> bool:
    """One robots rule against one path.  Plain patterns are prefix
    matches; ``*`` matches any char run and a trailing ``$`` anchors the
    end (RFC 9309 §2.2.3 special characters, the widely-deployed
    wildcard extension).  Compiled regexes are cached per pattern —
    robots tables are small and hot."""
    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    rx = _RULE_RE_CACHE.get(pattern)
    if rx is None:
        pat = pattern
        anchor_end = pat.endswith("$")
        if anchor_end:
            pat = pat[:-1]
        body = ".*".join(re.escape(part) for part in pat.split("*"))
        rx = _RULE_RE_CACHE[pattern] = re.compile(
            "^" + body + ("$" if anchor_end else ""))
    return rx.match(path) is not None


def robots_allowed(path: str, disallows: "list[str] | tuple",
                   allows: "list[str] | tuple" = ()) -> bool:
    """RFC 9309 §2.2.2 rule precedence for one path: among all matching
    rules, the LONGEST (most octets in the pattern) wins; on a length
    tie the Allow rule wins (least-restrictive, per the RFC's
    recommendation); no matching rule → allowed.  Rules may use the
    §2.2.3 special characters (``*`` wildcard, ``$`` end anchor); plain
    rules are prefix matches, so with ``allows`` empty and no wildcards
    this reduces to the any-disallow-prefix gate the crawl loop uses."""
    best_dis = max((len(p) for p in disallows if _rule_matches(path, p)),
                   default=-1)
    if best_dis < 0:
        return True
    best_alw = max((len(p) for p in allows if _rule_matches(path, p)),
                   default=-1)
    return best_alw >= best_dis


def parse_robots(ds: rd.Dataset, user_agent: str, *,
                 host_col: str = "host", text_col: str = "robots_txt",
                 default_delay_ms: int = DEFAULT_DELAY_MS) -> rd.Dataset:
    """(host, robots_txt) rows → the structured policy table the crawl
    gate consumes: (host, disallow_prefixes: list<string>,
    allow_prefixes: list<string>, crawl_delay_ms: int64)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        parsed = [parse_robots_text(t or "", user_agent, default_delay_ms)
                  for t in df[text_col]]
        return pd.DataFrame({
            host_col: df[host_col].to_numpy(),
            "disallow_prefixes": [p[0] for p in parsed],
            "allow_prefixes": [p[1] for p in parsed],
            "crawl_delay_ms": pd.Series([p[2] for p in parsed], dtype="int64"),
        })

    return ds.map_batches(fn, batch_format="pandas")


def robots_sitemaps(text: str) -> list[str]:
    """All ``Sitemap:`` directive values in a robots.txt body, in file
    order, deduplicated.  Per the sitemaps protocol the directive is
    GLOBAL — independent of User-agent groups — so this is a separate
    extractor from the per-agent rule selection above.  The value is an
    absolute URL taken verbatim (no canonicalization here; callers feed
    it through ``canonical.canonicalize`` like any discovered URL).
    Matching is case-insensitive on the key; comments are stripped the
    same way as the group parser."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            val = val.strip()
            if val and val not in seen:
                seen.add(val)
                out.append(val)
    return out
