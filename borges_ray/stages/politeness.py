"""Politeness selection: per-host crawl-delay budgets as a Ray Data stage.

The reference throttles per-domain with ``DOWNLOAD_DELAY = 1``
(``Borges/settings.py:31``) plus assorted per-site sleeps (SURVEY.md T4).
In BSP terms each round represents ``round_ms`` of virtual wall time, so a
host may fetch ``max(1, round_ms // crawl_delay_ms)`` URLs per round — the
token-bucket state reduced to a per-round budget.

Scale shape (SURVEY.md §7.2 step 4):

1. **Combiner pass** (``map_batches``, no shuffle): each block keeps only
   its per-host top-``budget`` rows ordered by (priority desc,
   discovered_round asc, url asc).  The subsequent shuffle therefore moves
   ≤ budget × blocks rows per host — never the whole frontier.
2. **Final select** (``groupby(host).map_groups``): merge the per-block
   candidates, take the global top-``budget`` per host, and assign
   ``host_seq`` continuing from the per-host counters (broadcast dict,
   ``ray.put`` once per round).
3. **Deferral** is a second streaming scan of the frontier filtering out
   the selected urls (broadcast set) — the big table is scanned, never
   shuffled.

Skew note: a hot host (the Zipf head / JPDAP fixture) is bounded by its
budget, so the map_groups group is at most candidates = budget × blocks
rows — politeness itself is the skew cap.  The frontier Parquet is
partitioned by ``hash(url)``, so no host monopolizes an input block.
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data as rd

ORDER_COLS = ["priority", "discovered_round", "url"]
ORDER_ASC = [False, True, True]


def host_active(host: str, rnd: int, night_shift: bool) -> bool:
    """Time-of-day gating (F9 — the reference's ECS spider only scrapes
    nights + weekends, ``Borges/spiders/ECS/paper_html.py:34-45``).  BSP
    re-expression: with ``night_shift`` on, every third host (stable hash)
    is only fetchable on even rounds.  Deterministic and shared with the
    oracle."""
    if not night_shift:
        return True
    from ..canonical import stable_hash

    return stable_hash("gate:" + host) % 3 != 0 or rnd % 2 == 0


def budgets_from_robots(robots_df: pd.DataFrame, round_ms: int, default_delay_ms: int) -> dict[str, int]:
    """host → per-round fetch budget."""
    out = {}
    for h, d in zip(robots_df["host"], robots_df["crawl_delay_ms"]):
        out[h] = max(1, round_ms // int(d))
    out["__default__"] = max(1, round_ms // default_delay_ms)
    return out


def select_frontier(
    frontier: rd.Dataset,
    budgets_ref: "ray.ObjectRef",
    host_offsets: dict[str, int],
    num_partitions: int = 16,
    rnd: int = 0,
    night_shift: bool = False,
) -> rd.Dataset:
    """→ selected rows with ``host_seq`` assigned (deterministic).

    Plain task functions, not actor pools: the broadcast state is an
    ``ObjectRef`` resolved per task from the local object store (zero-copy,
    microseconds after first access) — actor-pool startup latency would
    dominate the per-round cost for no amortization win.
    """
    offsets_ref = ray.put(host_offsets)

    def _prune(df: pd.DataFrame, budgets: dict, offsets: dict | None) -> pd.DataFrame:
        """Vectorized per-host top-budget: sort once, cumcount per host,
        keep ranks < budget.  With ``offsets`` also assigns host_seq."""
        default = budgets["__default__"]
        if night_shift:
            hosts = df["host"].unique()
            lut = {h: host_active(h, rnd, night_shift) for h in hosts}
            df = df[df["host"].map(lut)]
        df = df.sort_values(ORDER_COLS, ascending=ORDER_ASC, kind="mergesort")
        ranks = df.groupby("host", sort=False).cumcount()
        budget = df["host"].map(lambda h: budgets.get(h, default))
        out = df[ranks < budget]
        if offsets is not None:
            out = out.copy()
            kept_ranks = ranks[ranks < budget]
            base = out["host"].map(lambda h: offsets.get(h, 0))
            out["host_seq"] = (base + kept_ranks).astype("int64")
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return _prune(df, ray.get(budgets_ref), None)

    candidates = frontier.map_batches(combine, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per host-bucket group — never one call per host
        return _prune(df, ray.get(budgets_ref), ray.get(offsets_ref))

    # shuffle key: a hash bucket of host (all of one host's candidates
    # co-locate; hot hosts are already budget-bounded by the combiner)
    def add_hbucket(df: pd.DataFrame) -> pd.DataFrame:
        from ..canonical import stable_hash

        hosts = df["host"].unique()
        lut = {h: stable_hash(h) % num_partitions for h in hosts}
        out = df.copy()
        out["__hb"] = df["host"].map(lut)
        return out

    bucketed = candidates.map_batches(add_hbucket, batch_format="pandas")
    out = bucketed.groupby("__hb", num_partitions=min(num_partitions, 64)).map_groups(
        final, batch_format="pandas"
    )
    return out.drop_columns(["__hb"])


def defer_frontier(frontier: rd.Dataset, selected_urls: set[str]) -> rd.Dataset:
    """Frontier rows NOT selected this round (streamed scan, broadcast set)."""
    ref = ray.put(selected_urls)

    def defer(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df["url"].isin(ray.get(ref))]

    return frontier.map_batches(defer, batch_format="pandas")
