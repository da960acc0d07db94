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
    max_candidates_hint: int = 1 << 30,
) -> rd.Dataset:
    """→ selected rows with ``host_seq`` assigned (deterministic)."""
    offsets_ref = ray.put(host_offsets)

    class Combine:
        def __init__(self):
            self.budgets = ray.get(budgets_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            default = self.budgets["__default__"]
            df = df.sort_values(ORDER_COLS, ascending=ORDER_ASC, kind="mergesort")
            ranks = df.groupby("host", sort=False).cumcount()
            budget = df["host"].map(lambda h: self.budgets.get(h, default))
            return df[ranks < budget]

    candidates = frontier.map_batches(Combine, batch_format="pandas", concurrency=(1, 8))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        budgets = ray.get(budgets_ref)
        offsets = ray.get(offsets_ref)
        host = df["host"].iloc[0]
        budget = budgets.get(host, budgets["__default__"])
        df = df.sort_values(ORDER_COLS, ascending=ORDER_ASC, kind="mergesort").head(budget)
        base = offsets.get(host, 0)
        df = df.copy()
        df["host_seq"] = base + pd.RangeIndex(len(df))
        return df

    return candidates.groupby("host").map_groups(final, batch_format="pandas")


def defer_frontier(frontier: rd.Dataset, selected_urls: set[str]) -> rd.Dataset:
    """Frontier rows NOT selected this round (streamed scan, broadcast set)."""
    ref = ray.put(selected_urls)

    class Defer:
        def __init__(self):
            self.sel = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df[~df["url"].isin(self.sel)]

    return frontier.map_batches(Defer, batch_format="pandas", concurrency=(1, 8))
