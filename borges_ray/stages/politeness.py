"""Politeness selection: per-host crawl-delay budgets as a Ray Data stage.

The reference throttles per-domain with ``DOWNLOAD_DELAY = 1``
(``Borges/settings.py:31``) plus assorted per-site sleeps (SURVEY.md T4).
The reference's delay is CONTINUOUS wall-clock — Scrapy's per-slot
``next_request_time`` carries across any bookkeeping boundary.  The BSP
re-expression keeps that continuity: each round represents ``round_ms`` of
virtual time, and every host carries a virtual clock ``next_allowed_ms``
in the host-state checkpoint.  In round ``r`` a host may fetch at times
``t = max(next_allowed_ms, r·round_ms), t+delay, t+2·delay, …`` while
``t < (r+1)·round_ms`` — so a host with ``delay = 1.7×round_ms`` fetches
in rounds 0, 1, 3, 5, … (~0.59/round average), not once every round as a
per-round integer budget would allow.  After ``k`` fetches the clock
advances to ``start + k·delay``, carrying the fractional remainder into
the next round.

Scale shape (SURVEY.md §7.2 step 4):

1. **Combiner pass** (``map_batches``, no shuffle): each block keeps only
   its per-host top-``budget`` rows ordered by (priority desc,
   discovered_round asc, url asc).  The subsequent shuffle therefore moves
   ≤ budget × blocks rows per host — never the whole frontier.
2. **Final select** (``groupby(host-bucket).map_groups``): merge the
   per-block candidates, take the global top-``budget`` per host, and
   assign ``host_seq`` continuing from the per-host counters — read from
   the hive-partitioned host-state checkpoint one ``hb=<b>/`` slice per
   group (never a driver-side dict over all hosts).
3. **Deferral** is a second streaming scan of the frontier subtracting the
   selected urls via per-``partition`` membership files — the big table is
   scanned, never shuffled, and no global set is broadcast.

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


def delays_from_robots(robots_df: pd.DataFrame, default_delay_ms: int) -> dict[str, int]:
    """host → crawl delay in virtual ms (``__default__`` for unlisted
    hosts).  Per-round budgets are DERIVED from these at selection time
    against each host's carried virtual clock — see :func:`select_frontier`."""
    out = {h: int(d) for h, d in
           zip(robots_df["host"], robots_df["crawl_delay_ms"])}
    out["__default__"] = int(default_delay_ms)
    return out


def load_host_offsets(host_state_dir: str, bucket: int | None = None) -> dict[str, tuple[int, int]]:
    """host → (next_seq, next_allowed_ms) from the hive-partitioned
    host-state checkpoint; with ``bucket`` set, reads ONLY that ``hb=<b>/``
    dir (the per-group slice — O(hosts in bucket), not O(all hosts ever
    seen)).  ``next_allowed_ms`` defaults to 0 for pre-carryover
    checkpoints (a clock in the past is a no-op under the max() rule)."""
    import os

    import pyarrow.parquet as pq

    path = (os.path.join(host_state_dir, f"hb={bucket}")
            if bucket is not None else host_state_dir)
    if not os.path.isdir(path):
        return {}
    files = [os.path.join(dp, f) for dp, _d, fs in os.walk(path)
             for f in fs if f.endswith(".parquet")]
    if not files:
        return {}
    out: dict[str, tuple[int, int]] = {}
    for f in files:
        t = pq.read_table(f)
        na = (t["next_allowed_ms"].to_pylist()
              if "next_allowed_ms" in t.column_names else [0] * t.num_rows)
        out.update(zip(t["host"].to_pylist(),
                       ((int(s), int(a)) for s, a in
                        zip(t["next_seq"].to_pylist(), na))))
    return out


def select_frontier(
    frontier: rd.Dataset,
    delays_ref: "ray.ObjectRef",
    host_state_dir: str,
    num_partitions: int = 16,
    rnd: int = 0,
    night_shift: bool = False,
    round_ms: int = 10_000,
) -> rd.Dataset:
    """→ selected rows with ``host_seq`` assigned (deterministic).

    Plain task functions, not actor pools: the broadcast state is an
    ``ObjectRef`` resolved per task from the local object store (zero-copy,
    microseconds after first access) — actor-pool startup latency would
    dominate the per-round cost for no amortization win.

    Host sequence counters AND per-host virtual clocks come from the
    hive-partitioned host-state checkpoint: the final per-host-bucket group
    reads ONLY its ``hb=<b>/`` slice — the r01 driver-side dict over every
    host ever seen is gone (O(total hosts) driver memory at 10^8-host
    scale).  The combiner pass (which runs before the shuffle and has no
    host-state slice) uses the clock-free UPPER BOUND ``ceil(round_ms /
    delay)`` per host; the final per-bucket pass applies the exact
    carryover rule, so the shuffle still moves ≤ bound × blocks rows per
    host and the selection is exact."""

    def _prune(df: pd.DataFrame, delays: dict, offsets: dict | None) -> pd.DataFrame:
        """Vectorized per-host top-budget: sort once, cumcount per host,
        keep ranks < budget.  Budget = fetch slots of the host's virtual
        clock within this round's [rnd·round_ms, (rnd+1)·round_ms) window
        (upper bound ceil(round_ms/delay) when no clock is available).
        With ``offsets`` also assigns host_seq."""
        default = delays["__default__"]
        if night_shift:
            hosts = df["host"].unique()
            lut = {h: host_active(h, rnd, night_shift) for h in hosts}
            df = df[df["host"].map(lut)]
        df = df.sort_values(ORDER_COLS, ascending=ORDER_ASC, kind="mergesort")
        ranks = df.groupby("host", sort=False).cumcount()
        delay = df["host"].map(lambda h: delays.get(h, default))
        end = (rnd + 1) * round_ms
        if offsets is None:
            budget = -(-round_ms // delay)           # ceil: clock-free bound
        else:
            clock = df["host"].map(lambda h: offsets.get(h, (0, 0))[1])
            start = clock.clip(lower=rnd * round_ms)
            budget = (-((start - end) // delay)).clip(lower=0)  # ceil((end-start)/delay)
        out = df[ranks < budget]
        if offsets is not None:
            out = out.copy()
            kept_ranks = ranks[ranks < budget]
            base = out["host"].map(lambda h: offsets.get(h, (0, 0))[0])
            out["host_seq"] = (base + kept_ranks).astype("int64")
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return _prune(df, ray.get(delays_ref), None)

    candidates = frontier.map_batches(combine, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per host-bucket group — never one call per
        # host; offsets read from THIS bucket's host-state slice only
        parts = []
        for b, g in df.groupby("__hb", sort=False):
            offsets = load_host_offsets(host_state_dir, int(b))
            parts.append(_prune(g, ray.get(delays_ref), offsets))
        if not parts:
            return _prune(df, ray.get(delays_ref), {})
        return pd.concat(parts, ignore_index=True)

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


def defer_frontier(frontier: rd.Dataset, sel_dir: str) -> rd.Dataset:
    """Frontier rows NOT selected this round.

    Membership is checked per url-hash partition: the selected set is
    checkpointed hive-partitioned by the engine's ``partition`` column, and
    each defer task reads ONLY the ``partition=<p>/`` slices present in its
    block — O(selected/partitions) per task.  The big frontier is streamed,
    never shuffled, and no global selected-set is broadcast (the r01
    driver-side Python set was O(selected) driver memory per round)."""
    import os

    import pyarrow.parquet as pq

    def _sel_urls(p: int) -> set[str]:
        d = os.path.join(sel_dir, f"partition={p}")
        if not os.path.isdir(d):
            return set()
        urls: set[str] = set()
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                urls.update(pq.read_table(os.path.join(d, f),
                                          columns=["url"])["url"].to_pylist())
        return urls

    def defer(df: pd.DataFrame) -> pd.DataFrame:
        keep = []
        for p, g in df.groupby("partition", sort=False):
            sel = _sel_urls(int(p))
            keep.append(g if not sel else g[~g["url"].isin(sel)])
        if not keep:
            return df
        return pd.concat(keep, ignore_index=True)

    return frontier.map_batches(defer, batch_format="pandas")
