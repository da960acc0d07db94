"""Crawl-budget scheduling: apportion a GLOBAL per-round fetch budget
across hosts, then pick each host's top-priority URLs.

The per-host politeness selector (`stages/politeness.py`) answers "how
many fetches may host H absorb this round"; this module answers the
complementary planning question every large crawler faces: the cluster
can afford B fetches per round TOTAL — which B URLs?  The classic
answer (Cho & Garcia-Molina 2000-style recrawl scheduling) is
proportional apportionment by host demand with largest-remainder
rounding, then per-host priority order.

Everything is EXACT INTEGER arithmetic (`(B·w) // W` and `(B·w) % W`
share the denominator, so remainder order equals fractional-part order)
— no float apportionment drift between the engine and a SQL twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def crawl_budget_alloc(cand: rd.Dataset, budget: int, *,
                       host_col: str = "host", url_col: str = "url",
                       pr_col: str = "pr") -> rd.Dataset:
    """Select ≤ ``budget`` candidate URLs: each host gets
    ``floor(budget·w_h / W)`` slots (``w_h`` = the host's summed
    priority, ``W`` the global sum) plus one top-up slot if it ranks in
    the top ``budget − Σfloor`` hosts by integer remainder
    (``(budget·w_h) mod W`` descending, host ascending); within a host
    the highest-priority URLs fill the slots (priority desc, url asc).
    Returns ``(url, host, pr)`` for the selected URLs.

    Distributed shape: host demand is ONE keys-only combine; the driver
    sees only the two scalars ``W`` and ``Σfloor``; the remainder top-up
    is a keys-only sort+limit over the HOST table (not URLs); the
    per-host quota flows back to URLs via a hash join and one bucketed
    top-n pass.  Priorities must be non-negative integers small enough
    that ``budget · w_h`` fits in int64."""
    from .relational import (grouped_agg, groupby_buckets, hash_join,
                             spill_point)

    cand = cand.select_columns([url_col, host_col, pr_col])

    hs = spill_point(
        grouped_agg(cand.select_columns([host_col, pr_col]),
                    [host_col], {"w": ("sum", pr_col)}), "alloc_hosts")
    W = int(hs.sum("w") or 0)
    if W <= 0:
        return rd.from_pandas(pd.DataFrame({
            url_col: pd.Series(dtype="int64"),
            host_col: pd.Series(dtype="int64"),
            pr_col: pd.Series(dtype="int64")}))

    def flo(df: pd.DataFrame) -> pd.DataFrame:
        w = df["w"].to_numpy(np.int64)
        prod = budget * w  # int64; caller guarantees no overflow
        return pd.DataFrame({host_col: df[host_col],
                             "nfloor": prod // W,
                             "rem": prod % W})

    fl = spill_point(hs.map_batches(flo, batch_format="pandas"), "alloc_fl")
    k = budget - int(fl.sum("nfloor") or 0)

    if k > 0:
        boost = (fl.sort(["rem", host_col], descending=[True, False])
                 .limit(k).select_columns([host_col]))
        boost = boost.map_batches(
            lambda df: df.assign(__boost=np.int64(1)), batch_format="pandas")
        alloc = hash_join(fl.select_columns([host_col, "nfloor"]), boost,
                          on=[host_col], join_type="left_outer")

        def add_n(df: pd.DataFrame) -> pd.DataFrame:
            n = (df["nfloor"].astype("int64")
                 + df["__boost"].fillna(0).astype("int64"))
            return pd.DataFrame({host_col: df[host_col], "n": n})

        alloc = alloc.map_batches(add_n, batch_format="pandas")
    else:
        alloc = fl.map_batches(
            lambda df: pd.DataFrame({host_col: df[host_col],
                                     "n": df["nfloor"].astype("int64")}),
            batch_format="pandas")

    joined = hash_join(cand, alloc, on=[host_col])

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({url_col: pd.Series(dtype="int64"),
                                 host_col: pd.Series(dtype="int64"),
                                 pr_col: pd.Series(dtype="int64")})
        df = df.sort_values([host_col, pr_col, url_col],
                            ascending=[True, False, True], kind="mergesort")
        rn = df.groupby(host_col, sort=False).cumcount()
        out = df[rn < df["n"].to_numpy(np.int64)]
        return out[[url_col, host_col, pr_col]].reset_index(drop=True)

    return groupby_buckets(joined, [host_col], topn)


def politeness_audit(fetches: rd.Dataset, *, host_col: str = "host",
                     ts_col: str = "ts",
                     min_interval_us: int = 3_600_000_000) -> rd.Dataset:
    """Audit a fetch log against a per-host minimum-interval politeness
    rule (the crawl-delay contract every polite crawler owes hosts —
    RFC 9309's Crawl-delay convention / Cho & Garcia-Molina 2000): for
    each host, count consecutive-fetch gaps shorter than
    ``min_interval_us`` and report the tightest gap observed.

    One bucketed exchange on host, then a single vectorized scan per
    bucket: sort (host, ts), diff the int64 timestamps, mask out
    cross-host boundaries, aggregate.  The gap MULTISET of a sorted
    per-host sequence is invariant under tie order, so no deterministic
    tiebreak is needed and the result is bit-identical to a SQL
    ``lag() OVER (PARTITION BY host ORDER BY ts)`` twin.  Hosts with a
    single fetch have no gaps and are excluded (SQL ``HAVING
    count(*) >= 2``).

    Returns ``(host, n_fetches int64, n_violations int64,
    min_gap_us int64)`` — one row per multi-fetch host; exact integer
    microseconds throughout.
    """
    from .relational import groupby_buckets

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({host_col: pd.Series(dtype="int64"),
                              "n_fetches": pd.Series(dtype="int64"),
                              "n_violations": pd.Series(dtype="int64"),
                              "min_gap_us": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        df = df.sort_values([host_col, ts_col], kind="mergesort")
        h = df[host_col].to_numpy("int64")
        # normalize to µs regardless of the frame's datetime resolution
        # (parquet timestamps load as datetime64[us], ad-hoc frames are
        # often datetime64[ns] — a bare astype(int64) is unit-dependent)
        t = df[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        same = np.concatenate(([False], h[1:] == h[:-1]))
        gap = np.concatenate(([0], t[1:] - t[:-1]))
        g = pd.DataFrame({host_col: h, "__gap": gap})[same]
        if not len(g):
            return empty
        g["__viol"] = (g["__gap"] < min_interval_us).astype("int64")
        agg = g.groupby(host_col, sort=False).agg(
            n_gaps=("__gap", "count"), n_violations=("__viol", "sum"),
            min_gap_us=("__gap", "min")).reset_index()
        out = pd.DataFrame({
            host_col: agg[host_col].astype("int64"),
            "n_fetches": (agg["n_gaps"] + 1).astype("int64"),
            "n_violations": agg["n_violations"].astype("int64"),
            "min_gap_us": agg["min_gap_us"].astype("int64")})
        return out

    return groupby_buckets(fetches.select_columns([host_col, ts_col]),
                           [host_col], per_bucket)


def fetch_shard_plan(loads: rd.Dataset, n_shards: int, *,
                     host_col: str = "host",
                     load_col: str = "c") -> rd.Dataset:
    """Plan the assignment of hosts to ``n_shards`` fetch workers with
    deterministic SNAKE (boustrophedon) placement: hosts ranked by
    (load desc, host), then dealt 0..n-1, n-1..0, 0..n-1, … — the
    arithmetic balance heuristic that keeps every shard within one
    top-host load of the others while staying pure SQL-twinnable
    (``row_number`` + a CASE), unlike greedy LPT whose heap state no
    SQL engine can express.

    The global rank comes from :func:`~borges_ray.ops.relational.global_rank`
    (histogram rank bases + one bucketed intra-rank — no total-order
    materialization), so the plan never funnels the host table through
    the driver.  Returns the per-shard summary ``(shard int64,
    n_hosts int64, load int64)`` — the row-level assignment stays
    distributed and is derivable from the same rank arithmetic.
    """
    from .relational import global_rank, grouped_agg

    ranked = global_rank(loads, load_col, host_col, descending=True)
    period = 2 * n_shards

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        r0 = (df["rank"].to_numpy("int64") - 1) % period
        shard = np.where(r0 < n_shards, r0, period - 1 - r0)
        return pd.DataFrame({"shard": shard.astype("int64"),
                             "host": df[host_col],
                             "c": df[load_col].astype("int64")})

    assigned = ranked.map_batches(assign, batch_format="pandas")
    return grouped_agg(assigned, ["shard"],
                       {"n_hosts": ("count", "host"),
                        "load": ("sum", "c")})


def rendezvous_shards(ds: rd.Dataset, key_col: str, *, n_old: int = 16,
                      n_new: int = 17) -> rd.Dataset:
    """Rendezvous (highest-random-weight) shard assignment audit
    (Thaler & Ravishankar 1998): each key goes to
    ``argmax_w md5(key '#' w)`` — the frontier-sharding scheme whose
    resize churn is provably minimal (growing ``n_old`` → ``n_new``
    workers moves only the keys whose new worker wins, E[moved] =
    1 - n_old/n_new, vs ~100% for ``hash % W``).

    Emits per-OLD-shard rows ``(shard, n, n_moved)`` comparing the two
    worker-set sizes — the audit a frontier operator reads before
    resizing a crawl fleet.  Pure per-row map (W hashes per key, no
    exchange) + one shard-keyed count aggregate; ties are broken by the
    lower worker index (deterministic, and reproduced by the SQL twin's
    ``ORDER BY h DESC, w``)."""
    from .dedup import _md5_u64
    from .relational import grouped_agg

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].astype(str)
        n = len(df)
        old = np.zeros(n, dtype=np.int64)
        new = np.zeros(n, dtype=np.int64)
        for i, s in enumerate(keys):
            hs = [_md5_u64(f"{s}#{w}") for w in range(n_new)]
            old[i] = int(np.argmax(hs[:n_old]))
            new[i] = int(np.argmax(hs))
        return pd.DataFrame({
            "shard": old,
            "n": np.ones(n, dtype=np.int64),
            "n_moved": (old != new).astype(np.int64)})

    rows = ds.map_batches(assign, batch_format="pandas")
    return grouped_agg(rows, ["shard"], {"n": ("sum", "n"),
                                         "n_moved": ("sum", "n_moved")})
