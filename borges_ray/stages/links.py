"""Link-candidate stage: explode outlinks, winner-dedup, gate through the
URL-seen index and the robots policy.

Dedup shape (SURVEY.md §2.8 D1/D2): per-batch pre-dedup (combiner) →
``groupby(url)`` winner (order-free deterministic: max priority, min depth,
min parent_url — reproduces the reference's insert-if-absent without
depending on arrival order) → Bloom-sharded ``check_and_add`` (T3/J2) so a
URL enters the frontier exactly once across the whole crawl.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..canonical import partition_of

WINNER_SORT = ["priority", "depth", "parent_url"]
WINNER_ASC = [False, True, True]


def link_candidates(parsed: rd.Dataset, rnd: int, num_partitions: int,
                    max_depth: int | None) -> rd.Dataset:
    """parsed rows (with ``links`` list column) → winner-deduped candidate
    frontier rows for round ``rnd + 1``."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["status"] == 200][["url", "priority", "depth", "links"]]
        out = sub.rename(columns={"url": "parent_url"}).explode("links", ignore_index=True)
        out = out.dropna(subset=["links"]).rename(columns={"links": "url"})
        out["depth"] = (out["depth"] + 1).astype("int32")
        out["priority"] = np.maximum(0, out["priority"] - 1).astype("int32")
        if max_depth is not None:
            out = out[out["depth"] <= max_depth]
        out["discovered_round"] = np.int32(rnd + 1)
        out["host"] = out["url"].str.split("/", n=3).str[2].str.split(":").str[0]
        out["partition"] = [partition_of(u, num_partitions) for u in out["url"]]
        # combiner: within-batch winner pre-dedup before the shuffle
        out = out.sort_values(WINNER_SORT, ascending=WINNER_ASC, kind="mergesort")
        out = out.drop_duplicates(subset=["url"], keep="first")
        return out[["url", "host", "depth", "priority", "discovered_round",
                    "parent_url", "partition"]]

    exploded = parsed.map_batches(explode, batch_format="pandas")

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(WINNER_SORT + ["url"], ascending=WINNER_ASC + [True], kind="mergesort")
        return df.drop_duplicates(subset=["url"], keep="first")

    # Shuffle by the engine-wide hash partition (hash(url) % P), NOT by url:
    # every url's candidates co-locate in one partition-group, and the winner
    # is a single vectorized drop_duplicates per partition — one Python call
    # per partition instead of one per url (the per-group-call trap at 10^8
    # urls/round).
    return exploded.groupby("partition", num_partitions=min(num_partitions, 64)).map_groups(
        winner, batch_format="pandas"
    )


def gate_candidates(cands: rd.Dataset, seen_shards: list,
                    robots_ref: "ray.ObjectRef", rnd: int) -> rd.Dataset:
    """Seen-gate (check-and-add on the shard actors) + robots gate.

    Output: candidate rows that are NEW, with a ``blocked`` bool column
    (True → recorded as status-999, never fetched).  The within-round
    winner dedup upstream guarantees each url reaches the shards from
    exactly one task, and the shards key membership by (url, round), so the
    gate is idempotent under Ray task retries (a retried task re-observes
    its own round's additions as new=True instead of silently dropping
    them)."""

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        from ..state.urlseen import seen_check_and_add

        if df.empty:
            out = df.copy()
            out["blocked"] = pd.Series(dtype=bool)
            return out
        from ..stages.robots import robots_allowed

        robots = ray.get(robots_ref)  # host -> (disallows, allows)
        new_mask = seen_check_and_add(seen_shards, df["url"].tolist(), rnd)
        out = df[new_mask].copy()
        blocked = []
        for u, h in zip(out["url"], out["host"]):
            dis, alw = robots.get(h, ((), ()))
            path = u.split(h, 1)[1] if h in u else "/"
            blocked.append(not robots_allowed(path, dis, alw))
        out["blocked"] = blocked
        return out

    return cands.map_batches(gate, batch_format="pandas")
