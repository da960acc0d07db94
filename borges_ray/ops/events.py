"""Event-stream analytics: cohort retention, transition matrices, and
windowed distinct counts.

The crawl/webtext reading of these: "users" are crawl clients or source
hosts, "events" are fetches or ingest records — retention answers "do
sources discovered in week W keep producing pages in week W+k?",
transitions give the Markov matrix of record kinds a pipeline emits, and
windowed uniques are the per-hour breadth (distinct hosts touched)
dashboard number.

All three are exact and SQL-twinnable, and all three collapse to
group-cardinality exchanges: distinct-pair sets and per-key minima are
combiner-reduced before any shuffle, so the wires carry O(#users +
#distinct pairs), never O(#events).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from .relational import distinct, grouped_agg, groupby_buckets, hash_join

WEEK_US = 7 * 86_400 * 1_000_000


def retention_cohorts(events: rd.Dataset, *, user_col: str = "user_id",
                      ts_col: str = "ts",
                      period_us: int = WEEK_US) -> rd.Dataset:
    """Classic cohort-retention triangle: bucket every user by the
    period of their FIRST event (their cohort), then count, for each
    (cohort, period-offset) cell, how many of that cohort's users were
    active in that period.

    Exchange shape: events collapse map-side to (user, period) pairs
    (``distinct`` — at most users × periods rows, usually far fewer than
    events); cohorts come from a keys-only ``grouped_agg`` min; one
    hash join on user lines the two up; a final count exchange is
    #cells rows.  No window functions, no per-user state on the driver.

    Returns ``(cohort int64, offset int64, n_users int64)`` — offset 0
    is the cohort's own period, so its n_users is the cohort size.
    """

    def to_periods(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame({"u": df[user_col].to_numpy("int64"),
                             "w": t // period_us})

    uw = distinct(events.select_columns([user_col, ts_col])
                        .map_batches(to_periods, batch_format="pandas"),
                  ["u", "w"])
    cohort = grouped_agg(uw, ["u"], {"cw": ("min", "w")})
    joined = hash_join(uw, cohort, on=["u"])

    def to_cells(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort": df["cw"].astype("int64"),
            "offset": (df["w"].astype("int64")
                       - df["cw"].astype("int64"))})

    # (u, w) is distinct and each u has exactly one cohort, so a plain
    # row count per cell IS the distinct-user count
    return grouped_agg(joined.map_batches(to_cells, batch_format="pandas"),
                       ["cohort", "offset"], {"n_users": ("count", "cohort")})


def transition_counts(events: rd.Dataset, *, key_col: str = "user_id",
                      ts_col: str = "ts", label_col: str = "event_type",
                      tiebreak: list[str] | None = None) -> rd.Dataset:
    """Global first-order transition matrix of ``label_col``: for every
    key's event sequence (ordered by ``ts`` then ``tiebreak`` so ties
    are deterministic), count each consecutive (prev → next) label pair
    — the Markov-chain estimate of what record kind follows what.

    One bucketed exchange on the key, then a vectorized shift per
    bucket; each bucket emits its PARTIAL pair counts (≤ labels² rows),
    which a final keys-only ``grouped_agg`` merges — so the second
    exchange is at most labels² rows no matter how many events flowed.

    Returns ``(prev_type, next_type, n int64)``.
    """
    tb = tiebreak or []
    cols = [key_col, ts_col, label_col] + tb

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col] + tb, kind="mergesort")
        prev = df[label_col].shift(1)
        same = df[key_col].eq(df[key_col].shift(1))
        pairs = pd.DataFrame({"prev_type": prev[same],
                              "next_type": df[label_col][same]})
        g = pairs.groupby(["prev_type", "next_type"], sort=False)
        return g.size().rename("n").reset_index()

    partial = groupby_buckets(events.select_columns(cols), [key_col],
                              per_bucket)
    return grouped_agg(partial, ["prev_type", "next_type"],
                       {"n": ("sum", "n")})


def windowed_unique(events: rd.Dataset, *, group_col: str = "event_type",
                    ts_col: str = "ts", id_col: str = "user_id",
                    window_us: int = 3_600_000_000) -> rd.Dataset:
    """Exact distinct-``id_col`` count per (group, tumbling window) —
    the per-hour "how many distinct hosts did we touch" breadth metric.
    ``distinct`` collapses (group, window, id) triples map-side before
    the one exchange, then a keys-only count per cell; the scale path
    when ids-per-cell explode is :func:`~borges_ray.ops.sketch.hll_count_by`.

    Returns ``(group, win int64, n_unique int64)``.
    """

    def to_triples(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame({group_col: df[group_col],
                             "win": t // window_us,
                             "id": df[id_col]})

    tri = distinct(events.select_columns([group_col, ts_col, id_col])
                         .map_batches(to_triples, batch_format="pandas"),
                   [group_col, "win", "id"])
    return grouped_agg(tri, [group_col, "win"],
                       {"n_unique": ("count", "id")})
