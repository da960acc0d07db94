"""Deterministic training-shard packing via a distributed prefix sum.

Writing a pre-training corpus as fixed-token-budget shards needs, for every
document, the exact running total of tokens over a global deterministic
order — a classic distributed prefix sum.  Shape (10^10 docs):

1. coarse ranges: ``range_id = order_key // range_size`` — per-range sums
   computed distributed with a keys-only combiner (`grouped_agg`);
2. the driver sees ONLY the per-range totals (#ranges rows — with
   ``range_size`` 10^6 that is 10^4 rows at 10^10 docs), prefix-sums them,
   and broadcasts the exclusive offsets in the task closure;
3. one bucketed shuffle on ``range_id`` co-locates each range, a single
   vectorized pass per block does the within-range cumsum + offset.

No full sort, no driver contact with row-level data.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from .relational import grouped_agg, groupby_buckets


def prefix_sum(ds: rd.Dataset, order_col: str, value_col: str,
               out_col: str = "cum", *, range_size: int = 1 << 20) -> rd.Dataset:
    """Adds ``out_col`` = inclusive running sum of ``value_col`` in
    ``order_col`` order.  ``order_col`` must be unique non-negative ints
    (a doc_id); ties are impossible by construction."""

    def add_range(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__rg"] = (df[order_col] // range_size).astype("int64")
        return out

    ranged = ds.map_batches(add_range, batch_format="pandas")

    range_sums = grouped_agg(
        ranged.select_columns(["__rg", value_col]),
        ["__rg"], {"__rsum": ("sum", value_col)},
    ).to_pandas()  # O(#ranges) rows — the only driver materialization
    range_sums = range_sums.sort_values("__rg")
    offsets = dict(zip(range_sums["__rg"],
                       range_sums["__rsum"].cumsum() - range_sums["__rsum"]))

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([("__rg"), order_col], kind="mergesort").copy()
        base = df["__rg"].map(offsets).astype("int64")
        df[out_col] = df.groupby("__rg", sort=False)[value_col].cumsum().astype("int64") + base
        return df.drop(columns="__rg")

    return groupby_buckets(ranged, ["__rg"], per_range)


def shard_pack(ds: rd.Dataset, order_col: str, weight_col: str,
               budget: int, *, range_size: int = 1 << 20) -> rd.Dataset:
    """Assigns each row a ``shard_id`` so consecutive rows (in
    ``order_col`` order) fill shards of ~``budget`` total ``weight_col``:
    ``shard_id = (cum - weight) // budget`` — i.e. a shard boundary falls
    wherever the running total crosses a budget multiple.  Deterministic,
    equals the SQL window ``(sum(w) OVER (ORDER BY k) - w) // budget``.
    Also keeps ``cum`` (inclusive running total) for audit."""
    with_cum = prefix_sum(ds, order_col, weight_col, "cum", range_size=range_size)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["shard_id"] = ((df["cum"] - df[weight_col]) // budget).astype("int64")
        return out

    return with_cum.map_batches(assign, batch_format="pandas")


def sequence_pack(ds: rd.Dataset, order_col: str, tokens_col: str,
                  ctx_len: int, *, eos: int = 1,
                  range_size: int = 1 << 20) -> rd.Dataset:
    """Fixed-context SEQUENCE packing (GPT-style pre-training layout):
    documents are concatenated in ``order_col`` order, each followed by
    ``eos`` sentinel tokens, and the token stream is cut into training
    sequences of exactly ``ctx_len`` tokens.  Emits, per document, the
    doc→sequence map a data loader needs to locate it:

    - ``tok_start``  — the document's first token's global offset
    - ``seq_first`` / ``seq_last`` — the first/last sequence index the
      document's tokens land in
    - ``n_seqs``     — how many sequences the document spans

    Pure arithmetic over the distributed prefix sum (:func:`prefix_sum`):
    no sort, no driver contact with row-level data; equals the SQL window
    ``sum(w) OVER (ORDER BY k)`` twin exactly (integer arithmetic only).
    Contrast :func:`shard_pack`, which cuts at document boundaries
    (~budget-sized shards); sequence packing cuts mid-document at exact
    ``ctx_len`` multiples, which is what context-window training consumes."""

    def add_w(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__w"] = (df[tokens_col].astype("int64") + eos)
        return out

    with_cum = prefix_sum(ds.map_batches(add_w, batch_format="pandas"),
                          order_col, "__w", "cum", range_size=range_size)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        start = (df["cum"] - df["__w"]).astype("int64")
        out["tok_start"] = start
        out["seq_first"] = (start // ctx_len).astype("int64")
        out["seq_last"] = ((df["cum"] - 1) // ctx_len).astype("int64")
        out["n_seqs"] = (out["seq_last"] - out["seq_first"] + 1).astype("int64")
        return out.drop(columns=["__w", "cum"])

    return with_cum.map_batches(assign, batch_format="pandas")


def epoch_shuffle(ds: rd.Dataset, id_col: str = "doc_id", *,
                  seed: int = 0, shard_size: int = 64,
                  hex_prefix: int = 3) -> rd.Dataset:
    """Deterministic seeded EPOCH SHUFFLE into training shards: every row
    gets a global position in the order of ``md5(f"{seed}:{id}")`` (ties
    broken by id — md5 collisions aside, unreachable), then
    ``shard_id = pos // shard_size`` and ``pos_in_shard = pos % shard_size``.
    Re-running with a different ``seed`` yields an independent permutation
    — the per-epoch reshuffle a pre-training data loader needs, computed
    once as a table instead of an in-memory shuffle.

    Distributed rank WITHOUT a global sort materialization: the first
    ``hex_prefix`` hex chars of the key define 16^hex_prefix coarse ranges
    that are monotone with the full key order; per-range counts are a
    keys-only combine, the driver prefix-sums ONLY the range totals
    (≤ 4096 rows at the default), and one bucketed shuffle on the range id
    ranks within ranges vectorized.  Same shape as :func:`prefix_sum` but
    ordered by a hash, not by the id itself."""
    import hashlib

    n_ranges = 16 ** hex_prefix

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        ks = [hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:16]
              for d in df[id_col]]
        out = pd.DataFrame({id_col: df[id_col], "__k": ks})
        out["__rg"] = [int(k[:hex_prefix], 16) for k in ks]
        return out

    from .relational import spill_point

    # pin the keyed table: it feeds both the range-count pass and the
    # final bucketed rank, and the per-row md5 keying is the expensive
    # part — without a pin it would execute twice
    keyed = spill_point(
        ds.select_columns([id_col]).map_batches(add_key, batch_format="pandas"),
        "epoch_keys")

    range_counts = grouped_agg(keyed.select_columns(["__rg", id_col]),
                               ["__rg"], {"__n": ("count", id_col)}
                               ).to_pandas()  # ≤ n_ranges rows
    range_counts = range_counts.sort_values("__rg")
    offsets = dict(zip(range_counts["__rg"],
                       range_counts["__n"].cumsum() - range_counts["__n"]))

    def rank_range(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "pos": pd.Series(dtype="int64"),
                                 "shard_id": pd.Series(dtype="int64"),
                                 "pos_in_shard": pd.Series(dtype="int64")})
        df = df.sort_values(["__rg", "__k", id_col], kind="mergesort").copy()
        base = df["__rg"].map(offsets).astype("int64")
        intra = df.groupby("__rg", sort=False).cumcount()
        pos = (base + intra).astype("int64")
        return pd.DataFrame({id_col: df[id_col].astype("int64"),
                             "pos": pos,
                             "shard_id": (pos // shard_size).astype("int64"),
                             "pos_in_shard": (pos % shard_size).astype("int64")})

    return groupby_buckets(keyed, ["__rg"], rank_range)
