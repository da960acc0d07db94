"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (ray_guide "Aggregation at scale" + SURVEY.md §2.8):

- **Exact** (D1): content hash per batch (vectorized) → hash-partitioned
  ``groupby(hash)`` → deterministic winner (min id) per group.  The winner
  rule makes the dedup reproducible — the reference's insert-if-absent keeps
  whichever record arrived first (``Borges/db_scripts/insert_jl.py:28-41``);
  ours keeps the smallest key, which is order-free and hence
  parallelism-invariant.
- **MinHash+LSH**: shingle → minhash signature per batch (numpy universal
  hashing, no Python loop over permutations) → explode to
  ``(band, band_hash, id)`` rows → ``groupby(band, band_hash)`` buckets →
  candidate pairs → exact Jaccard verify.  Only bucket-mates ever pair, so
  the candidate set stays near-linear.
- **SimHash**: 64-bit signature from token hashes; near-dups found by
  banding the signature into 16-bit chunks (any exact chunk match →
  candidate; Hamming verify).

All hashes are stable (blake2b / fixed-constant universal hashing) — never
Python's salted ``hash``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

MERSENNE61 = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


_TOKEN_CACHE: dict[str, int] = {}
_TOKEN_CACHE_MAX = 1_000_000
_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant


def _token_hashes(toks: list[str]) -> np.ndarray:
    """Stable u64 hash per token, memoized (natural text is Zipf — the
    cache hit rate is high, cutting per-token blake2b cost)."""
    cache = _TOKEN_CACHE
    if len(cache) > _TOKEN_CACHE_MAX:
        cache.clear()
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = _stable_u64(t)
            cache[t] = h
        out[i] = h
    return out


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Stable u64 hashes of word k-shingles: per-token hashes (memoized
    blake2b) combined positionally with a vectorized polynomial mix —
    equivalent identity semantics to hashing the joined shingle string, at
    a fraction of the cost."""
    toks = text.split()
    if not toks:
        return np.zeros(0, np.uint64)
    th = _token_hashes(toks)
    if len(toks) < k:
        k = len(toks)
    n_sh = len(toks) - k + 1
    acc = np.zeros(n_sh, dtype=np.uint64)
    for j in range(k):
        acc = acc * _SHINGLE_MIX + th[j : j + n_sh]  # wraps mod 2^64 — stable
    return acc


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Keep one row (min id) per distinct text.  The shuffle key is the
    64-bit content hash, NOT the text itself — at 100 TB the shuffle moves
    8-byte keys + ids, never the payload; survivors re-join content by id
    downstream if needed."""
    from .textops import fingerprint_batch

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__h"] = fingerprint_batch(df[text_col])
        return out

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col], kind="mergesort")
        return df.drop_duplicates(subset="__h", keep="first").drop(columns="__h")

    from .relational import groupby_buckets

    return groupby_buckets(hashed, ["__h"], winner)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Per-batch minhash signatures — permutation constants generated once
    per actor from a fixed seed (stateful-stage pattern, T1-analog)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE61, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE61, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (P, S) universal hashing in uint64 modular arithmetic (python ints
        # for the mod-Mersenne part is avoided via float-free numpy trick:
        # wraparound multiply is fine for minhash as long as it is stable)
        prod = self.a[:, None] * sh[None, :] + self.b[:, None]  # wraps mod 2^64 — stable
        return prod.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in df["text"].fillna("")]
        out = df.copy()
        out["__sig"] = [s.tobytes() for s in sigs]
        return out


def minhash_band_rows(
    ds: rd.Dataset, id_col: str, *, num_perm: int = 64, bands: int = 16, shingle_k: int = 3
) -> rd.Dataset:
    """documents → (id, band, band_hash) rows: the LSH explode.  rows/band =
    num_perm // bands; a pair agreeing on any band becomes a candidate."""
    rows_per_band = num_perm // bands

    class Bander(MinHasher):
        def __init__(self):
            super().__init__(num_perm=num_perm, shingle_k=shingle_k)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids, band_ids, band_hashes = [], [], []
            for i, t in zip(df[id_col], df["text"].fillna("")):
                sig = self.signature(t)
                for b in range(bands):
                    chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                    ids.append(i)
                    band_ids.append(b)
                    band_hashes.append(int.from_bytes(bh, "big"))
            return pd.DataFrame({id_col: ids, "band": band_ids, "band_hash": np.array(band_hashes, dtype=np.uint64)})

    return ds.map_batches(Bander, batch_format="pandas", concurrency=(1, 8))


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_near_dup_pairs(
    ds: rd.Dataset,
    id_col: str,
    *,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    texts_by_id: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Candidate pairs from LSH buckets, verified with exact Jaccard ≥
    threshold.  ``texts_by_id`` (id→text) is broadcast for verification; at
    real scale the verify stage re-joins text by id instead (keys-only
    shuffle).  Returns pandas pairs (id_a < id_b, jaccard)."""
    import ray

    band_rows = minhash_band_rows(ds, id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k)
    texts_ref = ray.put(texts_by_id.set_index(id_col)["text"].to_dict()) if texts_by_id is not None else None

    def band_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per band: only band_hash values shared by ≥2 docs spawn
        # pairs; one Python loop over *colliding buckets*, not all buckets
        counts = df["band_hash"].value_counts()
        hot = counts[counts >= 2].index
        sub = df[df["band_hash"].isin(hot)]
        out: list[tuple] = []
        for _, g in sub.groupby("band_hash", sort=False):
            ids = sorted(g[id_col].unique().tolist())
            out.extend((a, b) for i, a in enumerate(ids) for b in ids[i + 1 :])
        if not out:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
        return pd.DataFrame(out, columns=["id_a", "id_b"])

    pairs = band_rows.groupby("band", num_partitions=min(bands, 32)).map_groups(
        band_pairs, batch_format="pandas")
    pairs_df = pairs.to_pandas().drop_duplicates(ignore_index=True)
    if texts_ref is None or pairs_df.empty:
        pairs_df["jaccard"] = pd.Series(dtype="float64")
        return pairs_df
    texts = ray.get(texts_ref)
    jac = [jaccard(texts[a], texts[b], shingle_k) for a, b in zip(pairs_df.id_a, pairs_df.id_b)]
    pairs_df["jaccard"] = np.round(jac, 6)
    return pairs_df[pairs_df["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over whitespace tokens (uniform weights)."""

    def __init__(self):
        self.bits = 64

    def simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hashes = _token_hashes(toks)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(toks)
        return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["simhash"] = np.array([self.simhash(t) for t in df["text"].fillna("")], dtype=np.uint64)
        return out


def simhash_signatures(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 8))


def simhash_near_dup_pairs(ds: rd.Dataset, id_col: str, *, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4×16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), bucket-join on
    (chunk_idx, chunk_value), verify Hamming distance."""
    sigs = simhash_signatures(ds)

    def explode_chunks(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for i, s in zip(df[id_col], df["simhash"]):
            s = int(s)
            for c in range(4):
                rows.append((i, s, c, (s >> (16 * c)) & 0xFFFF))
        return pd.DataFrame(rows, columns=[id_col, "simhash", "chunk", "chunk_val"])

    chunks = sigs.map_batches(explode_chunks, batch_format="pandas")

    def chunk_pairs(df: pd.DataFrame) -> pd.DataFrame:
        counts = df["chunk_val"].value_counts()
        hot = counts[counts >= 2].index
        sub = df[df["chunk_val"].isin(hot)]
        out = []
        for _, g in sub.groupby("chunk_val", sort=False):
            rows = g[[id_col, "simhash"]].drop_duplicates().sort_values(id_col).values
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    h = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                    if h <= max_hamming:
                        out.append((rows[i][0], rows[j][0], h))
        return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])

    pairs = chunks.groupby("chunk", num_partitions=4).map_groups(chunk_pairs, batch_format="pandas")
    return pairs.to_pandas().drop_duplicates(ignore_index=True).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Near-dup grouping: candidate pairs → connected components → survivors
# ---------------------------------------------------------------------------

def near_dup_groups(pairs: pd.DataFrame, *, max_iters: int = 50) -> pd.DataFrame:
    """Connected components over near-dup pairs via min-label propagation
    (the guide's scale shape: iterate "label = min(label, neighbors)" until
    fixpoint; each iteration is a groupby — here the candidate set is small
    by LSH construction, so iterations run in pandas; at larger candidate
    volumes each iteration becomes a Ray groupby with identical semantics).

    Returns (id, group) where group = min id of the component — the
    deterministic keep-one winner per duplicate cluster (D1 winner rule
    lifted to near-dup clusters)."""
    if pairs.empty:
        return pd.DataFrame({"id": pd.Series(dtype="int64"),
                             "group": pd.Series(dtype="int64")})
    edges = pairs[["id_a", "id_b"]].astype("int64")
    ids = pd.unique(pd.concat([edges["id_a"], edges["id_b"]], ignore_index=True))
    label = pd.Series(ids, index=ids)  # start: own id
    for _ in range(max_iters):
        la = edges["id_a"].map(label)
        lb = edges["id_b"].map(label)
        m = pd.concat([
            pd.DataFrame({"id": edges["id_a"], "lbl": np.minimum(la, lb)}),
            pd.DataFrame({"id": edges["id_b"], "lbl": np.minimum(la, lb)}),
            pd.DataFrame({"id": label.index.to_numpy(), "lbl": label.to_numpy()}),
        ], ignore_index=True)
        new_label = m.groupby("id")["lbl"].min()
        if new_label.equals(label.sort_index()):
            break
        label = new_label
    out = label.rename("group").rename_axis("id").reset_index()
    return out.sort_values("id", ignore_index=True)


def dedup_survivors(all_ids: pd.Series, pairs: pd.DataFrame) -> pd.Series:
    """Keep-set after near-dup collapse: every id not in any cluster, plus
    the min id of each cluster."""
    groups = near_dup_groups(pairs)
    losers = set(groups.loc[groups["id"] != groups["group"], "id"])
    return all_ids[~all_ids.isin(losers)].reset_index(drop=True)
