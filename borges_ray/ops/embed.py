"""Similarity search over embedding columns (``list<float>``).

- :func:`knn_brute` — baseline exact cosine top-k: the query matrix is
  ``ray.put`` ONCE and every batch does one numpy matmul against it; each
  block emits only its local top-k, the driver merges ≤ k·blocks rows.
- :func:`knn_lsh` — the scale path: random-hyperplane LSH buckets; only the
  query's bucket(s) are scanned.  (An IVF variant would replace the random
  planes with k-means centroids; same bucket-scan shape.)
- :func:`cosine_near_dup_pairs` — embedding near-dup via the same LSH
  banding + exact cosine verify within buckets.

All floats are rounded to 6 dp at the boundary so results are stable across
BLAS orderings (and hash-comparable against the DuckDB oracle).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import ray
import ray.data as rd

logger = logging.getLogger("borges_ray.embed")


def _matrix(col: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_brute(
    ds: rd.Dataset, query_vecs: np.ndarray, k: int, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> pd.DataFrame:
    """Exact cosine top-k per query vector.  Returns
    ``(query_idx, vec_id, cos)`` — ``cos`` rounded to 6 dp, deterministic
    tiebreak on (cos desc, vec_id asc)."""
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # per-block partial top-k: ≤ k rows per (block, query) reach the driver
        q_ = ray.get(q_ref)
        m = _normalize(_matrix(df[vec_col]))
        cos = np.round(m @ q_.T, 6)  # (rows, n_query)
        parts = []
        for qi in range(cos.shape[1]):
            p = pd.DataFrame({id_col: df[id_col].to_numpy(), "cos": cos[:, qi]})
            p["query_idx"] = qi
            p = p.sort_values(["cos", id_col], ascending=[False, True], kind="mergesort").head(k)
            parts.append(p)
        return pd.concat(parts, ignore_index=True)

    tops = ds.map_batches(score, batch_format="pandas").to_pandas()
    return (
        tops.sort_values(["query_idx", "cos", id_col], ascending=[True, False, True], kind="mergesort")
        .groupby("query_idx", sort=True)
        .head(k)
        .reset_index(drop=True)[["query_idx", id_col, "cos"]]
    )


def lsh_bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane signature → integer bucket id per row."""
    bits = (m @ planes.T) > 0
    return (bits.astype(np.uint64) << np.arange(planes.shape[0], dtype=np.uint64)).sum(axis=1)


def knn_lsh(
    ds: rd.Dataset,
    query_vecs: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 13,
) -> pd.DataFrame:
    """Approximate top-k: only rows whose hyperplane bucket matches the
    query's bucket are SCORED — this logical variant still READS every
    block and prunes compute only (one matmul-then-mask per batch).  For
    physical pruning at 100 TB — reading ~1/2^planes of the bytes — write
    the corpus once with :func:`build_lsh_index` and query with
    :func:`knn_lsh_partitioned`; both produce identical rows (same planes →
    same bucket membership).  Recall is tunable via ``n_planes`` (fewer
    planes → bigger buckets → higher recall)."""
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q_buckets = lsh_bucket_ids(q, planes)
    state = ray.put((q, planes, set(int(b) for b in q_buckets)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        q_, planes_, q_buckets_ = ray.get(state)
        m = _normalize(_matrix(df[vec_col]))
        buckets = lsh_bucket_ids(m, planes_)
        mask = np.isin(buckets, list(q_buckets_))
        if not mask.any():
            return pd.DataFrame({id_col: pd.Series(dtype=df[id_col].dtype),
                                 "cos": pd.Series(dtype="float64"),
                                 "query_idx": pd.Series(dtype="int64")})
        sub = m[mask]
        ids = df[id_col].to_numpy()[mask]
        cos = np.round(sub @ q_.T, 6)
        parts = []
        for qi in range(cos.shape[1]):
            p = pd.DataFrame({id_col: ids, "cos": cos[:, qi], "query_idx": qi})
            parts.append(p.sort_values(["cos", id_col], ascending=[False, True], kind="mergesort").head(k))
        return pd.concat(parts, ignore_index=True)

    tops = ds.map_batches(score, batch_format="pandas").to_pandas()
    return (
        tops.sort_values(["query_idx", "cos", id_col], ascending=[True, False, True], kind="mergesort")
        .groupby("query_idx", sort=True)
        .head(k)
        .reset_index(drop=True)[["query_idx", id_col, "cos"]]
    )


def lsh_planes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    """Deterministic hyperplane set shared by index build and query — the
    same (dim, n_planes, seed) always yields the same planes, so bucket
    membership is reproducible across processes."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def build_lsh_index(
    ds: rd.Dataset,
    planes: np.ndarray,
    out_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """PHYSICAL hyperplane-LSH layout: write the corpus hive-partitioned by
    bucket id (``lshb=<b>/`` dirs — the same bucket-directory idea as the
    IVF ``ivf=<c>/`` layout, :func:`build_ivf_index`).  A query then READS
    only its own bucket directory instead of scanning every block and
    masking — bytes-read drops to ~1/2^n_planes of the corpus.  Idempotent
    via a ``_DONE`` marker."""
    import os

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    planes_ref = ray.put(planes)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_matrix(df[vec_col]))
        out = df[[id_col, vec_col]].copy()
        if len(out) and isinstance(out[vec_col].iloc[0], np.ndarray):
            # see build_ivf_index: keep list<float> so the parquet
            # round-trip avoids Ray's tensor-extension pandas metadata
            out[vec_col] = [v.tolist() for v in out[vec_col]]
        out["lshb"] = lsh_bucket_ids(m, ray.get(planes_ref)).astype("int64")
        return out

    ds.map_batches(assign, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["lshb"])
    with open(done, "w") as fp:
        fp.write("ok")
    return out_dir


def knn_lsh_partitioned(
    index_dir: str,
    query_vecs: np.ndarray,
    k: int,
    planes: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[pd.DataFrame, dict]:
    """Hyperplane-LSH top-k over the partitioned layout: ONLY the query
    buckets' ``lshb=<b>/`` directories are read (physical pruning — the
    logical :func:`knn_lsh` scans every block and masks).  Returns (top-k
    frame, io stats with bytes_read / bytes_total evidencing the read
    reduction).  Rows are identical to :func:`knn_lsh` run with the same
    planes."""
    import os

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_buckets = sorted({int(b) for b in lsh_bucket_ids(q, planes)})

    def _dir_bytes(d: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(d):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files if f.endswith(".parquet"))
        return total

    dirs = [os.path.join(index_dir, f"lshb={b}") for b in q_buckets
            if os.path.isdir(os.path.join(index_dir, f"lshb={b}"))]
    stats = {"bytes_read": sum(_dir_bytes(p) for p in dirs),
             "bytes_total": _dir_bytes(index_dir),
             "partitions_read": len(dirs),
             "partitions_total": 1 << planes.shape[0]}
    if not dirs:
        empty = pd.DataFrame({"query_idx": pd.Series(dtype="int64"),
                              id_col: pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        return empty, stats
    files = sorted(os.path.join(d, f) for d in dirs for f in os.listdir(d)
                   if f.endswith(".parquet"))
    sub = rd.read_parquet(files)
    return knn_brute(sub, query_vecs, k, id_col=id_col, vec_col=vec_col), stats


def cosine_near_dup_pairs_ds(
    ds: rd.Dataset,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 13,
    max_bucket: int = 4096,
    tile: int = 2048,
) -> rd.Dataset:
    """Embedding near-dup pairs (cos ≥ threshold): LSH-band rows into
    hyperplane buckets, exact cosine verify within each bucket, union over a
    few plane seeds to recover pairs split by one plane.  Returns
    (id_a < id_b, cos).

    Bucket fan-out is BOUNDED: at most ``max_bucket`` members per bucket
    enter verification (smallest ids win; overflow is logged) and the
    pairwise matmul runs in ``tile``×``tile`` blocks, so one hot bucket
    (with ``n_planes=6`` the expected occupancy is n/64 rows) costs
    O(tile²) scratch instead of an unbounded O(m²) allocation in a single
    task.  Verification routes through the hash-bucketed
    :func:`~borges_ray.ops.relational.groupby_buckets` (one vectorized call
    per block, no per-group ``map_groups`` Python dispatch) and the three
    plane-seed repetitions stay DISTRIBUTED — per-rep pair sets are unioned
    and de-duplicated with a distributed distinct; only the final
    candidate-sized result is collected."""
    from .relational import groupby_buckets, spill_point

    sample = ds.take(1)
    dim = len(sample[0][vec_col])
    rep_pairs: list[rd.Dataset] = []
    for rep in range(3):  # 3 independent plane sets → higher recall
        rng = np.random.default_rng(seed + rep)
        planes_ref = ray.put(rng.standard_normal((n_planes, dim)))

        def bucketer(df: pd.DataFrame, _ref=planes_ref) -> pd.DataFrame:
            m = _normalize(_matrix(df[vec_col]))
            b = lsh_bucket_ids(m, ray.get(_ref))
            return pd.DataFrame({id_col: df[id_col].to_numpy(), "bucket": b,
                                 vec_col: df[vec_col]})

        bucketed = ds.map_batches(bucketer, batch_format="pandas")

        def verify_block(df: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for b, g in df.groupby("bucket", sort=False):
                if len(g) < 2:
                    continue
                g = g.sort_values(id_col, kind="mergesort")
                if len(g) > max_bucket:
                    logger.warning(
                        "cosine LSH bucket %s capped at %d of %d members; "
                        "%d dropped from verification",
                        b, max_bucket, len(g), len(g) - max_bucket)
                    g = g.head(max_bucket)
                m = _normalize(_matrix(g[vec_col]))
                ids = g[id_col].to_numpy()
                n = len(ids)
                for i0 in range(0, n, tile):
                    mi, ai = m[i0:i0 + tile], ids[i0:i0 + tile]
                    cos = np.round(mi @ mi.T, 6)
                    ia, ib = np.triu_indices(len(ai), k=1)
                    keep = cos[ia, ib] >= threshold
                    if keep.any():
                        outs.append(pd.DataFrame({
                            "id_a": ai[ia[keep]], "id_b": ai[ib[keep]],
                            "cos": cos[ia[keep], ib[keep]]}))
                    for j0 in range(i0 + tile, n, tile):
                        mj, aj = m[j0:j0 + tile], ids[j0:j0 + tile]
                        cos = np.round(mi @ mj.T, 6)
                        fi, fj = np.nonzero(cos >= threshold)
                        if len(fi):
                            outs.append(pd.DataFrame({
                                "id_a": ai[fi], "id_b": aj[fj],
                                "cos": cos[fi, fj]}))
            if not outs:
                return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                     "id_b": pd.Series(dtype="int64"),
                                     "cos": pd.Series(dtype="float64")})
            return pd.concat(outs, ignore_index=True)

        # spill each rep's (candidate-sized) pair set: severs lineage before
        # the union+distinct sort (Ray 2.49 nested union+sort hazard) and
        # forces rep-local planes_ref binding to execute now
        rep_pairs.append(spill_point(
            groupby_buckets(bucketed, ["bucket"], verify_block),
            f"cospairs{rep}"))
    unioned = rep_pairs[0].union(*rep_pairs[1:])
    # dedup by the PAIR KEY, not by (pair, cos): the same dot product is
    # computed in different GEMM tile shapes per rep, which can round one
    # ulp apart at a 0.5e-6 boundary — keying on cos would then let both
    # copies of a pair survive.  Deterministic winner: min cos.
    return groupby_buckets(
        unioned,
        ["id_a", "id_b"],
        lambda df: (df.sort_values(["id_a", "id_b", "cos"], kind="mergesort")
                    .drop_duplicates(subset=["id_a", "id_b"], keep="first")))


def cosine_near_dup_pairs(
    ds: rd.Dataset,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 13,
    max_bucket: int = 4096,
    tile: int = 2048,
) -> pd.DataFrame:
    """Thin pandas wrapper over :func:`cosine_near_dup_pairs_ds` (small
    result collection for oracle queries)."""
    out = cosine_near_dup_pairs_ds(
        ds, threshold, id_col=id_col, vec_col=vec_col, n_planes=n_planes,
        seed=seed, max_bucket=max_bucket, tile=tile).to_pandas()
    return out.sort_values(["id_a", "id_b"], kind="mergesort").reset_index(drop=True)


def cosine_near_dup_exact(
    ds: rd.Dataset,
    small: pd.DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact near-dup pairs against a broadcast side: every batch of ``ds``
    is scored against the full ``small`` matrix (ray.put once, one matmul
    per batch).  Exact — the oracle-checkable baseline; use the LSH variant
    when both sides are large.  Returns (id_a < id_b, cos ≥ threshold)."""
    sm = _normalize(_matrix(small[vec_col]))
    sm_ids = small[id_col].to_numpy()
    ref = ray.put((sm, sm_ids))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        sm_, sm_ids_ = ray.get(ref)
        m = _normalize(_matrix(df[vec_col]))
        ids = df[id_col].to_numpy()
        cos = np.round(m @ sm_.T, 6)
        ia, ib = np.nonzero(cos >= threshold)
        id_a = ids[ia]
        id_b = sm_ids_[ib]
        keep = id_a < id_b
        return pd.DataFrame({"id_a": id_a[keep], "id_b": id_b[keep],
                             "cos": cos[ia[keep], ib[keep]]})

    return (
        ds.map_batches(score, batch_format="pandas")
        .to_pandas()
        .sort_values(["id_a", "id_b"], kind="mergesort")
        .reset_index(drop=True)
    )


def semdedup(
    ds: rd.Dataset,
    centroids: np.ndarray,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_chunk: int = 2048,
) -> rd.Dataset:
    """Semantic dedup (the SemDeDup recipe, Abbas et al. 2023): assign
    every embedding to its nearest centroid, then WITHIN each cluster drop
    any row whose cosine to a lower-id cluster member reaches
    ``threshold``.  Returns surviving ``(id_col, cid)`` rows.

    Determinism adaptations (SQL-twinnable): assignment is
    ``argmax dot(v_norm, centroid)`` with lowest-cid tiebreak (row
    normalization cannot change the argmax, so the oracle recomputes it
    from raw vectors); the drop rule compares against ALL lower-id members
    (not just surviving ones), so it needs no sequential pass and is an
    ``EXISTS`` in SQL.

    Scale shape: clusters are the shuffle unit (one bucketed exchange on
    cid); the within-cluster quadratic pair scan streams in
    ``pair_chunk``-row slabs, bounding peak memory at
    ``pair_chunk × cluster_rows`` floats per task — at the 10^10 design
    point raise ``n_centroids`` so clusters stay block-sized (same
    partitioning assumption as :func:`cosine_near_dup_pairs`, here
    explicit and memory-bounded)."""
    from .relational import groupby_buckets

    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cents_ref)
        m = _normalize(_matrix(df[vec_col]))
        out = df[[id_col, vec_col]].copy()
        out["cid"] = np.argmax(m @ cents.T, axis=1).astype("int32")
        return out

    assigned = ds.map_batches(assign, batch_format="pandas")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "cid": pd.Series([], dtype="int32")})
        frames = []
        for cid, g in df.groupby("cid", sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            m = _normalize(_matrix(g[vec_col]))
            n = len(g)
            dropped = np.zeros(n, dtype=bool)
            for s in range(0, n, pair_chunk):
                e = min(s + pair_chunk, n)
                cos = np.round(m[s:e] @ m[:e].T, 6)
                # row r is global i = s + r; admissible cols are j < i
                mask = np.tril(np.ones((e - s, e), dtype=bool), k=s - 1)
                dropped[s:e] = ((cos >= threshold) & mask).any(axis=1)
            frames.append(pd.DataFrame({id_col: g[id_col].to_numpy()[~dropped],
                                        "cid": np.int32(cid)}))
        return pd.concat(frames, ignore_index=True)

    return groupby_buckets(assigned, ["cid"], prune)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-bucketed scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    ds: rd.Dataset,
    n_centroids: int = 16,
    *,
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    n_iters: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """Train IVF centroids with mini k-means on a driver-side sample (the
    sample is small by construction; the full data never leaves the
    cluster).  Deterministic: seeded init, fixed iteration count."""
    sample = ds.limit(sample_rows).to_pandas()
    m = _normalize(_matrix(sample[vec_col]))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)
    cents = m[np.sort(idx)].copy()
    for _ in range(n_iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def build_ivf_index(
    ds: rd.Dataset,
    centroids: np.ndarray,
    out_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """PHYSICAL IVF layout: write the corpus hive-partitioned by nearest
    centroid (``ivf=<c>/`` dirs — the same bucket-directory idea as the
    crawl's pages layout, ``stages/fetch.py:write_pages_bucketed``).  A
    query then READS only its ``n_probe`` partitions instead of logically
    filtering a full scan — bytes-read drops by ~``n_probe/n_centroids``.
    Idempotent via a ``_DONE`` marker."""
    import os

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    cents_ref = ray.put(centroids)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cents_ref)
        m = _normalize(_matrix(df[vec_col]))
        out = df[[id_col, vec_col]].copy()
        if len(out) and isinstance(out[vec_col].iloc[0], np.ndarray):
            # ndarray cells (e.g. a pandas-origin dataset) become Ray's
            # tensor extension type, whose parquet round-trip embeds pandas
            # metadata ("numpy.ndarray(shape=...)") that to_pandas can't
            # parse back (Ray 2.49/pyarrow interop); plain lists keep the
            # index files as vanilla list<float>
            out[vec_col] = [v.tolist() for v in out[vec_col]]
        out["ivf"] = np.argmax(m @ cents.T, axis=1).astype("int32")
        return out

    ds.map_batches(assign, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["ivf"])
    with open(done, "w") as fp:
        fp.write("ok")
    return out_dir


def knn_ivf_partitioned(
    index_dir: str,
    query_vecs: np.ndarray,
    k: int,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> tuple[pd.DataFrame, dict]:
    """IVF top-k over the partitioned layout: ONLY the probed ``ivf=<c>/``
    directories are read (physical pruning — the r01 version scanned every
    block and filtered logically).  Returns (top-k frame, io stats with
    bytes_read / bytes_total evidencing the read reduction)."""
    import os

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]
    probe_set = sorted({int(c) for row in probe for c in row})

    def _dir_bytes(d: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(d):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files if f.endswith(".parquet"))
        return total

    dirs = [os.path.join(index_dir, f"ivf={c}") for c in probe_set
            if os.path.isdir(os.path.join(index_dir, f"ivf={c}"))]
    stats = {"bytes_read": sum(_dir_bytes(p) for p in dirs),
             "bytes_total": _dir_bytes(index_dir),
             "partitions_read": len(dirs),
             "partitions_total": len(centroids)}
    files = sorted(os.path.join(d, f) for d in dirs for f in os.listdir(d)
                   if f.endswith(".parquet"))
    sub = rd.read_parquet(files)
    return knn_brute(sub, query_vecs, k, id_col=id_col, vec_col=vec_col), stats


def knn_ivf(
    ds: rd.Dataset,
    query_vecs: np.ndarray,
    k: int,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> pd.DataFrame:
    """IVF top-k: score only rows whose nearest centroid is among the
    query's ``n_probe`` closest centroids.  At scale the corpus is
    PARTITIONED by centroid id on disk (hive ``ivf=<c>/`` dirs — same layout
    idea as the pages buckets), so a query reads ``n_probe / n_centroids``
    of the data; here the pruning happens per batch.  Recall is tuned by
    ``n_probe``.  Deterministic tiebreaks as in :func:`knn_brute`."""
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]
    state = ray.put((q, centroids, probe))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        q_, cents, probe_ = ray.get(state)
        m = _normalize(_matrix(df[vec_col]))
        assign = np.argmax(m @ cents.T, axis=1)
        parts = []
        ids = df[id_col].to_numpy()
        for qi in range(q_.shape[0]):
            mask = np.isin(assign, probe_[qi])
            if not mask.any():
                continue
            cos = np.round(m[mask] @ q_[qi], 6)
            p = pd.DataFrame({id_col: ids[mask], "cos": cos, "query_idx": qi})
            parts.append(p.sort_values(["cos", id_col], ascending=[False, True],
                                       kind="mergesort").head(k))
        if not parts:
            return pd.DataFrame({id_col: pd.Series(dtype=df[id_col].dtype),
                                 "cos": pd.Series(dtype="float64"),
                                 "query_idx": pd.Series(dtype="int64")})
        return pd.concat(parts, ignore_index=True)

    tops = ds.map_batches(score, batch_format="pandas").to_pandas()
    return (
        tops.sort_values(["query_idx", "cos", id_col], ascending=[True, False, True], kind="mergesort")
        .groupby("query_idx", sort=True)
        .head(k)
        .reset_index(drop=True)[["query_idx", id_col, "cos"]]
    )


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd) — the clustering primitive behind semantic
# dedup bucketing, IVF coarse quantizers, and topic-balanced data mixing.


def kmeans_lloyd(
    ds: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Fixed-iteration Lloyd k-means over an embedding column, fully
    deterministic: initial centroids are the embeddings of the ``k``
    smallest ids (stable across runs and cluster sizes), distances are
    Euclidean with lowest-cid tiebreak, and a cluster that captures no
    points simply drops out of the next round (same semantics as the
    SQL twin's inner aggregate).

    Scale shape — the textbook mini-batch-free distributed Lloyd:
      * centroids are O(k·dim) and ride to every task via ``ray.put``
        (broadcast once per iteration, never re-shipped per batch);
      * each iteration is ONE streaming ``map_batches`` pass emitting
        per-batch partial ``(cid, count, component-sums)`` rows — the
        driver reduces ≤ k × num_blocks tiny rows, never the corpus;
      * the seed scan takes per-block k-smallest candidates first, so
        the driver sees ≤ k × num_blocks seed rows, not a sorted corpus;
      * the final labelling pass streams ``(id, cluster)`` out.

    Returns a Dataset of ``(id_col, cluster int64)``.
    """
    # deterministic seeds: per-block k-smallest ids, reduced on the driver
    def block_min_k(df: pd.DataFrame) -> pd.DataFrame:
        s = df[[id_col, vec_col]].sort_values(id_col, kind="mergesort").head(k)
        return s

    cand = ds.map_batches(block_min_k, batch_format="pandas").to_pandas()
    cand = cand.sort_values(id_col, kind="mergesort").head(k)
    cents = _matrix(cand[vec_col])          # row i = centroid cid=i
    cids = np.arange(len(cents), dtype=np.int64)

    def _assign(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        # squared L2 via the expansion; argmin ties resolve to the lowest
        # index because np.argmin returns the first minimum
        d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        return np.argmin(d2, axis=1)

    for _ in range(iters - 1):
        cents_ref = ray.put(cents)
        ids_ref = ray.put(cids)

        def partial(df: pd.DataFrame, _c=cents_ref, _i=ids_ref) -> pd.DataFrame:
            c = ray.get(_c)
            m = _matrix(df[vec_col])
            a = _assign(m, c)
            rows = []
            for j in np.unique(a):
                sel = m[a == j]
                rows.append({"cid": int(ray.get(_i)[j]),
                             "n": np.int64(len(sel)),
                             "s": sel.sum(axis=0).tolist()})
            if not rows:
                return pd.DataFrame({"cid": pd.Series(dtype="int64"),
                                     "n": pd.Series(dtype="int64"),
                                     "s": pd.Series(dtype="object")})
            return pd.DataFrame(rows, columns=["cid", "n", "s"])

        p = ds.map_batches(partial, batch_format="pandas").to_pandas()
        if not len(p):
            break
        g = p.groupby("cid", sort=True)
        sums = {cid: np.sum(np.vstack([np.asarray(v) for v in sub["s"]]), axis=0)
                / sub["n"].sum() for cid, sub in g}
        cids = np.array(sorted(sums), dtype=np.int64)
        cents = np.vstack([sums[c] for c in cids])

    cents_ref = ray.put(cents)
    ids_ref = ray.put(cids)

    def label(df: pd.DataFrame, _c=cents_ref, _i=ids_ref) -> pd.DataFrame:
        a = _assign(_matrix(df[vec_col]), ray.get(_c))
        return pd.DataFrame({id_col: df[id_col].astype("int64"),
                             "cluster": ray.get(_i)[a].astype("int64")})

    return ds.map_batches(label, batch_format="pandas")


def quantize_int8(ds: rd.Dataset, *, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> rd.Dataset:
    """Symmetric per-vector int8 quantization for embedding storage: each
    vector's scale is ``max|v| / 127`` and every component quantizes to
    ``floor(v/scale + 0.5)`` (half-up — deterministic and SQL-reproducible,
    unlike banker's rounding).  Returns (id, scale, q_sum, q_abs_max,
    max_err): the quantized checksum row a 100 TB vector-store prep stage
    would validate against, with ``max_err`` the per-vector worst absolute
    dequantization error (rounded to 6 dp).

    Scale shape: one embarrassingly-parallel map_batches pass — vectors die
    inside the stage; only 5 small columns flow out (the quantized payload
    itself would be written straight to a partitioned sink in production).
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        m = _matrix(df[vec_col])
        amax = np.abs(m).max(axis=1)
        scale = amax / 127.0
        safe = np.where(scale == 0, 1.0, scale)
        q = np.floor(m / safe[:, None] + 0.5)
        deq = q * safe[:, None]
        err = np.abs(deq - m).max(axis=1)
        return pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "scale": np.round(scale, 6),
            "q_sum": q.sum(axis=1).astype("int64"),
            "q_abs_max": np.abs(q).max(axis=1).astype("int64"),
            "max_err": np.round(err, 6),
        })

    return ds.map_batches(fn, batch_format="pandas")
