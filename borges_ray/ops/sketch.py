"""HyperLogLog distinct-count sketch — mergeable, deterministic, and
SQL-oracle-checkable.

Exact per-group ``count(DISTINCT x)`` shuffles every distinct value; at
10^10 rows the sketch path ships ≤ ``groups × m`` one-byte registers
instead.  Classic HLL (Flajolet et al. 2007), with two determinism
choices so a DuckDB twin reproduces it bit-for-bit:

- the row hash is md5 lower-64 (``md5_number_lower`` in SQL — the same
  pairing the SimHash oracle uses);
- the register harmonic sum ``Σ 2^-M_j`` is computed EXACTLY as the
  integer ``Σ 2^(L-M_j)`` (fits int128 for m=64, L=59), so no
  floating-point summation order can perturb the estimate — the only
  float ops are one multiply chain and one division, identical on both
  engines.

Registers merge by MAX, so the per-batch combiner inside
:func:`~borges_ray.ops.relational.grouped_agg` already collapses each
block to ≤ groups × m rows before the (keys-only) shuffle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd

P = 6                 #: bucket bits → m = 64 registers per group
M = 1 << P
L = 64 - P + 1        #: max rho; 2^(L - rho) fits well inside int128
ALPHA = 0.709         #: HLL bias constant for m = 64


def _rho_rows(values: pd.Series) -> pd.DataFrame:
    """(bucket, rho) per value — md5 lower-64 with exact integer
    bit_length, computed once per DISTINCT value in the batch."""
    from .dedup import _md5_u64

    mask = (1 << (64 - P)) - 1
    cache: dict[str, tuple[int, int]] = {}
    for v in values.drop_duplicates():
        h = _md5_u64(v)
        rem = h & mask
        rho = (64 - P) - rem.bit_length() + 1 if rem else L
        cache[v] = (h >> (64 - P), rho)
    br = [cache[v] for v in values]
    return pd.DataFrame({"bucket": np.array([b for b, _ in br], dtype="int64"),
                         "rho": np.array([r for _, r in br], dtype="int64")})


def cms_estimate(ds: rd.Dataset, value_col: str, probes: list[str],
                 *, depth: int = 4, width: int = 256) -> rd.Dataset:
    """Count-min sketch frequency estimates for a fixed probe set.

    The sketch is ``depth`` rows of ``width`` integer counters; row ``r``
    hashes a value to ``md5_lower64(value + '#' + r) % width``.  Counters
    merge by SUM (exact integers — order-free), so the whole sketch is
    one keys-only ``grouped_agg`` over ``(row, bucket)`` pairs: ≤
    depth × width counter cells ever exist, regardless of input size.
    ``estimate(probe) = min over rows of counter[bucket_r(probe)]`` — an
    upper bound on the true count, deterministic, and recomputable in SQL
    (``md5_number_lower`` + modulo + the same min).  The classic
    guarantee: overestimate ≤ ε·N with prob ≥ 1-δ for width = e/ε,
    depth = ln(1/δ)."""
    from .dedup import _md5_u64
    from .relational import grouped_agg

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[value_col].astype(str)
        uniq = vals.value_counts()  # per-batch combiner: one row per value
        rows_out = {"row": [], "bucket": [], "n": []}
        for v, n in uniq.items():
            for r in range(depth):
                rows_out["row"].append(r)
                rows_out["bucket"].append(_md5_u64(f"{v}#{r}") % width)
                rows_out["n"].append(int(n))
        return pd.DataFrame({"row": pd.Series(rows_out["row"], dtype="int64"),
                             "bucket": pd.Series(rows_out["bucket"], dtype="int64"),
                             "n": pd.Series(rows_out["n"], dtype="int64")})

    counters = grouped_agg(ds.map_batches(cells, batch_format="pandas"),
                           ["row", "bucket"], {"c": ("sum", "n")}).to_pandas()
    table = {(int(r), int(b)): int(c)
             for r, b, c in zip(counters["row"], counters["bucket"], counters["c"])}

    out = pd.DataFrame({
        "probe": probes,
        "est_count": [min(table.get((r, _md5_u64(f"{p}#{r}") % width), 0)
                          for r in range(depth)) for p in probes],
    })
    out["est_count"] = out["est_count"].astype("int64")
    return rd.from_pandas(out)


def heavy_hitters(ds: rd.Dataset, value_col: str, *, k: int,
                  summary_size: int | None = None) -> pd.DataFrame:
    """EXACT heavy hitters (every value with frequency > n/k) without a
    full-vocabulary shuffle — the two-pass sketch-then-verify pattern:

    1. **Candidate pass (Misra-Gries).** Each batch compresses its
       value_counts to a ≤ ``s``-row MG summary (subtract the (s+1)-th
       largest count, keep positive residuals — Misra & Gries 1982;
       mergeable by summation per Agarwal et al. 2013, "Mergeable
       summaries").  Summaries merge by a keys-only ``grouped_agg`` sum;
       one total-row per batch rides the same exchange under an
       ``is_n`` marker, so the stream length ``n`` needs no second scan.
       With ``s = 4k`` the two compression levels decrement any value by
       at most ``2n/(s+1) < n/(2k)``, so every true heavy hitter keeps
       merged weight > n/(2k); fewer than ``2k`` values can weigh that
       much, so the top-``s`` merged rows are a guaranteed superset of
       the answer.
    2. **Verify pass.** The ≤ ``s`` candidates are broadcast
       (``ray.put`` once, read per task), the input is re-scanned with a
       candidate-filtered per-batch value_counts combiner, and the exact
       counts gate on ``count · k > n``.

    Exactness of the final counts makes the op SQL-twin-checkable
    (``HAVING count(*) * k > total``) while the distributed state stays
    O(s) per block — at 10^10 rows the full GROUP BY would shuffle every
    distinct value instead.  Values are compared as strings.  Returns a
    pandas DataFrame ``(v string, cnt int64)`` sorted by
    (cnt desc, v asc) — ≤ k rows by construction.
    """
    import ray

    from .relational import grouped_agg

    s = summary_size if summary_size is not None else 4 * k
    if s < 2 * k:
        raise ValueError("summary_size must be >= 2k for the MG guarantee")

    def mg_summary(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[value_col].astype(str).value_counts()  # sorted desc
        w = vc.to_numpy(np.int64)
        if len(w) > s:
            w = w - w[s]          # (s+1)-th largest: the MG decrement
            keep = w > 0
            vals, w = vc.index.to_numpy()[keep], w[keep]
        else:
            vals = vc.index.to_numpy()
        out = pd.DataFrame({"v": vals.astype(str), "w": w,
                            "is_n": np.int64(0)})
        total = pd.DataFrame({"v": [""], "w": [np.int64(len(df))],
                              "is_n": [np.int64(1)]})
        return pd.concat([out, total], ignore_index=True)

    merged = grouped_agg(ds.map_batches(mg_summary, batch_format="pandas"),
                         ["is_n", "v"], {"w": ("sum", "w")}).to_pandas()
    n = int(merged.loc[merged["is_n"] == 1, "w"].sum())
    summ = merged[merged["is_n"] == 0].sort_values(
        ["w", "v"], ascending=[False, True], kind="mergesort").head(s)
    cand_ref = ray.put(frozenset(summ["v"].astype(str)))

    def exact_counts(df: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        vc = df[value_col].astype(str).value_counts()
        vc = vc[vc.index.isin(cand)]
        return pd.DataFrame({"v": vc.index.astype(str),
                             "cnt": vc.to_numpy(np.int64)})

    counts = grouped_agg(ds.map_batches(exact_counts, batch_format="pandas"),
                         ["v"], {"cnt": ("sum", "cnt")}).to_pandas()
    if not len(counts):
        return pd.DataFrame({"v": pd.Series(dtype="object"),
                             "cnt": pd.Series(dtype="int64")})
    hh = counts[counts["cnt"].astype("int64") * k > n]
    hh = hh.sort_values(["cnt", "v"], ascending=[False, True],
                        kind="mergesort").reset_index(drop=True)
    hh["cnt"] = hh["cnt"].astype("int64")
    return hh[["v", "cnt"]]


def kmv_pairwise_jaccard(ds: rd.Dataset, group_col: str, value_col: str,
                         *, k: int = 256) -> pd.DataFrame:
    """Pairwise set-similarity estimates between groups via KMV sketches
    (Beyer et al. 2007, "On synopses for distinct-value estimation"):
    each group keeps only its ``k`` smallest distinct ``md5_number_lower``
    value hashes, so comparing G groups ships ≤ G·k u64s instead of the
    full per-group value sets — at 10^10 tokens the exact pairwise Jaccard
    would shuffle every distinct token per source.

    Distributed shape: a per-batch combiner collapses each block to ≤ k
    hashes per group it touches, one keys-only bucketed exchange merges
    the partials (min-k of distinct), and the driver sees only the final
    G·k sketch rows (G = #groups, bounded and small by construction — the
    pairwise output is O(G²) anyway).

    Estimators (all integer / single-division — bit-reproducible in SQL):

    - ``k_used``   = min(k, |distinct union of the two sketches|)
    - ``m``        = how many of the k_used smallest union hashes occur in
      BOTH sketches (any union-top value from set A is necessarily in A's
      sketch, so this is exact over the sample)
    - ``j_est``    = m / k_used  (unrounded double: one IEEE division)
    - ``est_union``= k_used if the union sketch is unsaturated (then it IS
      the exact distinct union), else floor((k-1)·2^64 / h_k) with h_k the
      k-th smallest union hash — exact integer arithmetic on both engines.
    """
    from .dedup import _md5_u64
    from .relational import groupby_buckets

    def partial_sketch(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[[group_col, value_col]].drop_duplicates()
        out_g, out_h = [], []
        for g, grp in pairs.groupby(group_col, sort=False):
            hs = np.unique(np.fromiter(
                (_md5_u64(v) for v in grp[value_col].astype(str)),
                dtype=np.uint64, count=len(grp)))
            hs = hs[:k]  # np.unique sorts ascending → k smallest
            out_g.extend([g] * len(hs))
            out_h.append(hs)
        h = np.concatenate(out_h) if out_h else np.array([], dtype=np.uint64)
        return pd.DataFrame({group_col: pd.Series(out_g, dtype="object"),
                             "h": pd.Series(h, dtype="uint64")})

    def merge_sketch(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for g, grp in df.groupby(group_col, sort=False):
            hs = np.unique(grp["h"].to_numpy("uint64"))[:k]
            parts.append(pd.DataFrame({group_col: g, "h": hs}))
        if not parts:
            return pd.DataFrame({group_col: pd.Series(dtype="object"),
                                 "h": pd.Series(dtype="uint64")})
        return pd.concat(parts, ignore_index=True)

    partials = ds.map_batches(partial_sketch, batch_format="pandas")
    sketches = groupby_buckets(partials, [group_col], merge_sketch).to_pandas()

    by_group = {g: np.sort(grp["h"].to_numpy("uint64"))
                for g, grp in sketches.groupby(group_col, sort=False)}
    groups = sorted(by_group)
    out = {"src_a": [], "src_b": [], "k_used": [], "m": [],
           "j_est": [], "est_union": []}
    for i, a in enumerate(groups):
        for b in groups[i + 1:]:
            ha, hb = by_group[a], by_group[b]
            union = np.union1d(ha, hb)          # sorted distinct
            k_used = min(k, len(union))
            top = union[:k_used]
            m = int(np.isin(top, ha).sum() + np.isin(top, hb).sum()) - k_used
            if len(union) > k:
                hk = int(top[-1])
                est_union = (k - 1) * (1 << 64) // hk
            else:
                est_union = k_used
            out["src_a"].append(a)
            out["src_b"].append(b)
            out["k_used"].append(k_used)
            out["m"].append(m)
            out["j_est"].append(m / k_used if k_used else 0.0)
            out["est_union"].append(est_union)
    res = pd.DataFrame(out)
    for c in ("k_used", "m", "est_union"):
        res[c] = res[c].astype("int64")
    return res.sort_values(["src_a", "src_b"]).reset_index(drop=True)


def hll_count_by(ds: rd.Dataset, group_col: str, value_col: str) -> rd.Dataset:
    """Per-group approximate distinct count of ``value_col``.  Returns
    (group, empty_buckets, est_distinct) — ``est_distinct`` rounded to
    3 dp, with the standard linear-counting correction for small
    cardinalities."""
    from .relational import grouped_agg, groupby_buckets

    def to_rows(df: pd.DataFrame) -> pd.DataFrame:
        r = _rho_rows(df[value_col].astype(str))
        r[group_col] = df[group_col].to_numpy()
        return r[[group_col, "bucket", "rho"]]

    rows = ds.map_batches(to_rows, batch_format="pandas")
    regs = grouped_agg(rows, [group_col, "bucket"], {"M": ("max", "rho")})

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({group_col: df[group_col],
                                 "empty_buckets": pd.Series(dtype="int64"),
                                 "est_distinct": pd.Series(dtype="float64")})
        out = {group_col: [], "empty_buckets": [], "est_distinct": []}
        for g, grp in df.groupby(group_col, sort=False):
            present = len(grp)
            # EXACT integer harmonic sum: Σ 2^(L - M_j), absent buckets
            # contribute 2^L (Python ints — no overflow, no fp order)
            s = (M - present) * (1 << L) + sum(
                1 << (L - int(m_)) for m_ in grp["M"])
            est = (ALPHA * M * M * float(1 << L)) / float(s)
            v = M - present
            if est <= 2.5 * M and v > 0:
                est = M * math.log(M / v)
            out[group_col].append(g)
            out["empty_buckets"].append(v)
            out["est_distinct"].append(round(est, 3))
        res = pd.DataFrame(out)
        res["empty_buckets"] = res["empty_buckets"].astype("int64")
        return res

    return groupby_buckets(regs, [group_col], finalize)


def _hll_estimate(present: int, rhos) -> float:
    """Shared HLL estimate: exact integer harmonic sum + linear-counting
    correction (identical arithmetic to :func:`hll_count_by` and the SQL
    twins)."""
    s = (M - present) * (1 << L) + sum(1 << (L - int(m_)) for m_ in rhos)
    est = (ALPHA * M * M * float(1 << L)) / float(s)
    v = M - present
    if est <= 2.5 * M and v > 0:
        est = M * math.log(M / v)
    return est


def hll_union_by(ds: rd.Dataset, group_col: str, value_col: str) -> pd.DataFrame:
    """Cross-group distinct-union audit from ONE register pass — the HLL
    mergeability payoff (registers merge by per-bucket MAX, so the union
    estimate needs no second corpus scan): per-group registers reduce
    keys-only, the global register table is a second ≤ 64-row max-reduce
    over THOSE, and ``dup_factor = Σ per-group estimates / union
    estimate`` measures cross-group vocabulary overlap (1.0 = disjoint;
    G = identical).  Returns one row
    ``(n_groups, sum_group_est, union_est, dup_factor)``."""
    from .relational import grouped_agg

    def to_rows(df: pd.DataFrame) -> pd.DataFrame:
        r = _rho_rows(df[value_col].astype(str))
        r[group_col] = df[group_col].to_numpy()
        return r[[group_col, "bucket", "rho"]]

    regs = grouped_agg(ds.map_batches(to_rows, batch_format="pandas"),
                       [group_col, "bucket"], {"M": ("max", "rho")}).to_pandas()
    # per-group estimates (register table is ≤ groups × 64 rows)
    ests = [
        _hll_estimate(len(grp), grp["M"])
        for _, grp in regs.groupby(group_col, sort=False)
    ]
    merged = regs.groupby("bucket", sort=False)["M"].max()
    union_est = _hll_estimate(len(merged), merged)
    return pd.DataFrame({
        "n_groups": pd.Series([regs[group_col].nunique()], dtype="int64"),
        "sum_group_est": [round(sum(sorted(ests)), 3)],
        "union_est": [round(union_est, 3)],
        "dup_factor": [round(sum(sorted(ests)) / union_est, 4)],
    })
