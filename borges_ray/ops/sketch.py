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
