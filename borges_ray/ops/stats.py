"""Distributed statistical audits over crawl telemetry and event streams.

The crawl-operations counterpart of the quality filters: burst detection
over the fetch-rate time series, skew audits of the per-host page
distribution (entropy / Gini — is the crawl balanced or is one host
eating the budget?), robust outlier detection on fetch latencies
(median/MAD, which a few timeout rows cannot drag the way mean/stddev
can), and grouped Pearson correlation for metric drill-downs.

Every op follows the repo's exchange discipline: raw rows are collapsed
by a map-side combiner (``grouped_agg``) before anything shuffles, the
driver only ever sees group-cardinality frames (#event-types, #distinct
count values — never row-level data), and the decision rules are exact
integer arithmetic wherever a float boundary could flip a row between
the engine and its SQL twin.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd

from .relational import grouped_agg, grouped_quantile


def burst_windows(events: rd.Dataset, *, type_col: str = "event_type",
                  ts_col: str = "ts", window_us: int = 3_600_000_000,
                  z: int = 3) -> pd.DataFrame:
    """Detect burst windows in an event stream: fixed ``window_us``
    buckets per ``type_col`` whose count exceeds that type's mean by more
    than ``z`` population standard deviations — the classic
    rate-anomaly gate a crawl operator runs over fetch telemetry (and a
    bounded-memory cousin of Kleinberg 2002's burst model: one fixed
    threshold instead of an HMM).

    The z-test is evaluated in EXACT INTEGER arithmetic so the SQL twin
    matches bit-for-bit with no float boundary:  with ``W`` windows,
    ``S = Σc`` and ``SS = Σc²`` per type,

        c > mean + z·std_pop  ⇔  c·W − S > z·√(W·SS − S²)
                              ⇔  c·W − S ≥ isqrt(z²·(W·SS − S²)) + 1,

    so the per-type minimum bursting count ``c₀`` is computed once on
    the driver with Python bigints (no int64 overflow at any scale) and
    broadcast as a tiny dict; the windowed counts are then filtered with
    one vectorized compare.  Exchanges: one keys-only ``grouped_agg`` to
    (type, window) counts, one to per-type (W, S, SS) — both
    combiner-collapsed, proportional to #groups, never #rows.

    Returns a pandas DataFrame ``(type_col, win int64, cnt int64)``
    sorted by (type, win); ``win`` is the epoch bucket index
    ``floor(epoch_us / window_us)``.
    """

    def to_wins(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame({type_col: df[type_col],
                             "win": t // window_us})

    counts = grouped_agg(
        events.select_columns([type_col, ts_col])
              .map_batches(to_wins, batch_format="pandas"),
        [type_col, "win"], {"cnt": ("count", "win")})

    def sq(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["cnt2"] = out["cnt"].astype("int64") ** 2
        return out

    stats = grouped_agg(counts.map_batches(sq, batch_format="pandas"),
                        [type_col],
                        {"w": ("count", "cnt"), "s": ("sum", "cnt"),
                         "ss": ("sum", "cnt2")}).to_pandas()

    thresholds: dict[object, int] = {}
    for _, row in stats.iterrows():
        w, s, ss = int(row["w"]), int(row["s"]), int(row["ss"])
        var_n2 = w * ss - s * s                  # W²·Var — exact, ≥ 0
        d_min = math.isqrt(z * z * var_n2) + 1   # smallest valid c·W − S
        thresholds[row[type_col]] = -(-(s + d_min) // w)  # ceil division

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        c0 = df[type_col].map(thresholds)
        keep = df["cnt"].astype("int64") >= c0.astype("int64")
        out = df[keep]
        return pd.DataFrame({type_col: out[type_col],
                             "win": out["win"].astype("int64"),
                             "cnt": out["cnt"].astype("int64")})

    flagged = counts.map_batches(flag, batch_format="pandas").to_pandas()
    if flagged.empty:   # all-empty blocks can come back schema-less
        flagged = pd.DataFrame({type_col: pd.Series(dtype="object"),
                                "win": pd.Series(dtype="int64"),
                                "cnt": pd.Series(dtype="int64")})
    return (flagged.sort_values([type_col, "win"], kind="mergesort")
                   .reset_index(drop=True))


def skew_audit(ds: rd.Dataset, key_col: str) -> pd.DataFrame:
    """One-row concentration audit of the distribution of row counts per
    ``key_col`` (e.g. pages per host): key count, total rows, Shannon
    entropy (nats), Gini coefficient, and the largest key's share — the
    numbers that tell a crawl operator whether the frontier is balanced
    or a handful of hosts are eating the fetch budget.

    Scale shape: the per-key counts come from one combiner-collapsed
    ``grouped_agg``; entropy/max/total reduce over that counts dataset
    via per-batch partials (the driver sees #blocks rows).  Gini — which
    needs a global rank — is computed WITHOUT a distributed sort: ranks
    of tied values contribute ``c · Σ ranks-in-run``, which depends only
    on the HISTOGRAM of count values, so a second keys-only
    ``grouped_agg`` to (count-value, multiplicity) pairs makes the
    driver-side finish exact Python-bigint arithmetic over a tiny frame:

        Gini = (2·Σᵢ rankᵢ·xᵢ − (n+1)·Σx) / (n·Σx),  x ascending.

    Returns one row ``(n_keys int64, total int64, entropy, gini,
    top_share)`` with the three ratios rounded to 6 decimals (matching a
    DuckDB twin built from ``ln`` / ``row_number`` aggregates).
    """
    counts = grouped_agg(ds.select_columns([key_col]), [key_col],
                         {"c": ("count", key_col)})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy("int64")
        return pd.DataFrame({"n": [np.int64(len(c))],
                             "t": [np.int64(c.sum())],
                             "mx": [np.int64(c.max() if len(c) else 0)],
                             "clnc": [float((c * np.log(c)).sum())]})

    p = counts.map_batches(partial, batch_format="pandas").to_pandas()
    n, total, mx = int(p["n"].sum()), int(p["t"].sum()), int(p["mx"].max())
    clnc = float(p["clnc"].sum())

    hist = grouped_agg(counts, ["c"], {"m": ("count", "c")}).to_pandas()
    hist = hist.sort_values("c", kind="mergesort")
    rank_x, start = 0, 1
    for c, m in zip(hist["c"].astype(int), hist["m"].astype(int)):
        rank_x += c * m * (2 * start + m - 1) // 2   # Σ ranks in tie run
        start += m
    gini = (2 * rank_x - (n + 1) * total) / (n * total)

    return pd.DataFrame({
        "n_keys": pd.Series([n], dtype="int64"),
        "total": pd.Series([total], dtype="int64"),
        "entropy": [round(math.log(total) - clnc / total, 6)],
        "gini": [round(gini, 6)],
        "top_share": [round(mx / total, 6)]})


def robust_outliers(ds: rd.Dataset, key_col: str, value_col: str, *,
                    z: float = 3.0) -> pd.DataFrame:
    """Per-group robust outlier detection via median / MAD (median
    absolute deviation) — the estimator of choice for fetch-latency
    telemetry, where a handful of timeout rows drag a mean/stddev gate
    arbitrarily far but move the median not at all (breakdown point 50%
    vs 0%).

    Three passes, each one combiner-collapsed exchange: (1) per-group
    DISCRETE median via :func:`grouped_quantile` (DuckDB's
    ``quantile_disc`` rule — an exact element, so both engines pick the
    IDENTICAL double and every downstream float op is bit-equal);
    (2) absolute deviations against the broadcast medians, then their
    discrete median (the MAD); (3) a counting scan flagging rows with
    ``|x − med| > z·MAD``.  The medians/MADs travel as tiny driver-side
    dicts (#groups entries), never a shuffle.

    Returns ``(key, med, mad, n int64, n_outliers int64)`` sorted by
    key; ``med``/``mad`` rounded to 6 decimals for display, but the
    outlier gate uses the UNROUNDED values (as the SQL twin does).
    """
    slim = ds.select_columns([key_col, value_col])
    med = grouped_quantile(slim, key_col, value_col, [0.5]).to_pandas()
    med_map = dict(zip(med[key_col], med["q50"]))

    def add_dev(df: pd.DataFrame) -> pd.DataFrame:
        m = df[key_col].map(med_map).to_numpy("float64")
        return pd.DataFrame({key_col: df[key_col],
                             "dev": np.abs(
                                 df[value_col].to_numpy("float64") - m)})

    devs = slim.map_batches(add_dev, batch_format="pandas")
    mad = grouped_quantile(devs, key_col, "dev", [0.5]).to_pandas()
    mad_map = dict(zip(mad[key_col], mad["q50"]))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        cut = df[key_col].map(mad_map).to_numpy("float64") * z
        out = df.copy()
        out["is_out"] = (df["dev"].to_numpy("float64") > cut).astype("int64")
        return out

    agg = grouped_agg(devs.map_batches(flag, batch_format="pandas"),
                      [key_col], {"n": ("count", "dev"),
                                  "n_outliers": ("sum", "is_out")}).to_pandas()
    out = agg.merge(med, on=key_col).merge(
        mad, on=key_col, suffixes=("_med", "_mad"))
    return pd.DataFrame({
        key_col: out[key_col],
        "med": out["q50_med"].round(6),
        "mad": out["q50_mad"].round(6),
        "n": out["n"].astype("int64"),
        "n_outliers": out["n_outliers"].astype("int64"),
    }).sort_values(key_col, kind="mergesort").reset_index(drop=True)


def grouped_corr(ds: rd.Dataset, key_col: str, x_col: str,
                 y_col: str) -> pd.DataFrame:
    """Per-group Pearson correlation in ONE pass: the five cross moments
    (Σx, Σy, Σx², Σy², Σxy) plus the count are map-side combined by
    ``grouped_agg`` — only #groups rows ever shuffle — and the driver
    finishes with

        r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²)),

    which equals the sample-moment ``corr()`` every SQL engine exposes
    (the n vs n−1 convention cancels in the ratio).  Rounded to 6
    decimals — summation order differs across engines, so the last
    couple of double ulps are not contractual.  Groups with zero
    variance on either axis return NULL (as SQL ``corr`` does).

    Returns ``(key, r float64, n int64)`` sorted by key.
    """

    def aug(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy("float64")
        y = df[y_col].to_numpy("float64")
        return pd.DataFrame({key_col: df[key_col], "x": x, "y": y,
                             "xx": x * x, "yy": y * y, "xy": x * y})

    g = grouped_agg(ds.map_batches(aug, batch_format="pandas"), [key_col],
                    {"n": ("count", "x"), "sx": ("sum", "x"),
                     "sy": ("sum", "y"), "sxx": ("sum", "xx"),
                     "syy": ("sum", "yy"), "sxy": ("sum", "xy")}).to_pandas()
    n = g["n"].astype("float64")
    vx = n * g["sxx"] - g["sx"] ** 2
    vy = n * g["syy"] - g["sy"] ** 2
    denom = np.sqrt(vx * vy)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = (n * g["sxy"] - g["sx"] * g["sy"]) / denom
    r = r.where(denom > 0)
    return pd.DataFrame({key_col: g[key_col], "r": r.round(6),
                         "n": g["n"].astype("int64")}).sort_values(
        key_col, kind="mergesort").reset_index(drop=True)


def host_coverage(ds: rd.Dataset, key_col: str,
                  ks: tuple[int, ...] = (1, 10, 100)) -> pd.DataFrame:
    """Cumulative-coverage audit: what fraction of all rows do the top
    1 / 10 / 100 keys own?  The "is the corpus three mega-hosts in a
    trench coat" number that decides whether per-host caps are needed
    before training-data sampling.

    Per-key counts collapse map-side (``grouped_agg``); the global
    top-``max(ks)`` rows come back via the combiner-bounded ``topk``
    (each block forwards ≤ max(ks) candidate rows); totals reduce via
    per-block partial sums.  Shares are exact-integer sums with ONE
    final division, so they hash identically to a SQL
    ``row_number() OVER (ORDER BY c DESC, key)`` twin.

    Returns one row: ``total int64`` plus ``share_top{k}`` (round 6)
    per requested k.
    """
    from .relational import grouped_agg, topk

    counts = grouped_agg(ds.select_columns([key_col]), [key_col],
                         {"c": ("count", key_col)})

    def total_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"t": [np.int64(df["c"].sum())]})

    total = int(counts.map_batches(total_partial, batch_format="pandas")
                      .to_pandas()["t"].sum())
    top = topk(counts, ["c"], max(ks), tiebreak=[key_col])
    c = top["c"].astype("int64").to_numpy()
    out = {"total": pd.Series([total], dtype="int64")}
    for k in ks:
        out[f"share_top{k}"] = [round(int(c[:k].sum()) / total, 6)
                                if total else 0.0]
    return pd.DataFrame(out)


def trimmed_mean(ds: rd.Dataset, key_col: str, value_col: str, *,
                 lo_q: float = 0.05, hi_q: float = 0.95) -> pd.DataFrame:
    """Per-group trimmed mean: the mean of values inside the
    [lo_q, hi_q] DISCRETE-quantile band — the robust central-tendency
    number for latency/quality dashboards where a handful of timeouts
    or zeros would drag the plain mean.

    Two combiner-collapsed passes: per-group discrete quantile cut
    points via :func:`grouped_quantile` (exact elements, so the band
    test ``lo ≤ v ≤ hi`` is bit-identical to the SQL twin's BETWEEN),
    broadcast as a tiny dict, then a filtered sum/count
    ``grouped_agg``.  Returns ``(key, tmean round-6, n_kept int64)``
    sorted by key.
    """
    qcols = [f"q{int(lo_q * 100)}", f"q{int(hi_q * 100)}"]
    slim = ds.select_columns([key_col, value_col])
    cuts = grouped_quantile(slim, key_col, value_col,
                            [lo_q, hi_q]).to_pandas()
    lo_map = dict(zip(cuts[key_col], cuts[qcols[0]]))
    hi_map = dict(zip(cuts[key_col], cuts[qcols[1]]))

    def keep_band(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy("float64")
        lo = df[key_col].map(lo_map).to_numpy("float64")
        hi = df[key_col].map(hi_map).to_numpy("float64")
        m = (v >= lo) & (v <= hi)
        return pd.DataFrame({key_col: df[key_col][m], "v": v[m]})

    agg = grouped_agg(slim.map_batches(keep_band, batch_format="pandas"),
                      [key_col], {"s": ("sum", "v"),
                                  "n_kept": ("count", "v")}).to_pandas()
    return pd.DataFrame({
        key_col: agg[key_col],
        "tmean": (agg["s"] / agg["n_kept"]).round(6),
        "n_kept": agg["n_kept"].astype("int64"),
    }).sort_values(key_col, kind="mergesort").reset_index(drop=True)




def exact_quantile(ds: rd.Dataset, value_col: str, qs: list[float], *,
                   n_bins: int = 4096,
                   pull_limit: int = 200_000) -> pd.DataFrame:
    """EXACT global discrete quantiles of one column by distributed
    SELECTION — no sort and no value shuffle, ever: binary search on the
    VALUE SPACE with histogram refinement (the classic huge-stream
    median shape).

    Round 0 reduces (count, min, max) per block.  Each later round bins
    the surviving candidate set into ``n_bins`` buckets — a keys-only
    count exchange of ≤ n_bins rows regardless of input size — and
    walks the cumulative histogram to the bucket holding the target
    rank ``r = ceil(q·n)`` (DuckDB's ``quantile_disc`` rule).  When a
    bucket's population falls under ``pull_limit``, its values are
    pulled with one filtered scan and the rank is answered exactly.

    Float-boundary discipline: bucket membership is defined ONLY by the
    floor rule ``floor((v − lo)/width) == b`` and that exact predicate
    chain is re-applied verbatim in every later round and in the final
    pull — never re-derived as an interval test, whose rounded
    endpoints could disagree with the floor by one ulp and silently
    shift the rank bookkeeping.

    Three or four scans end-to-end for doubles at any scale.  Returns
    one row with a ``q{int(q*100)}`` column per requested q — exact
    elements of the input, bit-identical to the SQL twin.
    """

    def cmm(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].dropna()
        if not len(v):
            return pd.DataFrame({"n": pd.Series(dtype="int64"),
                                 "lo": pd.Series(dtype="float64"),
                                 "hi": pd.Series(dtype="float64")})
        return pd.DataFrame({"n": [np.int64(len(v))],
                             "lo": [float(v.min())], "hi": [float(v.max())]})

    base = ds.select_columns([value_col])
    g = base.map_batches(cmm, batch_format="pandas").to_pandas()
    n = int(g["n"].sum())
    glo, ghi = float(g["lo"].min()), float(g["hi"].max())
    out: dict[str, list[float]] = {}

    def member(v: np.ndarray, chain) -> np.ndarray:
        # EXACTLY the binning rule `hist` applies (incl. the clip to
        # [0, n_bins-1]) so a value an ulp outside its bucket's nominal
        # interval lands identically in count, recurse, and pull
        m = np.ones(len(v), dtype=bool)
        for lo_i, w_i, b_i in chain:
            bb = np.clip(np.floor((v - lo_i) / w_i), 0, n_bins - 1)
            m &= bb == b_i
        return m

    for q in qs:
        r = max(1, int(math.ceil(q * n)))        # 1-based target rank
        lo, hi, below = glo, ghi, 0              # `below` = ranks < bucket
        chain: list[tuple[float, float, int]] = []

        while True:
            if lo >= hi:
                out[f"q{int(q * 100)}"] = [lo]
                break
            width = (hi - lo) / n_bins

            def hist(df: pd.DataFrame, lo=lo, width=width,
                     chain=tuple(chain)) -> pd.DataFrame:
                v = df[value_col].dropna().to_numpy("float64")
                v = v[member(v, chain)]
                b = np.clip(np.floor((v - lo) / width),
                            0, n_bins - 1).astype("int64")
                cnt = np.bincount(b, minlength=n_bins)
                nz = np.flatnonzero(cnt)
                return pd.DataFrame({"b": nz.astype("int64"),
                                     "m": cnt[nz].astype("int64")})

            h = grouped_agg(base.map_batches(hist, batch_format="pandas"),
                            ["b"], {"m": ("sum", "m")}).to_pandas()
            h = h.sort_values("b", kind="mergesort")
            cum = below + h["m"].cumsum().to_numpy("int64")
            idx = int(np.searchsorted(cum, r, side="left"))
            b = int(h["b"].iloc[idx])
            in_bucket = int(h["m"].iloc[idx])
            below = int(cum[idx]) - in_bucket
            chain = chain + [(lo, width, b)]

            if in_bucket <= pull_limit:
                def pull(df: pd.DataFrame, chain=tuple(chain)
                         ) -> pd.DataFrame:
                    v = df[value_col].dropna().to_numpy("float64")
                    return pd.DataFrame({"v": v[member(v, chain)]})

                vals = np.sort(base.map_batches(
                    pull, batch_format="pandas").to_pandas()["v"]
                    .to_numpy("float64"))
                out[f"q{int(q * 100)}"] = [float(vals[r - below - 1])]
                break
            # next round: re-bin only inside the chosen bucket
            lo = lo + b * width
            hi = min(hi, lo + width)

    return pd.DataFrame(out)


def percentile_rank(ds: rd.Dataset, key_col: str, value_col: str, *,
                    id_col: str, out_col: str = "prank") -> rd.Dataset:
    """Per-group percentile rank of every row — the score-calibration
    step that makes quality thresholds comparable ACROSS groups (a
    0.9-percentile Hindi doc and a 0.9-percentile English doc survive
    the same global cut even when their raw score scales differ).

    SQL ``percent_rank() OVER (PARTITION BY key ORDER BY value)``
    semantics exactly: ties share the RANK of their first member and
    ``prank = (rank − 1) / (n_group − 1)`` (0 for singleton groups).
    One bucketed exchange on the group key, then a vectorized
    searchsorted per group block.  ``id_col`` rides through so callers
    can join the calibrated score back; it plays no role in the rank
    (ties stay ties, as in SQL).

    Returns ``(id_col, key_col, value_col, out_col round-6)``.
    """
    from .relational import groupby_buckets

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, value_col], kind="mergesort")
        out = []
        for _, g in df.groupby(key_col, sort=False):
            v = g[value_col].to_numpy()
            n = len(v)
            if n == 1:
                pr = np.zeros(1)
            else:
                rank = np.searchsorted(v, v, side="left") + 1  # ties→first
                pr = (rank - 1) / (n - 1)
            out.append(pd.DataFrame({
                id_col: g[id_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                value_col: v,
                out_col: np.round(pr, 6)}))
        if not out:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 key_col: df[key_col],
                                 value_col: df[value_col],
                                 out_col: pd.Series(dtype="float64")})
        return pd.concat(out, ignore_index=True)

    return groupby_buckets(ds.select_columns([id_col, key_col, value_col]),
                           [key_col], per_bucket)
