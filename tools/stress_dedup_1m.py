"""1M-page MinHash near-dup dedup stress — the scale regime the sf0.1
bench can't reach (blob exchange ~11 GB, candidate pairs ~1.4M).

Two modes:

* default: raw synthetic corpus (no planted duplicates) — exercises the
  full chain; random 400-1000-word bodies yield 0 true pairs, so the
  expected output is ``verified pairs: 0`` and ``survivors: 1000000``.
* ``--planted``: ~3% of docs are overwritten with per-cluster template
  text (cluster = (h//100) % 10000, variant = h % 100 in {0,1,2};
  variants differ by 3 of 300 tokens, J ≈ 0.9).  Ground-truth pair and
  survivor counts are computed driver-side from the url hashes and
  asserted EXACTLY against the engine — the planted-cluster fixture uses
  per-cluster RNG tokens, not an arithmetic token formula (which planted
  ~700k accidental cross-cluster shifted near-dups in an early version).

Corpus build (once): tools/stress_dedup_1m.py --build
Usage: PYTHONPATH=/root/repo python tools/stress_dedup_1m.py [--build] [--planted]
       PYTHONPATH=/root/repo python tools/stress_dedup_1m.py --exact-substr [--planted] [--frac N]

History this file pins down: the union→sort verify shape livelocked at
this scale (preserve-order UnionOperator buffers its whole input; see
borges_ray.ops.relational.cogroup_spill).  With the disk-bucketed
cogroup the full chain runs 1M docs in ~206-212 s on 32 sandbox CPUs.
"""
import math
import os
import sys
import time

import numpy as np
import pandas as pd
import ray

ROOT = "/tmp/borges_scale_1m"
PAGES = os.path.join(ROOT, "pages")


def build_corpus() -> None:
    import shutil

    from borges_ray.stages.fetch import write_pages_bucketed_ds
    from borges_ray.synth import synth_pages_dataset

    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    t0 = time.time()
    ds = synth_pages_dataset(42, 1_000_000, chunk=8000, words_lo=400, words_hi=1000)
    write_pages_bucketed_ds(
        ds.map_batches(lambda t: t.select(["url", "html"]), batch_format="pyarrow"),
        PAGES, 64)
    open(os.path.join(ROOT, "_DONE"), "w").close()
    print(f"corpus build: {time.time()-t0:.1f}s", flush=True)


def template_text(cluster: int, variant: int) -> str:
    rng = np.random.default_rng(cluster + 1)
    toks = [f"w{t}" for t in rng.integers(0, 50021, 300)]
    for k in range(3):
        toks[(variant * 17 + k * 41) % 300] = f"v{variant}x{k}"
    return " ".join(toks)


def main(planted: bool) -> int:
    import ray.data as rd

    from borges_ray.canonical import stable_hash
    from borges_ray.extract import extract_text
    from borges_ray.ops.dedup import dedup_survivors_ds, minhash_near_dup_pairs_ds
    from borges_ray.ops.relational import _spill_point_n

    def to_docs(df):
        h = np.array([stable_hash(u) for u in df["url"]], dtype=np.uint64)
        texts = []
        for u_h, html in zip(h, df["html"]):
            hv = int(u_h)
            if planted and hv % 100 < 3:
                texts.append(template_text((hv // 100) % 10000, hv % 100))
            else:
                texts.append(extract_text(html))
        return pd.DataFrame({"doc_id": h.view(np.int64), "text": texts})

    T0 = time.time()
    pages = rd.read_parquet(PAGES, columns=["url", "html"],
                            override_num_blocks=128)
    docs = pages.map_batches(to_docs, batch_format="pandas")

    t = time.time()
    verified = minhash_near_dup_pairs_ds(docs, "doc_id", threshold=0.7)
    verified, _ = _spill_point_n(verified, "stress_ver")
    n_ver = verified.count()
    print(f"STAGE sign+band+verify: {time.time()-t:.1f}s; "
          f"verified pairs: {n_ver}", flush=True)

    t = time.time()
    ids_only = rd.read_parquet(PAGES, columns=["url"],
                               override_num_blocks=64).map_batches(
        lambda df: pd.DataFrame({"doc_id": np.array(
            [stable_hash(u) for u in df["url"]],
            dtype=np.uint64).view(np.int64)}), batch_format="pandas")
    surv = dedup_survivors_ds(ids_only, verified, "doc_id")
    n_surv = surv.count()
    print(f"STAGE cc+survivors: {time.time()-t:.1f}s; survivors: {n_surv}",
          flush=True)
    print(f"TOTAL: {time.time()-T0:.1f}s over 1M docs", flush=True)

    if not planted:
        return 0

    import collections

    urls = rd.read_parquet(PAGES, columns=["url"]).to_pandas()["url"]
    h = np.array([stable_hash(u) for u in urls], dtype=np.uint64)
    key = (h[h % 100 < 3] // 100) % 10000
    sizes = collections.Counter(key.tolist())
    true_pairs = sum(n * (n - 1) // 2 for n in sizes.values())
    true_surv = len(h) - sum(n - 1 for n in sizes.values())
    ok = n_ver == true_pairs and n_surv == true_surv
    print(f"GROUND TRUTH pairs={true_pairs} survivors={true_surv} "
          f"MATCH={ok}", flush=True)
    return 0 if ok else 1




def main_exact_substr(planted: bool, frac: int) -> int:
    """ExactSubstr window-removal at stress scale: the occurrence table is
    O(corpus tokens) keys-only rows (vs MinHash's fixed-width signatures),
    so this mode exercises a ~10x larger intermediate than the near-dup
    chain.  ``--frac N`` keeps every Nth doc (by hash) to fit the run
    in a time budget; the windows table is ~700 rows per doc.

    Planted-mode exact assertion: docs sharing an IDENTICAL planted text
    (same cluster+variant) must come back EMPTY except the group's min
    doc_id — every window of a non-min doc exists at the same position in
    the group min, which always outranks it."""
    import ray as _ray
    import ray.data as rd

    from borges_ray.canonical import stable_hash
    from borges_ray.extract import extract_text
    from borges_ray.ops.ccnet import exact_substr_rewrite
    from borges_ray.ops.relational import _spill_point_n

    # dense-rank the 64-bit url hashes into [0, n): the packed
    # (doc_id << 21 | start) rank encoding requires doc_id < 2^42, which
    # raw hash ids overflow (exact_substr_rewrite now raises on that).
    # One sorted u64 array broadcast once — the standard compact-id
    # assignment step a real corpus does before rank-packed operators.
    T0 = time.time()
    all_urls = rd.read_parquet(PAGES, columns=["url"]).to_pandas()["url"]
    h_all = np.sort(np.array([stable_hash(u) for u in all_urls],
                             dtype=np.uint64))
    if frac > 1:
        h_all = h_all[h_all % np.uint64(frac) == 0]
    id_ref = _ray.put(h_all)

    def to_docs(df):
        h = np.array([stable_hash(u) for u in df["url"]], dtype=np.uint64)
        keep = (h % np.uint64(frac) == 0) if frac > 1 else np.ones(len(h), dtype=bool)
        sorted_h = _ray.get(id_ref)
        texts, hh = [], []
        for u_h, html, k in zip(h, df["html"], keep):
            if not k:
                continue
            hv = int(u_h)
            hh.append(hv)
            if planted and hv % 100 < 3:
                texts.append(template_text((hv // 100) % 10000, hv % 100))
            else:
                texts.append(extract_text(html))
        dense = np.searchsorted(sorted_h, np.array(hh, dtype=np.uint64))
        return pd.DataFrame({"doc_id": dense.astype(np.int64),
                             "text": texts})

    pages = rd.read_parquet(PAGES, columns=["url", "html"],
                            override_num_blocks=128)
    docs = pages.map_batches(to_docs, batch_format="pandas")
    n_in = docs.count()
    print(f"STAGE docs: {time.time()-T0:.1f}s; docs in: {n_in}", flush=True)

    t = time.time()
    out = exact_substr_rewrite(docs, width=5, n_buckets=64)
    out, _ = _spill_point_n(out, "stress_xsub")
    n_out = out.count()
    removed = out.sum("n_removed")
    toks = out.sum("n_tokens")
    print(f"STAGE exact_substr: {time.time()-t:.1f}s; rows: {n_out}; "
          f"tokens: {toks}; removed: {removed} "
          f"({removed/max(toks,1):.4%})", flush=True)
    print(f"TOTAL: {time.time()-T0:.1f}s over {n_in} docs", flush=True)
    ok = n_out == n_in
    if planted:
        import collections

        ph = h_all[h_all % 100 < 3]
        groups: dict[tuple[int, int], list[int]] = collections.defaultdict(list)
        for hv in ph.tolist():
            groups[((hv // 100) % 10000, hv % 100)].append(hv)
        # winner order is the engine's dense id = rank of the u64 hash,
        # so group minima in u64 order map to minima in id order
        expect_ids = set()
        for v in groups.values():
            if len(v) < 2:
                continue
            dense = sorted(int(np.searchsorted(h_all,
                                               np.uint64(x))) for x in v)
            expect_ids.update(dense[1:])
        # collect ONLY the planted rows (bounded: ~30k)
        import ray as _ray

        ref = _ray.put(expect_ids)

        def pick(df):
            s = _ray.get(ref)
            m = df[df["doc_id"].isin(s)]
            return m[["doc_id", "n_tokens", "n_removed"]]

        got = out.map_batches(pick, batch_format="pandas").to_pandas()
        bad = got[got["n_removed"] != got["n_tokens"]]
        print(f"planted groups>1 non-min docs: {len(expect_ids)}; "
              f"collected: {len(got)}; not-fully-removed: {len(bad)}",
              flush=True)
        ok = ok and len(got) == len(expect_ids) and len(bad) == 0
    print(f"MATCH={ok}", flush=True)
    return 0 if ok else 1


def main_filter_chain() -> int:
    """The standard pre-training FILTER CHAIN at 1M pages: extract →
    Gopher rule bundle → lang tag → CCNet-normalized exact dedup — one
    streaming pipeline, throughput reported as pages/s.

    Correctness at scale: (a) rows preserved through the flag pass,
    (b) ``keep`` equals the AND of its flags corpus-wide (counted
    distributed), (c) a 4k-page sample is re-scored with a pure-python
    reference and compared field-by-field."""
    import re as _re

    import ray.data as rd

    from borges_ray.extract import extract_text, tag_lang_batch
    from borges_ray.ops.relational import spill_point
    from borges_ray.ops.textops import (GOPHER_REQUIRED, GopherRules,
                                        normalized_dedup)

    T0 = time.time()
    pages = rd.read_parquet(PAGES, columns=["url", "html"],
                            override_num_blocks=128)

    def to_docs(df):
        from borges_ray.canonical import stable_hash

        h = np.array([stable_hash(u) for u in df["url"]], dtype=np.uint64)
        texts = [extract_text(x) for x in df["html"]]
        return pd.DataFrame({"doc_id": h.view(np.int64), "text": texts,
                             "lang": tag_lang_batch(texts)})

    docs = pages.map_batches(to_docs, batch_format="pandas")
    rules = GopherRules(min_words=300, max_words=900, mwl_lo=(3, 1),
                        mwl_hi=(8, 1), min_req_hits=0)

    def flags_keep_text(df):
        out = rules(df)
        out["text"] = df["text"]
        return out

    # the extract+flag stage is consumed three times (census, dedup,
    # sample cross-check): checkpoint it ONCE so the expensive
    # extract_text pass runs once, not per consumer — the same
    # spill-after-the-expensive-stage shape a 100 TB run would use
    t = time.time()
    flagged = spill_point(
        docs.map_batches(flags_keep_text, batch_format="pandas"),
        "fc_flags", target_bytes=64 << 20)
    print(f"STAGE extract+flags (spilled): {time.time()-t:.1f}s", flush=True)

    t = time.time()
    agg = flagged.map_batches(lambda df: pd.DataFrame({
        "rows": [len(df)],
        "kept": [int(df["keep"].sum())],
        "consistent": [int((df["keep"] == (df["ok_words"] & df["ok_mwl"]
                            & df["ok_sym"] & df["ok_alpha"]
                            & df["ok_req"])).sum())],
    }), batch_format="pandas").to_pandas().sum()
    print(f"STAGE gopher flags: {time.time()-t:.1f}s; rows={agg['rows']} "
          f"kept={agg['kept']} flag-consistent={agg['consistent']}",
          flush=True)
    assert agg["rows"] == agg["consistent"], "keep != AND(flags) somewhere"

    t = time.time()
    kept = flagged.map_batches(
        lambda df: df.loc[df["keep"], ["doc_id", "text"]],
        batch_format="pandas")
    surv = normalized_dedup(kept)
    n_surv = surv.count()
    dt_total = time.time() - T0
    print(f"STAGE norm dedup: {time.time()-t:.1f}s; survivors={n_surv}",
          flush=True)
    print(f"TOTAL filter chain: {dt_total:.1f}s over 1M pages "
          f"({1_000_000/dt_total:.0f} pages/s)", flush=True)

    # sampled pure-python cross-check
    t = time.time()
    sample = flagged.map_batches(
        lambda df: df[df["doc_id"] % 256 == 7],
        batch_format="pandas").to_pandas()
    bad = 0
    for _i, row in sample.iterrows():
        toks = row["text"].split()
        nw, wc = len(toks), sum(len(w) for w in toks)
        na = sum(1 for w in toks if _re.search("[A-Za-z]", w))
        ns = row["text"].count("#") + row["text"].count("...")
        hits = sum(1 for r in GOPHER_REQUIRED
                   if r in {w.lower() for w in toks})
        exp_keep = ((300 <= nw <= 900) and (wc >= 3 * nw and wc <= 8 * nw)
                    and (10 * ns < nw) and (5 * na >= 4 * nw)
                    and hits >= 0)
        if (row["n_words"] != nw or row["word_chars"] != wc
                or row["req_hits"] != hits or bool(row["keep"]) != exp_keep):
            bad += 1
    print(f"SAMPLE cross-check: {len(sample)} docs, {bad} mismatches "
          f"({time.time()-t:.1f}s)", flush=True)
    return 0 if bad == 0 else 1


def main_redirects() -> int:
    """Pointer-doubling redirect resolution at 4M edges: chains up to
    255 hops (needing all 8 doubling rounds) plus planted cycles — the
    regime where a sequential per-hop walk would need 255 exchanges and
    a driver-side walk would hold the whole map in memory.

    Ground truth is arithmetic: id i steps down to i-1 until a multiple
    of 256 (terminal), so final(i) = i - i%256, hops(i) = i%256 — except
    ids whose block contains the planted 2-cycle (i%100000 in {777,778}),
    whose descent gets trapped.  The engine output is checked EXACTLY,
    corpus-wide, by a distributed comparison pass (no driver pandas)."""
    import ray.data as rd

    from borges_ray.ops.graph import redirect_resolve

    N = 4_000_000
    T0 = time.time()

    def mk_edges(df):
        d = df["id"].to_numpy(np.int64)
        m = d % 100000
        is_src = (m == 777) | (m == 778) | (d % 256 != 0)
        d = d[is_src]
        dst = np.where(d % 100000 == 777, d + 1, d - 1)
        return pd.DataFrame({"src": d, "dst": dst})

    edges = rd.range(N).map_batches(
        lambda df: pd.DataFrame({"id": df["id"]}), batch_format="pandas"
    ).map_batches(mk_edges, batch_format="pandas")

    out = redirect_resolve(edges, max_rounds=8)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src"].to_numpy(np.int64)
        # trapped: descent passes the cycle pair (777/778 within the same
        # 100000-block) before reaching a multiple of 256.  The pair sits
        # at block+777/778; ids in (block+777, block+778+?]: any src whose
        # path [i - i%256, i] contains 778 is trapped, plus 777 itself.
        blk = (s // 100000) * 100000
        c778 = blk + 778
        lo = s - (s % 256)
        trapped = ((s % 100000) == 777) | ((c778 >= lo) & (c778 <= s)
                                           & ((s % 100000) != 777))
        exp_final = np.where(trapped, -1, s - (s % 256))
        exp_hops = np.where(trapped, -1, s % 256)
        ok = ((df["final_id"].to_numpy(np.int64) == exp_final)
              & (df["hops"].to_numpy(np.int64) == exp_hops)
              & (df["resolved"].to_numpy(bool) == ~trapped))
        return pd.DataFrame({"rows": [len(df)], "bad": [int((~ok).sum())],
                             "unresolved": [int(trapped.sum())]})

    agg = out.map_batches(check, batch_format="pandas").to_pandas().sum()
    dt = time.time() - T0
    print(f"REDIRECT 4M edges: {dt:.1f}s ({N / dt:.0f} edges/s); "
          f"rows={agg['rows']} bad={agg['bad']} "
          f"unresolved={agg['unresolved']}", flush=True)
    # every source row must come back exactly once (cycle ids are never
    # multiples of 256 — 777 is odd, 778 mod 32 != 0 — so sources are
    # exactly the non-multiples)
    n_src = N - N // 256
    assert agg["rows"] == n_src, (agg["rows"], n_src)
    return 0 if agg["bad"] == 0 else 1


def main_pagerank() -> int:
    """Partitioned-edge PageRank at 2M nodes / 2M edges with an EXACT
    analytic check: on a directed ring (every node's out-degree and
    in-degree are exactly 1) the uniform vector 1/N is a fixed point of
    the damped iteration, so after any number of iterations every rank
    must equal round(1/N, 9) exactly.  Any mass mis-routing in the
    bucket exchange (dropped contributions, double counts, wrong
    out-degrees) breaks uniformity immediately and is counted
    distributed — the driver sees only (rows, bad)."""
    import ray.data as rd

    from borges_ray.ops.graph import pagerank

    N = 2_000_000
    T0 = time.time()

    def mk_ring(df):
        d = df["id"].to_numpy(np.int64)
        return pd.DataFrame({"src": d, "dst": (d + 1) % N})

    edges = rd.range(N).map_batches(mk_ring, batch_format="pandas")
    out = pagerank(edges, iters=2, damping=0.85, round_to=9, n_buckets=32)

    # every node's arithmetic is bitwise identical on the ring, so
    # replicate the engine's float sequence exactly (1/N is a fixed
    # point only up to ulp)
    r = 1.0 / N
    for _ in range(2):
        r = (1.0 - 0.85) / N + 0.85 * r
    expect = round(r, 9)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        bad = int((df["rank"].to_numpy(np.float64) != expect).sum())
        return pd.DataFrame({"rows": [len(df)], "bad": [bad]})

    agg = out.map_batches(check, batch_format="pandas").to_pandas().sum()
    dt = time.time() - T0
    print(f"PAGERANK ring 2M nodes: {dt:.1f}s ({N / dt:.0f} nodes/s); "
          f"rows={agg['rows']} bad={agg['bad']}", flush=True)
    assert agg["rows"] == N, agg
    return 0 if agg["bad"] == 0 else 1


def main_bfs() -> int:
    """Level-synchronous BFS at 2M nodes / ~4M edges with an EXACT
    analytic check: on the complete binary tree (i → 2i+1, 2i+2) the
    depth of node i from root 0 is bit_length(i+1) - 1.  The frontier
    DOUBLES every hop (final hop ~1M nodes), so the per-hop keys-only
    exchange and the anti-join against visited run at real sizes; any
    dropped frontier node, duplicate visit, or wrong-hop label breaks
    the closed form and is counted distributed."""
    import ray.data as rd

    from borges_ray.ops.graph import bfs_depths

    N = 2_000_000
    T0 = time.time()

    def mk_tree(df):
        i = df["id"].to_numpy(np.int64)
        src = np.concatenate([i, i])
        dst = np.concatenate([2 * i + 1, 2 * i + 2])
        keep = dst < N
        return pd.DataFrame({"src": src[keep], "dst": dst[keep]})

    edges = rd.range(N).map_batches(mk_tree, batch_format="pandas")
    out = bfs_depths(edges, [0], max_hops=21, n_buckets=32)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy(np.int64)
        want = np.int64(np.floor(np.log2(node + 1)))
        bad = int((df["depth"].to_numpy(np.int64) != want).sum())
        return pd.DataFrame({"rows": [len(df)], "bad": [bad]})

    agg = out.map_batches(check, batch_format="pandas").to_pandas().sum()
    dt = time.time() - T0
    print(f"BFS binary tree 2M nodes: {dt:.1f}s ({N / dt:.0f} nodes/s); "
          f"rows={agg['rows']} bad={agg['bad']}", flush=True)
    assert agg["rows"] == N, agg
    return 0 if agg["bad"] == 0 else 1


def main_reciprocity() -> int:
    """Link reciprocity at 4M nodes / 3M distinct edges with an EXACT
    combinatorial check: nodes pair up (2p, 2p+1); even pairs link BOTH
    ways, odd pairs forward only, every edge is emitted twice and every
    node adds a self-loop — so distinct must collapse 10M raw rows to
    exactly 3M edges of which exactly 2M are reciprocal (ratio 2/3).
    Any duplicate surviving distinct, any self-loop leaking, or any
    semi-join probe mis-bucketing moves one of the three integers."""
    import ray.data as rd

    from borges_ray.ops.graph import reciprocity

    N = 4_000_000
    T0 = time.time()

    def mk_edges(df):
        i = df["id"].to_numpy(np.int64)
        ev = i[i % 2 == 0]
        fwd_src, fwd_dst = ev, ev + 1                      # every pair: fwd
        mut = ev[(ev // 2) % 2 == 0]                       # even pairs: back
        back_src, back_dst = mut + 1, mut
        src = np.concatenate([fwd_src, back_src, fwd_src, back_src, i])
        dst = np.concatenate([fwd_dst, back_dst, fwd_dst, back_dst, i])
        return pd.DataFrame({"src": src, "dst": dst})

    edges = rd.range(N).map_batches(mk_edges, batch_format="pandas")
    out = reciprocity(edges).to_pandas()
    dt = time.time() - T0
    row = out.iloc[0]
    n_edges, n_recip = int(row["n_edges"]), int(row["n_recip"])
    print(f"RECIPROCITY 4M nodes: {dt:.1f}s ({n_edges / dt:.0f} edges/s); "
          f"n_edges={n_edges} n_recip={n_recip} r={row['reciprocity']}",
          flush=True)
    ok = (n_edges == 3_000_000 and n_recip == 2_000_000
          and float(row["reciprocity"]) == round(2 / 3, 6))
    return 0 if ok else 1


def main_powerlaw() -> int:
    """Degree power-law fit at ~2.1M edge rows with an EXACT closed
    form: for k = 0..10, 4^(10-k) nodes carry degree 2^k, so the
    log-log histogram points (k ln2, (10-k) ln4) are perfectly
    collinear — slope EXACTLY -2, intercept 10 ln4, 11 points.  Any
    dropped histogram row, double-counted degree, or partial-sum mixup
    in the five-scalar reduce bends the line."""
    import ray.data as rd

    from borges_ray.ops.graph import degree_powerlaw

    K = 10
    rows_k = np.array([4 ** K >> k for k in range(K + 1)], dtype=np.int64)
    row_start = np.concatenate(([0], np.cumsum(rows_k)))
    node_base = np.concatenate(
        ([0], np.cumsum([4 ** (K - k) for k in range(K + 1)]))).astype(np.int64)
    total = int(row_start[-1])
    T0 = time.time()

    def mk_ids(df):
        r = df["id"].to_numpy(np.int64)
        k = np.searchsorted(row_start, r, side="right") - 1
        node = node_base[k] + ((r - row_start[k]) >> k)
        return pd.DataFrame({"node": node})

    ids = rd.range(total).map_batches(mk_ids, batch_format="pandas")
    out = degree_powerlaw(ids).to_pandas()
    dt = time.time() - T0
    row = out.iloc[0]
    print(f"POWERLAW {total} rows: {dt:.1f}s ({total / dt:.0f} rows/s); "
          f"slope={row['slope']} intercept={row['intercept']} "
          f"n_points={int(row['n_points'])}", flush=True)
    ok = (int(row["n_points"]) == K + 1
          and float(row["slope"]) == -2.0
          and float(row["intercept"]) == round(K * np.log(4.0), 6))
    return 0 if ok else 1


def main_heavy_hitters() -> int:
    """Exact heavy hitters at 10M rows with a closed-form answer: hot
    values h0..h9 planted with counts (10-v)·100k (5.5M rows) over a
    4.5M-unique tail that floods every per-batch Misra-Gries summary
    with weight-1 junk.  With k=50 the gate is count > 200_000, so the
    answer is EXACTLY h0..h7 with their planted counts — h8 sits ON the
    boundary (200_000, strict > excludes it) and the tail must
    contribute nothing.  Any candidate lost in the summary merge, any
    double-counted batch, or an off-by-one in the gate flips a row."""
    import ray.data as rd

    from borges_ray.ops.sketch import heavy_hitters

    counts = np.array([(10 - v) * 100_000 for v in range(10)],
                      dtype=np.int64)
    cum = np.concatenate(([0], np.cumsum(counts)))
    hot_total, total = int(cum[-1]), 10_000_000
    T0 = time.time()

    def mk_vals(df):
        r = df["id"].to_numpy(np.int64)
        out = np.empty(len(r), dtype=object)
        hot = r < hot_total
        v = np.searchsorted(cum, r[hot], side="right") - 1
        out[hot] = np.char.add("h", v.astype("U2"))
        out[~hot] = np.char.add("t", r[~hot].astype("U9"))
        return pd.DataFrame({"v": out})

    ds = rd.range(total).map_batches(mk_vals, batch_format="pandas")
    out = heavy_hitters(ds, "v", k=50)
    dt = time.time() - T0
    got = list(zip(out["v"], out["cnt"].astype(int)))
    want = [(f"h{v}", int(counts[v])) for v in range(8)]
    print(f"HEAVY_HITTERS {total} rows: {dt:.1f}s ({total / dt:.0f} rows/s); "
          f"{len(got)} hitters, top={got[:3]}", flush=True)
    return 0 if got == want else 1


def main_exact_quantile() -> int:
    """Distributed selection at 2^25 (~33.5M) rows with a closed form:
    values are the EXACT multiset {1..N} delivered in scrambled order
    (odd-multiplier bijection mod 2^25), so quantile_disc(q) must
    return exactly ceil(q·N) — any off-by-one in the rank bookkeeping,
    any histogram bucket miscount across refinement rounds, or any
    float-boundary drift between the count pass and the pull pass moves
    an answer by at least 1."""
    import ray.data as rd

    from borges_ray.ops.stats import exact_quantile

    N = 1 << 25
    MUL = 2654435761 % N  # odd → bijection mod 2^25
    T0 = time.time()

    def mk_vals(df):
        r = df["id"].to_numpy(np.int64)
        return pd.DataFrame({"v": ((r * MUL) % N + 1).astype("float64")})

    ds = rd.range(N).map_batches(mk_vals, batch_format="pandas")
    qs = [0.5, 0.9, 0.999]
    out = exact_quantile(ds, "v", qs)
    dt = time.time() - T0
    got = [float(out[f"q{int(q * 100)}"].iloc[0]) for q in qs]
    want = [float(math.ceil(q * N)) for q in qs]
    print(f"EXACT_QUANTILE {N} rows: {dt:.1f}s ({N / dt:.0f} rows/s); "
          f"got={got} want={want}", flush=True)
    return 0 if got == want else 1


def main_cocitation() -> int:
    """Co-citation at a ~31M-row pair fan-out with a closed form: 8192
    disjoint groups, each with 32 sources all citing the SAME 16
    targets (every edge emitted twice to exercise the distinct), so
    every within-group target pair is co-cited by EXACTLY 32 sources
    and nothing crosses groups.  All counts tie at 32, so the top-100
    is the first 100 (x, y) pairs of group 0 in lexicographic order —
    a pure combinatorial expectation; any lost wedge, mis-bucketed
    packed key, or tie-break drift in the combiner-bounded top-k moves
    a row."""
    import itertools

    import ray.data as rd

    from borges_ray.ops.graph import cocitation

    G, S, T = 8192, 32, 16
    E = G * S * T
    SRC_BASE = G * T
    T0 = time.time()

    def mk_edges(df):
        r = df["id"].to_numpy(np.int64) % E   # 2E rows → every edge twice
        g = r // (S * T)
        rem = r % (S * T)
        j, t = rem // T, rem % T
        return pd.DataFrame({"src": SRC_BASE + g * S + j,
                             "dst": g * T + t})

    edges = rd.range(2 * E).map_batches(mk_edges, batch_format="pandas")
    out = cocitation(edges, k=100, min_count=2, max_fanout=256)
    dt = time.time() - T0
    got = list(zip(out["x"].astype(int), out["y"].astype(int),
                   out["n"].astype(int)))
    want = [(x, y, S) for x, y in itertools.islice(
        itertools.combinations(range(T), 2), 100)]
    n_pairs = G * S * (T * (T - 1) // 2)
    print(f"COCITATION {2*E} edge rows / {n_pairs} wedge pairs: {dt:.1f}s "
          f"({n_pairs / dt:.0f} pairs/s); top3={got[:3]}", flush=True)
    return 0 if got == want else 1



def main_editdist() -> int:
    """Ed-Join at 1.2M strings with a closed form: 400k clusters of 3
    variants of a 24-char blake2b-derived letter string — v1 rotates
    position 3 (dist 1 to base), v2 rotates positions 10 and 17 (dist 2
    to base, dist 3 to v1, so the v1-v2 pair must NOT appear).  Letters
    give 26⁵ ≈ 11.9M q=5 gram types, so accidental gram buckets stay
    Poisson-thin while every cluster still shares rare grams; cross-
    cluster near pairs are probabilistically impossible (fixed seed ⇒
    deterministic).  Expectation: EXACTLY one dist-1 and one dist-2 pair
    per cluster, ids in canonical order, nothing else."""
    import ray.data as rd

    from borges_ray.ops.dedup import editdist_pairs_ds

    C = 400_000
    T0 = time.time()

    def mk_strings(df):
        import hashlib
        ids = df["id"].to_numpy(np.int64)
        out_id, out_s = [], []
        for i in ids:
            c, v = divmod(int(i), 3)
            d = hashlib.blake2b(str(c).encode(), digest_size=24).digest()
            s = bytearray(97 + b % 26 for b in d)
            if v == 1:
                s[3] = 97 + (s[3] - 97 + 1) % 26
            elif v == 2:
                s[10] = 97 + (s[10] - 97 + 1) % 26
                s[17] = 97 + (s[17] - 97 + 1) % 26
            out_id.append(i)
            out_s.append(s.decode())
        return pd.DataFrame({"sid": np.asarray(out_id, np.int64),
                             "s": out_s})

    strs = rd.range(3 * C).map_batches(mk_strings, batch_format="pandas")
    pairs = editdist_pairs_ds(strs, "sid", "s", max_dist=2, q=5)

    def summarize(df):
        a = df["id_a"].to_numpy(np.int64)
        b = df["id_b"].to_numpy(np.int64)
        d = df["dist"].to_numpy(np.int64)
        same = (a // 3) == (b // 3)
        canon = same & (a % 3 == 0) & (((b % 3 == 1) & (d == 1))
                                       | ((b % 3 == 2) & (d == 2)))
        return pd.DataFrame({"n": [len(df)], "canon": [int(canon.sum())],
                             "d1": [int((d == 1).sum())],
                             "d2": [int((d == 2).sum())]})

    agg = pairs.map_batches(summarize, batch_format="pandas").to_pandas().sum()
    dt = time.time() - T0
    n, canon, d1, d2 = (int(agg["n"]), int(agg["canon"]),
                        int(agg["d1"]), int(agg["d2"]))
    ok = n == 2 * C and canon == n and d1 == C and d2 == C
    print(f"EDITDIST {3*C} strings: {dt:.1f}s ({3*C/dt:.0f} strings/s); "
          f"pairs={n} (want {2*C}) canonical={canon} d1={d1} d2={d2} "
          f"ok={ok}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if "--build" in sys.argv or not os.path.exists(os.path.join(ROOT, "_DONE")):
        build_corpus()
    if "--exact-substr" in sys.argv:
        fr = 1
        if "--frac" in sys.argv:
            fr = int(sys.argv[sys.argv.index("--frac") + 1])
        elif "--half" in sys.argv:
            fr = 2
        rc = main_exact_substr("--planted" in sys.argv, fr)
    elif "--filter-chain" in sys.argv:
        rc = main_filter_chain()
    elif "--redirects" in sys.argv:
        rc = main_redirects()
    elif "--pagerank" in sys.argv:
        rc = main_pagerank()
    elif "--bfs" in sys.argv:
        rc = main_bfs()
    elif "--reciprocity" in sys.argv:
        rc = main_reciprocity()
    elif "--powerlaw" in sys.argv:
        rc = main_powerlaw()
    elif "--heavy-hitters" in sys.argv:
        rc = main_heavy_hitters()
    elif "--quantile" in sys.argv:
        rc = main_exact_quantile()
    elif "--cocitation" in sys.argv:
        rc = main_cocitation()
    elif "--editdist" in sys.argv:
        rc = main_editdist()
    else:
        rc = main("--planted" in sys.argv)
    ray.shutdown()
    sys.exit(rc)
