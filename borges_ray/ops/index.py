"""Distributed inverted token index with PHYSICAL partition pruning.

The search-side primitive of a corpus platform: build token→document
posting lists once, hive-partitioned by a stable token hash
(``tp=<p>/``), and answer conjunctive (AND) term queries by reading ONLY
the partitions the query's terms hash into — at 100 TB a query touches
``len(terms)/num_parts`` of the index bytes, never the corpus.

Same physical-layout family as :mod:`borges_ray.ops.embed`'s IVF / LSH
ANN indexes (hive partitioning + pruned reads + bytes-read accounting);
cf. the reference's Mongo field lookups (``find_one`` point queries,
``Borges/spiders/Elsevier/paper_index.py:110``), which this generalizes
to corpus-scale full-text membership.

Scale shape:

- build: one tokenize map (per-doc DISTINCT tokens — postings are sets),
  then ``write_parquet(partition_cols=["tp"])`` — the only shuffle-free
  physical clustering Ray Data offers; blocks write their own hive leaves.
- search: ``read_parquet`` of the probed ``tp=`` dirs with a ``term``
  predicate (row-group pruning on top of partition pruning), then a
  distributed per-doc match count; docs matching all terms survive.
  Posting lists never reach the driver — only the (small) result set.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from ..canonical import stable_hash


def _token_part(tok: str, num_parts: int) -> int:
    return stable_hash("tok:" + tok) % num_parts


def build_token_index(ds: rd.Dataset, index_dir: str, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_parts: int = 16) -> None:
    """(id, text) → hive-partitioned postings ``tp=<p>/`` of
    (id, term, tf) rows, one row per DISTINCT (doc, token) carrying the
    within-doc term frequency (ranked retrieval needs tf; membership
    queries ignore it)."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = df[[id_col]].copy()
        rows["term"] = df[text_col].fillna("").str.split()
        ex = (rows.explode("term", ignore_index=True)
              .dropna(subset=["term"]))
        g = (ex.groupby([id_col, "term"], sort=False).size()
             .rename("tf").reset_index())
        g["tf"] = g["tf"].astype("int64")
        g["tp"] = [_token_part(t, num_parts) for t in g["term"]]
        return g[[id_col, "term", "tf", "tp"]]

    ds.map_batches(explode, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["tp"])


def build_positional_index(ds: rd.Dataset, index_dir: str, *,
                           id_col: str = "doc_id", text_col: str = "text",
                           num_parts: int = 16) -> None:
    """(id, text) → hive-partitioned POSITIONAL postings ``tp=<p>/`` of
    (id, term, pos) rows — one row per token OCCURRENCE (0-based
    whitespace position), not per distinct (doc, token).  Phrase and
    proximity queries need positions; membership/BM25 use the lighter
    :func:`build_token_index`.  Same physical layout, so a phrase query
    still reads only its terms' partitions."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, terms, poss = [], [], []
        for i, text in zip(df[id_col].to_numpy("int64"),
                           df[text_col].fillna("")):
            toks = text.split()
            ids.append(np.full(len(toks), i, dtype=np.int64))
            terms.extend(toks)
            poss.append(np.arange(len(toks), dtype=np.int64))
        if not terms:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "term": pd.Series(dtype="object"),
                                 "pos": pd.Series(dtype="int64"),
                                 "tp": pd.Series(dtype="int64")})
        out = pd.DataFrame({id_col: np.concatenate(ids),
                            "term": pd.Series(terms, dtype="object"),
                            "pos": np.concatenate(poss)})
        out["tp"] = [_token_part(t, num_parts) for t in out["term"]]
        return out

    ds.map_batches(explode, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["tp"])


def phrase_search(index_dir: str, phrase: list[str], *,
                  id_col: str = "doc_id",
                  num_parts: int = 16) -> tuple[rd.Dataset, dict]:
    """Exact-phrase query over the positional index: documents containing
    ``phrase`` as CONSECUTIVE tokens, with per-doc occurrence counts.

    Classic positional-intersection (the standard IR phrase plan): read
    ONLY the phrase terms' ``tp=`` partitions with a term predicate; a
    posting (doc, term, pos) votes for anchor ``base = pos - slot`` for
    every slot the term occupies in the phrase (repeated phrase terms —
    "buffalo buffalo" — mean several slots per posting, handled
    vectorized); an anchor where all ``len(phrase)`` DISTINCT slots voted
    is a match.  Distinct + count are keys-only (doc, base) exchanges of
    the MATCHING postings only; the corpus is never touched.

    Returns (Dataset of ``(id_col, n_matches)``, bytes-read stats)."""
    from .relational import distinct, grouped_agg

    k = len(phrase)
    slots: dict[str, list[int]] = {}
    for i, t in enumerate(phrase):
        slots.setdefault(t, []).append(i)
    want = sorted(slots)
    parts = sorted({_token_part(t, num_parts) for t in want})
    dirs = [os.path.join(index_dir, f"tp={p}") for p in parts
            if os.path.isdir(os.path.join(index_dir, f"tp={p}"))]
    stats = {"bytes_read": sum(_dir_bytes(d) for d in dirs),
             "bytes_total": _dir_bytes(index_dir),
             "partitions_read": len(dirs), "partitions_total": num_parts}
    import pyarrow as pa

    if not dirs:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "n_matches": pa.array([], pa.int64())})
        return rd.from_arrow(empty), stats
    import pyarrow.compute as pc

    files = sorted(os.path.join(d, f) for d in dirs for f in os.listdir(d)
                   if f.endswith(".parquet"))
    postings = rd.read_parquet(files, columns=[id_col, "term", "pos"],
                               filter=pc.field("term").isin(want))

    def vote(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for t, sl in slots.items():
            sub = df[df["term"] == t]
            if not len(sub):
                continue
            for i in sl:
                outs.append(pd.DataFrame({
                    id_col: sub[id_col].to_numpy("int64"),
                    "base": sub["pos"].to_numpy("int64") - i,
                    "slot": np.int64(i)}))
        if not outs:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "base": pd.Series(dtype="int64"),
                                 "slot": pd.Series(dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        return out[out["base"] >= 0]

    votes = distinct(postings.map_batches(vote, batch_format="pandas"),
                     [id_col, "base", "slot"])
    anchors = grouped_agg(votes, [id_col, "base"],
                          {"n_slots": ("count", "slot")})
    full = anchors.map_batches(
        lambda df: df.loc[df["n_slots"] == k, [id_col, "base"]],
        batch_format="pandas")
    hits = grouped_agg(full, [id_col], {"n_matches": ("count", "base")})
    return hits, stats


def proximity_search(index_dir: str, term_a: str, term_b: str, *,
                     max_dist: int, id_col: str = "doc_id",
                     num_parts: int = 16) -> tuple[rd.Dataset, dict]:
    """Proximity query over the positional index: documents where
    ``term_a`` and ``term_b`` co-occur within ``max_dist`` token
    positions (unordered), with the per-doc MINIMUM distance — the
    relevance primitive between exact phrase and bag-of-words AND.

    Plan: pruned read of the two terms' ``tp=`` partitions, one bucketed
    (doc-keyed) exchange of the matching postings, then a per-doc
    sorted-merge nearest-position scan (``np.searchsorted`` of A's
    positions into B's — O(na log nb) per doc, never the O(na·nb)
    cross-join the SQL twin uses).  Returns (Dataset of
    ``(id_col, min_dist)``, bytes-read stats)."""
    from .relational import groupby_buckets

    parts = sorted({_token_part(t, num_parts) for t in (term_a, term_b)})
    dirs = [os.path.join(index_dir, f"tp={p}") for p in parts
            if os.path.isdir(os.path.join(index_dir, f"tp={p}"))]
    stats = {"bytes_read": sum(_dir_bytes(d) for d in dirs),
             "bytes_total": _dir_bytes(index_dir),
             "partitions_read": len(dirs), "partitions_total": num_parts}
    import pyarrow as pa

    if not dirs:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "min_dist": pa.array([], pa.int64())})
        return rd.from_arrow(empty), stats
    import pyarrow.compute as pc

    files = sorted(os.path.join(d, f) for d in dirs for f in os.listdir(d)
                   if f.endswith(".parquet"))
    postings = rd.read_parquet(
        files, columns=[id_col, "term", "pos"],
        filter=pc.field("term").isin([term_a, term_b]))

    def nearest(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              "min_dist": pd.Series(dtype="int64")})
        if not len(df):
            return empty
        ids_out, dist_out = [], []
        for did, grp in df.groupby(id_col, sort=False):
            pa_ = np.sort(grp.loc[grp["term"] == term_a, "pos"]
                          .to_numpy("int64"))
            pb = np.sort(grp.loc[grp["term"] == term_b, "pos"]
                         .to_numpy("int64"))
            if not len(pa_) or not len(pb):
                continue
            # nearest pb neighbor of each pa via one sorted merge
            idx = np.searchsorted(pb, pa_)
            best = np.full(len(pa_), np.iinfo(np.int64).max)
            right = idx < len(pb)
            best[right] = pb[idx[right]] - pa_[right]
            left = idx > 0
            best[left] = np.minimum(best[left],
                                    pa_[left] - pb[idx[left] - 1])
            d = int(best.min())
            if d <= max_dist:
                ids_out.append(did)
                dist_out.append(d)
        if not ids_out:
            return empty
        return pd.DataFrame({id_col: pd.Series(ids_out, dtype="int64"),
                             "min_dist": pd.Series(dist_out, dtype="int64")})

    return groupby_buckets(postings, [id_col], nearest), stats


def _dir_bytes(path: str) -> int:
    return sum(os.path.getsize(os.path.join(dp, f))
               for dp, _dn, fs in os.walk(path) for f in fs)


def search_all_terms(index_dir: str, terms: list[str], *,
                     id_col: str = "doc_id",
                     num_parts: int = 16) -> tuple[rd.Dataset, dict]:
    """Conjunctive search: ids of documents containing EVERY term.

    Reads only the ``tp=`` partitions the query terms hash into and
    filters rows to the query terms at the parquet scan (predicate
    pushdown); the AND is a distributed per-doc distinct-term count ==
    ``len(terms)``.  Returns (result Dataset of ``id_col`` rows, stats
    with bytes_read / bytes_total / partitions_read)."""
    from .relational import grouped_agg

    want = sorted(set(terms))
    parts = sorted({_token_part(t, num_parts) for t in want})
    dirs = [os.path.join(index_dir, f"tp={p}") for p in parts
            if os.path.isdir(os.path.join(index_dir, f"tp={p}"))]
    stats = {"bytes_read": sum(_dir_bytes(d) for d in dirs),
             "bytes_total": _dir_bytes(index_dir),
             "partitions_read": len(dirs), "partitions_total": num_parts}
    if not dirs:
        import pyarrow as pa

        empty = pa.table({id_col: pa.array([], pa.int64())})
        return rd.from_arrow(empty), stats
    import pyarrow.compute as pc

    files = sorted(os.path.join(d, f) for d in dirs for f in os.listdir(d)
                   if f.endswith(".parquet"))
    postings = rd.read_parquet(
        files, columns=[id_col, "term"],
        filter=pc.field("term").isin(want))
    hits = grouped_agg(postings, [id_col], {"n_terms": ("count", "term")})
    out = hits.map_batches(
        lambda df: df.loc[df["n_terms"] == len(want), [id_col]],
        batch_format="pandas")
    return out, stats


def bm25_scores(index_dir: str, terms: list[str], doclens: rd.Dataset, *,
                id_col: str = "doc_id", num_parts: int = 16,
                k1: float = 1.2, b: float = 0.75) -> rd.Dataset:
    """BM25 ranked retrieval over the pruned inverted index (Robertson &
    Walker's Okapi BM25 — the public standard relevance function): for
    every document matching ≥1 query term,

        score = Σ_t idf(t) · (tf·(k1+1)) / (tf + k1·(1−b+b·dl/avgdl)),
        idf(t) = ln((N − df_t + 0.5) / (df_t + 0.5))

    with the terms summed in their given (fixed) order so the arithmetic
    is IEEE-reproducible by the SQL oracle.  ``doclens`` is the corpus
    (id, dl) table; N / Σdl / per-term df are keys-only distributed
    aggregates of which the driver sees only scalars.

    Scale shape: the pruned postings read touches only the query terms'
    ``tp=`` partitions; the per-doc tf pivot is one bucketed shuffle over
    the MATCHING docs; doc lengths attach via a keys-only hash join with
    the match set on the small side."""
    from .relational import grouped_agg, groupby_buckets, hash_join, spill_point

    import math

    # pin doclens: it is consumed twice (corpus aggregate + the dl join) —
    # without the spill the caller's tokenize pass would execute twice
    doclens = spill_point(doclens, "bm25_dl")
    want = list(dict.fromkeys(terms))  # fixed order, deduped
    parts = sorted({_token_part(t, num_parts) for t in want})
    dirs = [os.path.join(index_dir, f"tp={p}") for p in parts
            if os.path.isdir(os.path.join(index_dir, f"tp={p}"))]
    corpus = grouped_agg(
        doclens.map_batches(lambda df: df.assign(__one=1), batch_format="pandas"),
        ["__one"], {"n": ("count", id_col), "sdl": ("sum", "dl")}).to_pandas()
    n_docs, sum_dl = int(corpus["n"].iloc[0]), int(corpus["sdl"].iloc[0])
    avgdl = sum_dl / float(n_docs)  # exact ints → one division (== SQL)

    import pyarrow as pa

    if not dirs:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "bm25": pa.array([], pa.float64())}))
    import pyarrow.compute as pc

    files = sorted(os.path.join(d, f) for d in dirs for f in os.listdir(d)
                   if f.endswith(".parquet"))
    postings = rd.read_parquet(files, columns=[id_col, "term", "tf"],
                               filter=pc.field("term").isin(want))

    # per-term document frequency: keys-only aggregate, driver sees |terms| rows
    dfreq = grouped_agg(postings, ["term"],
                        {"df": ("count", id_col)}).to_pandas()
    df_of = dict(zip(dfreq["term"], dfreq["df"].astype(int)))
    idf = {t: math.log((n_docs - df_of.get(t, 0) + 0.5)
                       / (df_of.get(t, 0) + 0.5)) for t in want}

    # pivot tf per doc into fixed term order (one bucketed shuffle over
    # matching docs only)
    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        w = df.pivot_table(index=id_col, columns="term", values="tf",
                           aggfunc="first", fill_value=0)
        out = pd.DataFrame({id_col: w.index.to_numpy()})
        for i, t in enumerate(want):
            out[f"__tf{i}"] = (w[t].to_numpy() if t in w.columns
                               else np.zeros(len(w), dtype=np.int64)).astype("int64")
        return out

    matches = spill_point(groupby_buckets(postings, [id_col], pivot),
                          "bm25_pivot")
    joined = hash_join(doclens, matches, on=[id_col])

    idf_list = [idf[t] for t in want]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["dl"].to_numpy(dtype=np.float64)
        norm = k1 * (1.0 - b + b * (dl / avgdl))
        total = np.zeros(len(df))
        for i, t in enumerate(want):
            tf = df[f"__tf{i}"].to_numpy(dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                s = (idf_list[i] * (tf * (k1 + 1.0))) / (tf + norm)
            total = total + np.where(tf == 0.0, 0.0, s)
        out = df[[id_col]].copy()
        out["bm25"] = np.round(total, 6)
        return out

    return joined.map_batches(score, batch_format="pandas")
