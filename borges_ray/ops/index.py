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

import pandas as pd
import ray.data as rd

from ..canonical import stable_hash


def _token_part(tok: str, num_parts: int) -> int:
    return stable_hash("tok:" + tok) % num_parts


def build_token_index(ds: rd.Dataset, index_dir: str, *,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_parts: int = 16) -> None:
    """(id, text) → hive-partitioned postings ``tp=<p>/`` of
    (term, id) rows, one row per DISTINCT (doc, token)."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = df[[id_col]].copy()
        rows["term"] = df[text_col].fillna("").str.split()
        ex = (rows.explode("term", ignore_index=True)
              .dropna(subset=["term"]).drop_duplicates())
        ex["tp"] = [_token_part(t, num_parts) for t in ex["term"]]
        return ex[[id_col, "term", "tp"]]

    ds.map_batches(explode, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["tp"])


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
