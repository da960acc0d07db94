"""Fetch-as-join: the frontier probes the pages corpus by canonical URL.

The reference's fetch is a live HTTP GET (S10-S12); in this engine the web
IS a Parquet corpus (SURVEY.md §2.5), so fetch = equi-join of the selected
frontier against ``pages`` on canonical url; a miss models a 404.

Scale shape: the corpus is written **hash-bucketed by url**
(``bucket=<stable_hash(url) % B>/`` hive dirs).  A crawl round fetches a
politeness-bounded set of URLs (per-host budget × hosts), which is orders of
magnitude smaller than the corpus — so the join is: group the selected
frontier by bucket (tiny shuffle), then each group reads ONLY its bucket's
files with an ``isin`` filter pushed into the Parquet scan.  The 100 TB
corpus is never shuffled and never fully scanned per round.

A pluggable real fetcher (actor pool with HTTP session state, the T1/T2
login/key-rotation analogue) would replace ``fetch_selected`` with
``map_batches(FetchActor, concurrency=N)``; everything downstream is
unchanged.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data as rd

from ..canonical import stable_hash

BUCKET_COL = "pbucket"

#: Deterministic transient-failure model (T6/F5 parity — the reference
#: retries each DOI up to 3 times with widening waits,
#: ``Borges/spiders/Elsevier/paper_xml.py:141-173``, and records hard
#: failures as error rows rather than failing the job).  A url fails its
#: first k attempts where k is a stable function of the url — so the oracle
#: and the engine observe identical outcomes with zero wall-clock sleeps.
MAX_FETCH_ATTEMPTS = 3


def transient_fail_count(url: str) -> int:
    """How many initial attempts fail for this url (0 for ~93%)."""
    h = stable_hash("flaky:" + url) % 100
    if h < 5:
        return 1
    if h < 7:
        return 2
    if h < 8:
        return MAX_FETCH_ATTEMPTS  # permanent: exhausts the retry budget
    return 0


def apply_flaky(url: str, status: int) -> tuple[int, int]:
    """(final_status, attempts) under the retry policy; 404s don't retry."""
    if status != 200:
        return status, 1
    fails = transient_fail_count(url)
    if fails >= MAX_FETCH_ATTEMPTS:
        return 503, MAX_FETCH_ATTEMPTS
    return 200, fails + 1


def bucket_of_urls(urls: pd.Series | list[str], num_buckets: int) -> list[int]:
    return [stable_hash(u) % num_buckets for u in urls]


def write_pages_bucketed(pages: pa.Table, root: str, num_buckets: int = 16) -> None:
    """Lay the corpus out hash-bucketed by url (one dir per bucket)."""
    buckets = pa.array(bucket_of_urls(pages["url"].to_pylist(), num_buckets), pa.int32())
    t = pages.append_column(BUCKET_COL, buckets)
    for b in range(num_buckets):
        sub = t.filter(pc.equal(t[BUCKET_COL], pa.scalar(b, pa.int32())))
        d = os.path.join(root, f"{BUCKET_COL}={b}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub.drop_columns([BUCKET_COL]), os.path.join(d, "part-0.parquet"))


def write_pages_bucketed_ds(pages_ds: rd.Dataset, root: str, num_buckets: int = 16) -> None:
    """Same layout, written distributed: add the bucket column per batch and
    let ``write_parquet`` partition on it (for the bench-scale corpus)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pa.array(bucket_of_urls(t["url"].to_pylist(), num_buckets), pa.int32())
        return t.append_column(BUCKET_COL, b)

    pages_ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        root, partition_cols=[BUCKET_COL]
    )


def fetch_selected(selected: rd.Dataset, pages_root: str, num_buckets: int,
                   flaky: bool = False) -> rd.Dataset:
    """selected(url, host, depth, priority, host_seq, partition) →
    + (status, attempts, html): left-join against the bucketed corpus.

    One ``groupby(bucket)`` over the politeness-bounded selection (tiny
    shuffle), then a bucket-local Parquet probe per group.  With ``flaky``
    the deterministic transient-failure + retry model applies (T6):
    exhausted retries become status-503 error rows that flow to metrics
    instead of failing the job (the reference's except-pass ≈
    error-row-and-continue, SURVEY.md §4 Retries).
    """

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[BUCKET_COL] = bucket_of_urls(df["url"], num_buckets)
        return out

    bucketed = selected.map_batches(add_bucket, batch_format="pandas")

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df[BUCKET_COL].iloc[0])
        path = os.path.join(pages_root, f"{BUCKET_COL}={b}")
        urls = df["url"].tolist()
        if os.path.isdir(path):
            dset = pads.dataset(path, format="parquet")
            hit = dset.to_table(columns=["url", "html"],
                                filter=pc.field("url").isin(urls))
            hits = dict(zip(hit["url"].to_pylist(), hit["html"].to_pylist()))
        else:
            hits = {}
        out = df.drop(columns=[BUCKET_COL]).copy()
        statuses = [200 if u in hits else 404 for u in urls]
        if flaky:
            pairs = [apply_flaky(u, s) for u, s in zip(urls, statuses)]
            statuses = [p[0] for p in pairs]
            out["attempts"] = [p[1] for p in pairs]
        else:
            out["attempts"] = 1
        out["html"] = [hits.get(u) if s == 200 else None
                       for u, s in zip(urls, statuses)]
        out["status"] = statuses
        return out

    return bucketed.groupby(BUCKET_COL).map_groups(probe, batch_format="pandas")
