"""Parse stage: html → extracted text + language + canonicalized outlinks.

One zero-copy-in Arrow ``map_batches`` reproducing the reference's
extract pipeline (M7 fulltext-div, M11 itertext-join, M12 copyright strip,
M15 CJK tagging, M2/M3 link extraction + F2 type exclusion) via the shared
pure kernels in :mod:`borges_ray.extract` — the byte-identical contract.

Emits the round's ``crawled`` rows with a ``links`` (list<string>) column of
canonical child URLs; the link-candidate explode happens downstream so this
stage stays single-output.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..canonical import canonicalize
from ..extract import extract_links, extract_text, tag_lang_batch

PARSED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("fetch_round", pa.int32()),
        ("host_seq", pa.int32()),
        ("status", pa.int32()),
        ("attempts", pa.int32()),
        ("extracted_text", pa.string()),
        ("lang", pa.string()),
        ("n_links", pa.int32()),
        ("links", pa.list_(pa.string())),
        ("partition", pa.int32()),
    ]
)


def parse_fetched(fetched: rd.Dataset, rnd: int) -> rd.Dataset:
    """fetched(url, host, depth, priority, host_seq, partition, status, html)
    → PARSED_SCHEMA rows."""

    def parse(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        statuses = t["status"].to_pylist()
        htmls = t["html"].to_pylist()
        texts: list[str] = []
        links_col: list[list[str]] = []
        for u, st, h in zip(urls, statuses, htmls):
            if st != 200 or h is None:
                texts.append("")
                links_col.append([])
                continue
            texts.append(extract_text(h))
            out: list[str] = []
            for href, _cls in extract_links(h):
                cu = canonicalize(href, base=u)
                if cu is not None:
                    out.append(cu)
            links_col.append(out)
        langs = tag_lang_batch(texts)
        langs = [l if st == 200 else "" for l, st in zip(langs, statuses)]
        return pa.table(
            {
                "url": t["url"],
                "host": t["host"],
                "depth": pa.array(t["depth"].to_pylist(), pa.int32()),
                "priority": pa.array(t["priority"].to_pylist(), pa.int32()),
                "fetch_round": pa.array([rnd] * len(urls), pa.int32()),
                "host_seq": pa.array(t["host_seq"].to_pylist(), pa.int32()),
                "status": pa.array(statuses, pa.int32()),
                "attempts": pa.array(t["attempts"].to_pylist(), pa.int32()),
                "extracted_text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "n_links": pa.array([len(l) for l in links_col], pa.int32()),
                "links": pa.array(links_col, pa.list_(pa.string())),
                "partition": pa.array(t["partition"].to_pylist(), pa.int32()),
            }
        )

    return fetched.map_batches(parse, batch_format="pyarrow")
