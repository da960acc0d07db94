"""Record-shaping operators: API-JSON parsing (M17/M18), abstract↔fulltext
merge (J5), and keyed overwrite (S8).

Reference semantics reproduced:

- :func:`parse_api_record` — ``Borges/spiders/Elsevier/paper_index.py:43-95``
  (``parse_doc_search_result``): every field is an independent
  try/except-null extraction from a search-API JSON body; authors combine
  ``dc:creator`` + ``authors.author`` with "Last, First" reorder, and ANY
  malformed name voids the list back to the raw ``authors`` value.
- :func:`merge_abstract_fulltext` — ``Borges/spiders/AIP/download_abstract.py:84-128``
  (``add_abstract_to_fulltext``): abstracts exclude
  ``abstract-type="key-points"`` and require ``<p>`` children; a duplicated
  abstract collapses to its first instance with a note; the surviving
  abstract is prepended to the (likewise dedup'd) fulltext.  The reference
  compares duplicates with a 0.99 tree-similarity; ours compares extracted
  text equality — equivalent on exact duplicates, documented deviation for
  near-identical ones.
- :func:`keyed_overwrite` (in relational terms) — the ``redownload=True``
  last-writer-wins update path (``IOP/scripts/upload_to_mongodb.py:238-244``):
  re-crawled records replace the stored row for the same key; untouched
  keys keep their original row byte-identical.

Ray shape: all three are stateless ``map_batches`` kernels; the overwrite
is a keys-co-located winner pick (one bucketed shuffle, winner = max
version — order-free, parallelism-invariant).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def parse_api_record(res: dict, journal: str, source: str = "Scopus") -> dict:
    """One JSON search result → flat record, per-field try/except-null
    (paper_index.py:43-95)."""
    rec: dict = {"crawled": False, "publisher": "Elsevier", "journal": journal}

    try:
        rec["published_year"] = int(res["prism:coverDate"].split("-")[0])
    except Exception:
        rec["published_year"] = None

    try:
        if source == "Scopus":
            rec["open_access"] = res["openaccessFlag"]
        else:  # SciDir
            rec["open_access"] = res["openaccessArticle"]
    except Exception:
        rec["open_access"] = False

    try:
        rec["doi"] = res["prism:doi"]
    except Exception:
        rec["doi"] = None

    try:
        rec["title"] = res["dc:title"]
    except Exception:
        rec["title"] = None

    authors: list[str] | object = []
    try:
        authors.extend(f"{a['$'].split(', ')[1]} {a['$'].split(', ')[0]}"
                       for a in res["dc:creator"])
        authors.extend(f"{a['$'].split(', ')[1]} {a['$'].split(', ')[0]}"
                       for a in res["authors"]["author"])
    except Exception:
        authors = res.get("authors")
    rec["authors"] = authors

    try:
        rec["issue"] = int(res["prism:issueIdentifier"].encode("utf-8"))
    except Exception:
        rec["issue"] = None

    return rec


class ApiRecordParser:
    """``map_batches`` stage: (id, body, journal, source) JSON rows → flat
    records.  ``authors`` serializes to a '; '-joined string (raw fallback
    values pass through as-is) for Arrow/SQL-friendly output."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rid, body, journal, source in zip(df["doc_id"], df["body"],
                                              df["journal"], df["source"]):
            rec = parse_api_record(json.loads(body), journal, source)
            a = rec["authors"]
            rec["authors"] = "; ".join(a) if isinstance(a, list) else a
            rows.append({"doc_id": rid, **rec})
        out = pd.DataFrame(rows)
        out["published_year"] = out["published_year"].astype("float64")
        out["issue"] = out["issue"].astype("float64")
        out["open_access"] = out["open_access"].astype(bool)
        return out


# ---------------------------------------------------------------------------
# J5: merge abstract into fulltext
# ---------------------------------------------------------------------------

NON_ABSTRACT_ERR = "Non-abstract content (see Abstract_Content)"
DUP_ABSTRACT_ERR = "Duplicated abstract in response, took first instance"


def _text_of(el: ET.Element) -> str:
    return "".join(el.itertext()).strip()


def merge_abstract_fulltext(abstract_xml: str, fulltext_xml: str) -> tuple[str, str | None]:
    """(merged_text, error) for one document pair
    (download_abstract.py:84-128)."""
    error: str | None = None
    ab_root = ET.fromstring(abstract_xml)
    ft_root = ET.fromstring(fulltext_xml)

    # abstracts: not key-points, must have <p> children (:92-97)
    cands = [a for a in ab_root.findall(".//abstract")
             if a.get("abstract-type") != "key-points" and a.findall("p")]
    abstract_text: str | None
    if len(cands) == 1:
        abstract_text = _text_of(cands[0])
    elif not cands:
        abstract_text = None
        error = NON_ABSTRACT_ERR
    elif len(cands) == 2 and _text_of(cands[0]) == _text_of(cands[1]):
        abstract_text = _text_of(cands[0])
        error = DUP_ABSTRACT_ERR
    else:
        abstract_text = None
        error = "Unspecified error"

    fts = ft_root.findall(".//fulltext")
    if len(fts) == 2 and _text_of(fts[0]) == _text_of(fts[1]):
        fts = fts[:1]
    fulltext_text = _text_of(fts[0])

    # insert abstract at the front of the fulltext (:119-123)
    merged = (f"{abstract_text} {fulltext_text}"
              if abstract_text else fulltext_text)
    return merged, error


def merge_abstract_stage(pairs: rd.Dataset) -> rd.Dataset:
    """(doc_id, abstract_xml, fulltext_xml) rows → (doc_id, merged, error)."""

    def fn(t: pa.Table) -> pa.Table:
        # XML parsing is per-row by nature, but the payload columns enter
        # zero-copy from the object store and leave as Arrow strings —
        # no pandas object-column detour around the per-row kernel
        merged, errors = [], []
        for a, f in zip(t["abstract_xml"].to_pylist(),
                        t["fulltext_xml"].to_pylist()):
            m, e = merge_abstract_fulltext(a, f)
            merged.append(m)
            errors.append(e)
        return pa.table({"doc_id": t["doc_id"],
                         "merged": pa.array(merged, pa.string()),
                         "error": pa.array(errors, pa.string())})

    return pairs.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# S8: keyed last-writer-wins overwrite
# ---------------------------------------------------------------------------

def keyed_overwrite(base: rd.Dataset, updates: rd.Dataset, key: str,
                    n_buckets: int = 32) -> rd.Dataset:
    """Re-crawl refresh: rows in ``updates`` REPLACE same-key rows in
    ``base``; all other base rows pass through unchanged
    (upload_to_mongodb.py:238-244 ``replace_one(upsert=True)``).

    Shape: a disk-bucketed cogroup on the key (one linear hive write per
    side, winner = updates-over-base per bucket) — order-free,
    parallelism-invariant, no driver-side state.  NOT the tag/union/sort
    shape: both sides here carry full page payloads, and a preserve-order
    union (forced by any Sort in the plan) buffers its entire input before
    emitting — the livelock measured in
    :func:`~borges_ray.ops.relational.cogroup_spill`.  Size ``n_buckets``
    ≈ table bytes / 64 MB."""
    import pyarrow as pa

    from .relational import cogroup_spill

    def _dtype_of(t) -> np.dtype:
        # Ray Schema.types mixes arrow DataTypes (arrow blocks) with plain
        # Python/numpy types (pandas blocks)
        if isinstance(t, pa.DataType):
            try:
                return np.dtype(t.to_pandas_dtype())
            except TypeError:
                return np.dtype("object")
        if t in (str, bytes, object):
            return np.dtype("object")
        try:
            return np.dtype(t)
        except TypeError:
            return np.dtype("object")

    sch = base.schema()
    empty = pd.DataFrame({n: pd.Series(dtype=_dtype_of(t))
                          for n, t in zip(sch.names, sch.types)})

    def winner(bdf: pd.DataFrame, udf: pd.DataFrame) -> pd.DataFrame:
        if not len(bdf) and not len(udf):
            return empty
        df = pd.concat([bdf.assign(__v=0), udf.assign(__v=1)],
                       ignore_index=True)
        df = df.sort_values([key, "__v"], kind="mergesort")
        out = df.drop_duplicates(subset=key, keep="last").drop(columns="__v")
        return out[list(empty.columns)]  # one column order across buckets

    return cogroup_spill(base, updates, key, key, winner, empty=empty,
                         tag="kow", n_buckets=n_buckets, require_both=False)


def cap_payload_rows(ds: rd.Dataset, payload_col: str, *,
                     max_bytes: int, error_col: str = "error") -> rd.Dataset:
    """Oversized-payload triage: rows whose ``payload_col`` exceeds
    ``max_bytes`` (UTF-8 bytes for strings, raw length for binary) KEEP
    their identity/metadata columns but have the payload DROPPED (nulled)
    and ``error_col`` set to ``"payload_too_large"``; in-budget rows pass
    through with ``error_col`` null.

    Reference semantics: the Mongo writer catches ``DocumentTooLarge``,
    deletes ``Paper_Content`` from the record, and stores it with an error
    note instead of failing the job
    (``Borges/spiders/Elsevier/paper_xml.py:109-120``).  At web scale this
    is what keeps one pathological multi-GB page from inflating a block: the
    byte cap runs inside the same ``map_batches`` pass that first touches
    the payload, so over-cap bytes never survive past their first block.

    Adds ``n_payload_bytes`` (size BEFORE the drop) so metrics and the
    missed/error sink can account for what was discarded."""

    def cap(t: pa.Table) -> pa.Table:
        # vectorized Arrow kernels end-to-end: byte sizes via
        # binary_length (bytes for string AND binary columns), the cap
        # via if_else — the payload column is never converted to Python
        v = t[payload_col]
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        sizes = pc.coalesce(pc.cast(pc.binary_length(v), pa.int64()),
                            pa.scalar(0, pa.int64()))
        over = pc.greater(sizes, pa.scalar(max_bytes, pa.int64()))
        capped = pc.if_else(over, pa.nulls(len(t), v.type), v)
        err = pc.if_else(over, pa.scalar("payload_too_large", pa.string()),
                         pa.nulls(len(t), pa.string()))
        out = t.set_column(t.schema.get_field_index(payload_col),
                           payload_col, capped)

        def put(tbl: pa.Table, name: str, col) -> pa.Table:
            # OVERWRITE an existing column (old pandas semantics) —
            # append would create a duplicate field name
            i = tbl.schema.get_field_index(name)
            return (tbl.set_column(i, name, col) if i >= 0
                    else tbl.append_column(name, col))

        return put(put(out, "n_payload_bytes", sizes), error_col, err)

    return ds.map_batches(cap, batch_format="pyarrow")


def snapshot_diff(old: rd.Dataset, new: rd.Dataset, key: str,
                  payload: str) -> rd.Dataset:
    """Incremental-corpus snapshot diff: classify every key across two
    snapshots as ``added`` (new only), ``removed`` (old only), ``changed``
    (both, payload differs) or ``unchanged`` — the audit/planning step of a
    rolling recrawl (which keys must re-enter the pipeline, which outputs
    can be carried forward).  Complements the admission-side
    :func:`~borges_ray.state.ledger.ledger_upsert` /
    :func:`ledger_upsert_periods` (what to ADMIT) with the content-side
    question (what actually CHANGED).

    One bucketed full-outer hash join on the key; payload comparison is
    per-row equality inside the join block — payloads move through the
    shuffle once each, nothing is collected."""
    from .relational import hash_join

    # explicit presence markers: a NULL payload must not read as an absent
    # row (both-null payloads compare as unchanged)
    o = old.map_batches(
        lambda df: df[[key, payload]].rename(columns={payload: "__old"})
                     .assign(__ho=np.int8(1)),
        batch_format="pandas")
    n = new.map_batches(
        lambda df: df[[key, payload]].rename(columns={payload: "__new"})
                     .assign(__hn=np.int8(1)),
        batch_format="pandas")
    joined = hash_join(o, n, on=[key], join_type="full_outer")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        has_old = df["__ho"].notna()
        has_new = df["__hn"].notna()
        same = (df["__old"] == df["__new"]) | (
            df["__old"].isna() & df["__new"].isna())
        change = np.where(
            ~has_old, "added",
            np.where(~has_new, "removed",
                     np.where(same, "unchanged", "changed")))
        out = df[[key]].copy()
        out["change"] = change
        return out

    return joined.map_batches(classify, batch_format="pandas")
