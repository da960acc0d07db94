"""Structured article-metadata extraction (M9/M10): JATS-ish XML and
HTML-meta-tag dialects → struct columns.

Re-expresses the reference's two extractor classes as one stateless,
batch-mapped operator:

- JATS dialect — ``ArticleXMLDataExtractor``
  (``Borges/spiders/IOP/scripts/article_xml_extractor.py``): DOI :86-93,
  journal title w/ publisher-id fallback :96-115, ISSN ppub/epub :117-136,
  year ppub→epub fallback :146-161, title with tex-math/xref/fn stripping
  :163-201, CJK-aware author assembly :203-277, abstract with 13 exclusion
  phrases + Highlight/Figure guards + title/inline-formula stripping + ECS
  copyright strip :279-367, body presence :370-386.
- Meta-tag dialect — ``SpringerXMLDataExtractor``
  (``Borges/spiders/SpringerNature/scripts/SpringerXMLDataExtractor.py``):
  DOI/prism.doi fallback + abort-on-missing :86-110, publisher inference
  :112-122, prism.* fields :125-160, dc.date year :162-185, dc.title :188-196,
  "Last, First" → "First Last" author reorder :198-207, dc.description
  abstract :209-219, main-content body check :222-232.

The reference parses with lxml; this container has none, so the JATS path
uses stdlib ``xml.etree.ElementTree`` (the synthetic corpus is well-formed
XML) and the meta-tag path uses a compiled regex over ``<meta>`` tags —
both faithful to the reference's *semantics*, not its library.

Ray shape: :class:`MetaExtractor` is a callable class for
``map_batches`` — patterns compile once per actor/worker (T1 stateful-stage
pattern), rows parse independently, output is one struct-flat Arrow-friendly
frame.  No driver-side state, no shuffle.
"""

from __future__ import annotations

import html as _html
import re
import xml.etree.ElementTree as ET

import pandas as pd

from .extract import CJK_RANGES

#: The 13 abstract exclusion phrases + the Highlight/Figure guards
#: (article_xml_extractor.py:296-323).
ABSTRACT_EXCLUDE_PHRASES = (
    "GENERAL SCIENTIFIC SUMMARY",
    "General Scientific Summary",
    "General scientific summary",
    "General Summary",
    "General summary",
    "Scientific Summary",
    "Scientific summary",
    "Video Abstract",
    "Video abstract",
    "Graphical Abstract",
    "Graphical abstract",
    "Plain Language Summary",
    "Plain language summary",
    "PLAIN LANGUAGE SUMMARY",
)

#: ECS copyright sentinel stripped from abstracts
#: (article_xml_extractor.py:352-359).
ECS_COPYRIGHT = " © 2000 The Electrochemical Society. All rights reserved."

ECS_JOURNAL = "Journal of The Electrochemical Society"

META_FIELDS = ("doi", "publisher", "journal", "journal_issn", "journal_eissn",
               "published_year", "title", "authors", "issue", "abstract",
               "contains_body")


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in CJK_RANGES)


def _strip_elements(root: ET.Element, tag: str) -> None:
    """Remove all ``tag`` descendants of ``root`` but KEEP their tails —
    lxml ``strip_elements(..., with_tail=False)`` semantics
    (article_xml_extractor.py:178-201)."""
    parents = {c: p for p in root.iter() for c in p}
    for el in list(root.iter(tag)):
        parent = parents.get(el)
        if parent is None:
            continue
        tail = el.tail or ""
        kids = list(parent)
        idx = kids.index(el)
        if idx > 0:
            prev = kids[idx - 1]
            prev.tail = (prev.tail or "") + tail
        else:
            parent.text = (parent.text or "") + tail
        parent.remove(el)


def _itertext(el: ET.Element) -> str:
    return "".join(el.itertext())


def _first_text(parent: ET.Element, path: str) -> str | None:
    hits = parent.findall(path)
    return hits[0].text if hits else None


def extract_jats_meta(xml_str: str) -> dict:
    """JATS XML → metadata dict (article_xml_extractor.py:424-491 field
    order).  Returns ``{"aborted": True}``-style minimal dict only on parse
    failure; the reference asserts hard on malformed JATS, we record a note."""
    notes: list[str] = []
    tree = ET.fromstring(xml_str)
    article_meta = tree.find(".//article-meta")
    journal_meta = tree.find(".//journal-meta")

    # DOI (:86-93): article-id with pub-id-type='doi' (other ids are noise)
    doi = _first_text(article_meta, ".//article-id[@pub-id-type='doi']")

    # Journal title with publisher-id fallback (:96-115)
    journal = _first_text(journal_meta, ".//journal-title")
    if journal is None:
        journal = _first_text(
            journal_meta, ".//journal-id[@journal-id-type='publisher-id']")
        notes.append("Journal is [@journal-id-type='publisher-id']")

    # ISSN / eISSN (:117-136)
    issn = _first_text(journal_meta, ".//issn[@pub-type='ppub']")
    eissn = _first_text(journal_meta, ".//issn[@pub-type='epub']")

    # Year: ppub, epub fallback (:146-161)
    year = _first_text(article_meta, ".//pub-date[@pub-type='ppub']/year")
    if year is None:
        year = _first_text(article_meta, ".//pub-date[@pub-type='epub']/year")

    # Title: strip tex-math / xref / fn (tails kept), join, drop newlines
    # (:163-201)
    title = None
    title_el = article_meta.find(".//article-title")
    if title_el is not None:
        title_el = ET.fromstring(ET.tostring(title_el))
        for tag in ("tex-math", "xref", "fn"):
            _strip_elements(title_el, tag)
        title = _itertext(title_el).replace("\n", "")

    # Authors with CJK partition (:203-277)
    authors: list[str] = []
    for contrib in article_meta.findall(".//contrib[@contrib-type='author']"):
        cjk_to_append: list[str] = []
        surname_s = [e.text for e in contrib.findall(".//surname") if e.text]
        if not surname_s:
            continue
        for n in surname_s:
            # NOTE: no break — the reference's surname loop appends the name
            # once PER CJK CHARACTER (article_xml_extractor.py:233-236; its
            # given-names loop :243-247 does break).  Reproduced faithfully:
            # a 2-char CJK surname shows up doubled in the "(…)" suffix.
            for c in n:
                if _is_cjk(c):
                    cjk_to_append.append(n)
        latin_sur = [s for s in surname_s
                     if s not in cjk_to_append and s.replace(" ", "").isalpha()]
        surname = latin_sur[0] if latin_sur else None

        given_names_s = [e.text for e in contrib.findall(".//given-names") if e.text]
        if given_names_s:
            for n in given_names_s:
                for c in n:
                    if _is_cjk(c):
                        cjk_to_append.append(n)
                        break
            latin_giv = [g for g in given_names_s
                         if g not in cjk_to_append
                         and g.replace(" ", "").replace("-", "").isalpha()]
            given = latin_giv[0] if latin_giv else None
            if given and surname and not cjk_to_append:
                authors.append(f"{given} {surname}")
            elif given and surname and cjk_to_append:
                authors.append(f"{given} {surname} ({''.join(cjk_to_append)})")
            elif not given and not surname and cjk_to_append:
                authors.append("".join(cjk_to_append))
        elif surname:
            authors.append(surname)
        elif cjk_to_append:
            authors.append("".join(cjk_to_append))

    issue = _first_text(article_meta, ".//issue")

    # Abstract: exclusion phrases + Highlight/Figure guards, keep exactly
    # one, strip title/inline-formula, ECS copyright strip (:279-367)
    abstract = None
    abstract_els = article_meta.findall(".//abstract")
    if abstract_els:
        texts = [_itertext(a).strip() for a in abstract_els]
        keep = [i for i, a in enumerate(texts)
                if not any(p in a for p in ABSTRACT_EXCLUDE_PHRASES)
                and ("Highlight" not in a or "Abstract" in a)
                and ("Figure" not in a or "Abstract" in a)]
        if keep:
            ab_el = abstract_els[keep[0]]
            for tag in ("title", "inline-formula"):
                _strip_elements(ab_el, tag)
            abstract = _itertext(ab_el).replace("\n", "")
            if journal == ECS_JOURNAL:
                abstract = abstract.replace(ECS_COPYRIGHT, "")

    contains_body = tree.find(".//body") is not None

    return {"aborted": False, "doi": doi, "publisher": "Institute of Physics",
            "journal": journal, "journal_issn": issn, "journal_eissn": eissn,
            "published_year": year, "title": title, "authors": authors,
            "issue": issue, "abstract": abstract,
            "contains_body": contains_body, "notes": notes}


_META_TAG_RE = re.compile(
    r"<meta\s+name=\"([^\"]+)\"\s+content=\"([^\"]*)\"\s*/?>", re.IGNORECASE)
_MAIN_CONTENT_RE = re.compile(
    r"<div class=\"main-content\">(.*?)</div>", re.DOTALL)


def extract_meta_tags(html_str: str) -> dict:
    """HTML ``<meta>``-tag dialect → metadata dict
    (SpringerXMLDataExtractor.py:50-353)."""
    notes: list[str] = []
    tags: dict[str, list[str]] = {}
    for name, content in _META_TAG_RE.findall(html_str):
        tags.setdefault(name, []).append(_html.unescape(content))

    # DOI with prism fallback; no DOI → abort (:86-110, extract_article_data
    # :270-276 returns early)
    doi_s = tags.get("DOI", [])
    if not doi_s:
        prism = tags.get("prism.doi", [])
        if not prism:
            notes.append("No DOI! Aborting...")
            return {"aborted": True, "notes": notes}
        doi = prism[0].split("doi:")[1]
    else:
        doi = doi_s[0]

    # Publisher, inferred when missing (:112-122)
    pub_s = tags.get("dc.publisher", [])
    if len(pub_s) == 1:
        publisher = pub_s[0]
        if publisher != "SpringerNature":
            notes.append("Publisher not SpringerNature")
    else:
        publisher = "SpringerNature"
        notes.append("Publisher inferred (from 2024 SpringerNature upload)")

    journal_s = tags.get("prism.publicationName", [])
    journal = journal_s[0] if len(journal_s) == 1 else None

    issn_s = tags.get("prism.issn", [])
    issn = issn_s[0] if issn_s else None

    issue_s = tags.get("prism.number", [])
    issue = issue_s[0] if len(issue_s) == 1 else None

    # Year from dc.date (:162-185)
    date_s = tags.get("dc.date", [])
    year = None
    if len(date_s) == 1:
        year = date_s[0].split("-")[0]
        assert len(year) == 4 and year.isnumeric()

    title_s = tags.get("dc.title", [])
    title = title_s[0] if len(title_s) == 1 else None

    # Authors: "Last, First" → "First Last"; any malformed name voids the
    # whole list (:198-207 try/except)
    authors: list[str] | None = []
    try:
        for a in tags.get("dc.creator", []):
            authors.append(f"{a.split(', ')[1]} {a.split(', ')[0]}")
    except Exception as e:  # noqa: BLE001 — mirrors the reference's catch-all
        authors = None
        notes.append(f"Error getting authors: {str(e)}")

    abstract_s = tags.get("dc.description", [])
    abstract = str(abstract_s[0]) if abstract_s else None

    # Body: main-content div present AND non-empty (:222-232 len(el) > 0)
    m = _MAIN_CONTENT_RE.search(html_str)
    contains_body = bool(m and m.group(1).strip())

    return {"aborted": False, "doi": doi, "publisher": publisher,
            "journal": journal, "journal_issn": issn, "journal_eissn": None,
            "published_year": year, "title": title, "authors": authors,
            "issue": issue, "abstract": abstract,
            "contains_body": contains_body, "notes": notes}


def extract_article_meta(kind: str, payload: str) -> dict:
    """Dispatch on content kind: 'jats' → XML extractor, 'meta' → meta-tag
    extractor (the reference hardwires one extractor per spider; ours is one
    operator with a dialect column — M16 record assembly included)."""
    if kind == "jats":
        return extract_jats_meta(payload)
    if kind == "meta":
        return extract_meta_tags(payload)
    raise ValueError(f"unknown article dialect: {kind}")


class MetaExtractor:
    """``map_batches`` stage: (id_col, content_kind, payload) → struct-flat
    metadata columns.  Aborted records (no DOI) are DROPPED by default,
    matching the reference's early return; with ``route_missed=True`` they
    are instead EMITTED with ``missed=True`` and the abort note, so a
    pipeline can split them to a missed-record sink (F8 — the reference
    routes DOI-less results to a ``missed_papers`` collection,
    ``Elsevier/paper_index.py:233-240``) rather than silently losing them.
    ``authors`` is emitted both as a ``list<string>`` column
    (``authors_list``) and as a '; '-joined string (``authors``) for
    SQL-comparable output."""

    def __init__(self, id_col: str = "doc_id", kind_col: str = "content_kind",
                 payload_col: str = "payload", route_missed: bool = False):
        self.id_col = id_col
        self.kind_col = kind_col
        self.payload_col = payload_col
        self.route_missed = route_missed

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        meta_cols = [f for f in META_FIELDS if f != "authors"]
        for rid, kind, payload in zip(df[self.id_col], df[self.kind_col],
                                      df[self.payload_col]):
            meta = extract_article_meta(kind, payload)
            if meta.get("aborted"):
                if self.route_missed:
                    rows.append({
                        self.id_col: rid,
                        **{f: None for f in meta_cols},
                        "contains_body": False,
                        "authors_list": None, "authors": None,
                        "missed": True,
                        "missed_note": "; ".join(meta.get("notes", [])),
                    })
                continue
            authors = meta["authors"]
            rows.append({
                self.id_col: rid,
                **{f: meta[f] for f in meta_cols},
                "authors_list": authors,
                "authors": "; ".join(authors) if authors is not None else None,
                **({"missed": False, "missed_note": None}
                   if self.route_missed else {}),
            })
        cols = [self.id_col, *meta_cols, "authors_list", "authors"]
        if self.route_missed:
            cols += ["missed", "missed_note"]
        if not rows:
            out = pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
            out[self.id_col] = out[self.id_col].astype(df[self.id_col].dtype)
            out["contains_body"] = out["contains_body"].astype(bool)
            if self.route_missed:
                out["missed"] = out["missed"].astype(bool)
            return out
        return pd.DataFrame(rows)[cols]


def split_missed(arts, **extractor_kwargs):
    """F8 split-to-two-sinks: ONE extraction pass over the article stream,
    then vectorized filters route kept rows (the reference's main
    collection) and aborted rows (its ``missed_papers``) to separate
    datasets.  Returns ``(kept, missed)``; ``kept`` carries the exact
    default :class:`MetaExtractor` schema, ``missed`` is
    ``(id_col, missed_note)``.  The routed intermediate is spilled once so
    the two branches don't re-run the parse."""
    import pyarrow.compute as pc

    from .ops.relational import filter_batches, spill_point

    id_col = extractor_kwargs.get("id_col", "doc_id")
    routed = spill_point(
        arts.map_batches(MetaExtractor, batch_format="pandas",
                         fn_constructor_kwargs={**extractor_kwargs,
                                                "route_missed": True},
                         concurrency=(1, 4)),
        "meta_routed")
    kept = filter_batches(
        routed, lambda t: pc.invert(t["missed"])
    ).drop_columns(["missed", "missed_note"])
    missed = filter_batches(routed, lambda t: t["missed"]).select_columns(
        [id_col, "missed_note"])
    return kept, missed
