"""Scalar string/date kernels reproducing the reference's §2.9 functions.

Pure, deterministic, vectorizable via ``Series.map`` or applied inside
``map_batches``.  Each cites its reference twin.
"""

from __future__ import annotations

import re

_WS_RE = re.compile(r"\s+")

#: Acronym/stopword banks for title capitalization — the reference keeps
#: acronyms upper and stopwords lower (``clean_journal_title``,
#: ``Borges/spiders/AIP/aip_journals.py:40-59``).
ACRONYMS = frozenset("aip aps ieee rsc ecs jes iop api xml".split())
LOWER_WORDS = frozenset("of the and in on for a an to".split())


def collapse_whitespace(s: str) -> str:
    """Collapse newlines/space runs to single spaces
    (``download_abstract.py:71-73``)."""
    return _WS_RE.sub(" ", s).strip()


def clean_title(s: str) -> str:
    """Journal-title cleaner (M13): collapse whitespace, then capitalize each
    word except acronyms (upper) and interior stopwords (lower)."""
    words = collapse_whitespace(s).split(" ")
    out = []
    for i, w in enumerate(words):
        lw = w.lower()
        if lw in ACRONYMS:
            out.append(w.upper())
        elif i > 0 and lw in LOWER_WORDS:
            out.append(lw)
        else:
            out.append(lw.capitalize())
    return " ".join(out)


def reorder_author(name: str) -> str:
    """``"Last, First"`` → ``"First Last"`` (M14 —
    ``SpringerXMLDataExtractor.py:202-204``, ``Elsevier/paper_index.py:83-88``);
    names without a comma pass through."""
    if "," not in name:
        return name
    last, _, first = name.partition(",")
    first, last = first.strip(), last.strip()
    return f"{first} {last}" if first else last


def doi_from_url(url: str) -> str | None:
    """DOI from a doi.org-style link: split on ``.org/``
    (``Borges/spiders/RSC/metadata.py:94-95``)."""
    if ".org/" not in url:
        return None
    return url.split(".org/", 1)[1] or None


def parse_year(s: str) -> int | None:
    """Year from a header string: last 4 digits of the first comma field
    (``Borges/spiders/RSC/metadata.py:79``), falling back to the first
    4-digit group anywhere (``SpringerXMLDataExtractor.py:162-164``)."""
    first = s.split(",")[0].strip()
    tail = first[-4:]
    if tail.isdigit():
        return int(tail)
    m = re.search(r"\b(\d{4})\b", s)
    return int(m.group(1)) if m else None


def zfill_id(vol: int, issue: int, width: int = 3) -> str:
    """Zero-padded volume/issue id (S2 —
    ``Borges/spiders/RSC/start_url_gen.py:29``)."""
    return f"{str(vol).zfill(width)}{str(issue).zfill(width)}"
