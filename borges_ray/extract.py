"""Pure extraction kernels: HTML→text, link extraction, CJK language tagging.

These are THE byte-identical-contract kernels (BASELINE.json input_hint:
"byte-identical extracted text per url").  Both the distributed Ray pipeline
and the single-process oracle (``reference_crawl.py``) call these same pure
functions, mirroring how the reference shares ``ArticleXMLDataExtractor``
between its IOP and ECS paths (``Borges/spiders/IOP/scripts/upload_to_mongodb.py:17,223``).

Reference semantics reproduced:

- **Fulltext-div extraction** (M7): the reference pulls one specific content
  div per publisher — ``div.page-body.pagefulltext`` at
  ``Borges/spiders/AIP/aip_spider_full_text.py:139-157``,
  ``div.article.fulltext-view`` at ``Borges/spiders/ECS/paper_html.py:49-52``,
  ``div#wrapper`` at ``Borges/spiders/RSC/paper.py:42``.  Our pages carry
  their content in ``<div id="maincontent">``.
- **itertext join + newline strip** (M11): text nodes concatenated then
  ``.replace('\\n', '')`` — ``article_xml_extractor.py:201,356-364``.
- **Copyright strip** (M12): the ECS abstract copyright sentence removed —
  ``article_xml_extractor.py:354-362``.
- **CJK tagging** (M15): per-character membership in 14 public Unicode CJK
  blocks — ``article_xml_extractor.py:34-49,80-84``.
- **Link extraction + type exclusion** (M2/F2): anchors harvested with their
  article-type class; ``Cover`` / ``Front/Back Matter`` types skipped —
  ``Borges/spiders/RSC/metadata.py:52-63`` (capsule selector + type filter at
  ``:34,56``).

No lxml in this environment; parsing is a deterministic regex/stdlib scan
(sufficient and exact for the synthetic page dialect, and dependency-free).
"""

from __future__ import annotations

import html as _htmlmod
import re

import numpy as np

# The 14 public Unicode CJK block ranges the reference checks
# (article_xml_extractor.py:34-49; see https://jrgraphix.net/r/Unicode/).
CJK_RANGES: list[tuple[int, int]] = [
    (0x3300, 0x33FF),
    (0xFE30, 0xFE4F),
    (0xF900, 0xFAFF),
    (0x2F800, 0x2FA1F),
    (0x3040, 0x309F),
    (0x30A0, 0x30FF),
    (0x2E80, 0x2EFF),
    (0x4E00, 0x9FFF),
    (0x3400, 0x4DBF),
    (0xAC00, 0xD7AF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B820, 0x2CEAF),
]

#: lowest CJK-range start — gate for the all-latin fast path in tag_lang_batch
_CJK_MIN_LO = min(lo for lo, _hi in CJK_RANGES)

COPYRIGHT_SENTINEL = " © 2000 The Electrochemical Society. All rights reserved."

#: Article-type classes excluded from frontier expansion (F2 —
#: ``RSC/metadata.py:34,56`` skips ``Cover``/``Front``/``Back Matter``).
EXCLUDED_LINK_CLASSES = frozenset({"cover", "front-matter", "back-matter"})

_MAIN_DIV_RE = re.compile(rb'<div\s+id="maincontent"[^>]*>', re.S)
_DIV_TOKEN_RE = re.compile(rb"<div\b[^>]*>|</div\s*>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_ANCHOR_RE = re.compile(rb"<a\s+([^>]*)>", re.S)
_ATTR_RE = re.compile(rb'([a-zA-Z-]+)\s*=\s*"([^"]*)"')


def _main_content(html: bytes) -> bytes | None:
    """Locate the balanced ``<div id="maincontent">…</div>`` region."""
    m = _MAIN_DIV_RE.search(html)
    if m is None:
        return None
    depth = 1
    pos = m.end()
    for tok in _DIV_TOKEN_RE.finditer(html, pos):
        if tok.group().startswith(b"</"):
            depth -= 1
            if depth == 0:
                return html[pos : tok.start()]
        else:
            depth += 1
    return html[pos:]  # unterminated div: take the rest (deterministic)


def extract_text(html: bytes) -> str:
    """HTML bytes → extracted text. Pure, deterministic, locale-independent.

    itertext-equivalent: drop tags, unescape entities, join text nodes,
    ``replace('\\n', '')``, strip the ECS copyright sentinel, outer strip.
    Missing content div → empty string (the reference yields nothing when the
    fulltext selector misses, ``ECS/paper_html.py:49-52``).
    """
    region = _main_content(html)
    if region is None:
        return ""
    text = _TAG_RE.sub("", region.decode("utf-8", errors="replace"))
    text = _htmlmod.unescape(text)
    text = text.replace("\n", "")
    text = text.replace(COPYRIGHT_SENTINEL, "")
    return text.strip()


def extract_links(html: bytes) -> list[tuple[str, str]]:
    """All anchor ``(href, css_class)`` pairs in document order.

    Type exclusion (F2) and rel=nofollow anchors are dropped here;
    canonicalization/resolution against the page URL happens in the caller
    (it needs the base URL).
    """
    out: list[tuple[str, str]] = []
    for m in _ANCHOR_RE.finditer(html):
        attrs = {k.decode("ascii").lower(): v for k, v in _ATTR_RE.findall(m.group(1))}
        href = attrs.get("href")
        if not href:
            continue
        cls = attrs.get("class", b"").decode("utf-8", errors="replace")
        if cls in EXCLUDED_LINK_CLASSES:
            continue
        if b"nofollow" in attrs.get("rel", b""):
            continue
        out.append((href.decode("utf-8", errors="replace"), cls))
    return out


def _codepoints(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate texts into one uint32 codepoint array + offsets."""
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lengths = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return cp, offsets


def tag_lang_batch(texts: list[str]) -> list[str]:
    """Vectorized language tagging for a batch of texts.

    One pass over the concatenated codepoints: a char is CJK iff it falls in
    any of :data:`CJK_RANGES` (reference ``_is_cjk``,
    ``article_xml_extractor.py:80-84``).  Tag per text by CJK share of
    non-space characters: 0 → ``en``, ≥ 0.5 → ``cjk``, else ``mixed``.
    """
    if not texts:
        return []
    cp, offsets = _codepoints(texts)
    # fast path: no codepoint reaches the lowest CJK range (the common
    # all-ASCII/latin web batch) → every text is "en"; one comparison pass
    # instead of 14 range masks + two reduceats
    if len(cp) == 0 or not bool((cp >= _CJK_MIN_LO).any()):
        return ["en"] * len(texts)
    is_cjk = np.zeros(len(cp), dtype=bool)
    for lo, hi in CJK_RANGES:
        is_cjk |= (cp >= lo) & (cp <= hi)
    non_space = cp != 0x20
    # reduceat needs in-bounds indices and returns the *next* element for
    # equal adjacent offsets (empty texts) — clip, then mask empties out.
    empty = offsets[:-1] == offsets[1:]
    if len(cp):
        starts = np.minimum(offsets[:-1], len(cp) - 1)
        cjk_counts = np.add.reduceat(is_cjk, starts)
        ns_counts = np.add.reduceat(non_space, starts)
    else:
        cjk_counts = np.zeros(len(texts))
        ns_counts = np.zeros(len(texts))
    out: list[str] = []
    for i, t in enumerate(texts):
        if empty[i] or ns_counts[i] == 0:
            out.append("en")
            continue
        ratio = cjk_counts[i] / ns_counts[i]
        out.append("en" if ratio == 0 else ("cjk" if ratio >= 0.5 else "mixed"))
    return out


def tag_lang(text: str) -> str:
    """Scalar convenience wrapper over :func:`tag_lang_batch`."""
    return tag_lang_batch([text])[0]


def parse_sitemap(xml_text: str) -> list[dict]:
    """Parse one sitemap-protocol document (sitemaps.org 0.9) into url
    entries — the crawl seed-discovery path the reference drives by
    enumerating publisher issue indexes (``paper_index.py``); on the open
    web the equivalent seed feed is the per-host sitemap.

    Returns one dict per ``<url>`` entry: ``loc`` (required; entries
    without it are dropped per the protocol), ``lastmod`` (optional,
    verbatim string or None) and ``priority_x10`` (optional ``0.X``
    decimal scaled to an exact int, -1 when absent — exact-integer so a
    SQL oracle reproduces it without float parsing).  Namespaced and
    namespace-free documents both parse (real-world sitemaps are
    inconsistent); malformed XML yields [] rather than raising — a bad
    sitemap must not kill a batch.
    """
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    out: list[dict] = []
    for el in root.iter():
        if local(el.tag) != "url":
            continue
        loc = lastmod = prio = None
        for ch in el:
            name = local(ch.tag)
            if name == "loc":
                loc = (ch.text or "").strip()
            elif name == "lastmod":
                lastmod = (ch.text or "").strip()
            elif name == "priority":
                prio = (ch.text or "").strip()
        if not loc:
            continue
        px10 = -1
        if prio:
            try:
                from decimal import Decimal

                px10 = int(Decimal(prio) * 10)
            except Exception:
                px10 = -1
        out.append({"loc": loc, "lastmod": lastmod, "priority_x10": px10})
    return out


def parse_sitemap_index(xml_text: str) -> list[str]:
    """Parse a sitemap INDEX document (``<sitemapindex><sitemap><loc>``,
    sitemaps.org 0.9) into its child sitemap URLs, in document order.
    Large hosts shard their sitemaps behind one index — seed discovery
    follows robots.txt ``Sitemap:`` → (possibly) an index → leaf
    sitemaps → ``parse_sitemap``.  Namespace-tolerant like
    :func:`parse_sitemap`; malformed XML or a non-index document yields
    [] (callers fall back to treating the URL as a leaf sitemap)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    if local(root.tag) != "sitemapindex":
        return []
    out: list[str] = []
    for el in root.iter():
        if local(el.tag) != "sitemap":
            continue
        for ch in el:
            if local(ch.tag) == "loc" and ch.text and ch.text.strip():
                out.append(ch.text.strip())
    return out


def sniff_kind_batch(payloads: "list[bytes] | np.ndarray") -> list[str]:
    """Magic-byte content-kind sniffing for fetched binary payloads —
    the triage step that routes a crawl's responses (Content-Type
    headers lie; the reference trusts file EXTENSIONS at
    ``IOP/scripts/upload_to_mongodb.py``, which lies too).  Deterministic
    prefix rules, first match wins:

    - ``pdf``   ``%PDF-``
    - ``gzip``  ``1f 8b``
    - ``zip``   ``PK\\x03\\x04``
    - ``png``   ``\\x89PNG``
    - ``html``  first non-whitespace byte is ``<``
    - ``empty`` zero-length
    - ``other`` anything else
    """
    out = []
    for p in payloads:
        b = bytes(p or b"")
        if not b:
            out.append("empty")
        elif b.startswith(b"%PDF-"):
            out.append("pdf")
        elif b.startswith(b"\x1f\x8b"):
            out.append("gzip")
        elif b.startswith(b"PK\x03\x04"):
            out.append("zip")
        elif b.startswith(b"\x89PNG"):
            out.append("png")
        elif b.lstrip(b" \t\r\n").startswith(b"<"):
            out.append("html")
        else:
            out.append("other")
    return out


def decode_payload(payload: bytes) -> tuple[str, str]:
    """Encoding-aware payload decode with the reference's fallback
    ladder (``IOP/scripts/upload_to_mongodb.py:80-94`` decodes XML as
    utf-8 and HTML as windows-1252; real crawls cannot trust either, so
    we try strict utf-8 first and FALL BACK to cp1252 — which maps every
    byte, so the ladder is total and deterministic).  Returns
    ``(text, encoding)`` where encoding ∈ {"utf-8", "cp1252", "empty"}.
    """
    b = bytes(payload or b"")
    if not b:
        return "", "empty"
    try:
        return b.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return b.decode("cp1252", errors="replace"), "cp1252"
