"""Deterministic synthetic article corpus for the metadata extractors.

Derives a JATS-XML or meta-tag-HTML article payload from each row of the
``documents`` table — every golden field is a pure function of
``(doc_id, text)``, so a DuckDB oracle can recompute the expected extraction
output directly from the base table while the engine must genuinely parse
the markup (tex-math/xref/fn noise, multiple abstracts, escaping, ppub→epub
fallback, missing fields, CJK authors are all synthesized in).

Dialect split: even doc_id → JATS (ref
``Borges/spiders/IOP/scripts/article_xml_extractor.py``), odd → meta-tag
(ref ``SpringerNature/scripts/SpringerXMLDataExtractor.py``).  The
modulus rules below mirror the reference's branch coverage:

==========================  =====================================================
rule                        exercised reference branch
==========================  =====================================================
d%23==0 (jats)              journal-title missing → publisher-id fallback (:96)
d%7==0                      no ppub ISSN (:117)
d%11==0 (jats)              no epub ISSN (:129)
d%3==0 (jats)               no ppub year → epub fallback (:146)
d%4==0 / d%6==0 / d%9==0    tex-math / xref / fn stripped from title (:163)
d%8==0 (jats)               newline in title removed (:201)
d%42==0 (jats)              CJK surname → "Giv Sur (漢字漢字)" (:203-277)
d%13==0 (jats)              all abstracts excluded → None (:296-330)
d%6==0 (jats)               extra "Graphical Abstract" abstract excluded (:296)
d%10==0 (jats)              inline-formula stripped from abstract (:341)
d%5==0                      ECS journal → copyright strip (:352-359)
d%19==0 (meta)              no DOI → record aborted/dropped (:99-105)
d%17==0 (meta)              prism.doi 'doi:' form (:94-108)
d%13==0 (meta)              dc.publisher missing → inferred (:112-122)
d%29==0 (meta)              malformed dc.creator → authors None (:198-207)
d%8<4                       body / main-content present (:370 / :222)
==========================  =====================================================
"""

from __future__ import annotations

import html as _html

import pandas as pd

from .extract_meta import ECS_COPYRIGHT, ECS_JOURNAL

JOURNALS = [ECS_JOURNAL, "Applied Ceramics", "Physics Letters Q",
            "Acta Materialia X", "Journal of Power Sources Y"]
GIVEN = ["Alice", "Bo", "Chen", "Dmitri", "Eva", "Femi", "Grace", "Hiro"]
SURNAME = ["Smith", "Tanaka", "Lee", "Garcia", "Okafor", "Weber", "Rossi", "Novak"]
CJKS = ["漢字", "東京", "材料", "研究"]


def _esc(s: str) -> str:
    return _html.escape(s, quote=True)


def _fields(d: int, text: str) -> dict:
    """The shared per-id field plan (pure doc_id/text arithmetic)."""
    fw = (text or "").split(" ")[0]
    n_auth = 1 + d % 3
    authors = []
    for i in range(n_auth):
        a = f"{GIVEN[(d * 7 + i * 3) % 8]} {SURNAME[(d * 5 + i * 11) % 8]}"
        if i == 0 and d % 42 == 0:
            cjk = CJKS[d % 4]
            # the reference's surname loop appends once per CJK char
            a += f" ({cjk * len(cjk)})"
        authors.append(a)
    return {
        "journal": JOURNALS[d % 5],
        "doi": f"10.1000/doc.{d}",
        "issn": f"{1000 + d % 89}-{2000 + d % 97}" if d % 7 else None,
        "eissn": f"{3000 + d % 83}-{4000 + d % 79}" if d % 11 else None,
        "year": str(1990 + d % 30),
        "issue": str(1 + d % 12),
        "title": f"Study {d} of {fw}",
        "first_word": fw,
        "authors": authors,
        "abstract": f"We study sample {d} in detail.",
        "contains_body": d % 8 < 4,
    }


def synth_article(d: int, text: str) -> tuple[str, str]:
    """(content_kind, payload) for one document row."""
    f = _fields(d, text)
    if d % 2 == 0:
        return "jats", _jats_payload(d, f)
    return "meta", _meta_payload(d, f)


def _jats_payload(d: int, f: dict) -> str:
    jm = []
    if d % 23 == 0:
        jm.append(f'<journal-id journal-id-type="publisher-id">pub-id-{d % 5}</journal-id>')
    else:
        jm.append(f"<journal-title>{_esc(f['journal'])}</journal-title>")
    if f["issn"]:
        jm.append(f'<issn pub-type="ppub">{f["issn"]}</issn>')
    if f["eissn"]:
        jm.append(f'<issn pub-type="epub">{f["eissn"]}</issn>')

    am = [f'<article-id pub-id-type="doi">{f["doi"]}</article-id>',
          f'<article-id pub-id-type="publisher-id">art-{d}</article-id>']
    if d % 3:
        am.append(f'<pub-date pub-type="ppub"><year>{f["year"]}</year></pub-date>')
    am.append(f'<pub-date pub-type="epub"><year>{f["year"]}</year></pub-date>')

    # title with strip-noise: golden stays "Study {d} of {fw}"
    nl = "\n" if d % 8 == 0 else ""
    tex = "<tex-math>\\alpha^2</tex-math>" if d % 4 == 0 else ""
    xref = "<xref>1</xref>" if d % 6 == 0 else ""
    fn = "<fn>note</fn>" if d % 9 == 0 else ""
    am.append(f"<title-group><article-title>Study {d} of{nl} "
              f"{tex}{_esc(f['first_word'])}{xref}{fn}</article-title></title-group>")

    contribs = []
    for i, _a in enumerate(f["authors"]):
        giv = GIVEN[(d * 7 + i * 3) % 8]
        sur = SURNAME[(d * 5 + i * 11) % 8]
        cjk_el = (f"<surname>{CJKS[d % 4]}</surname>"
                  if i == 0 and d % 42 == 0 else "")
        contribs.append(f'<contrib contrib-type="author"><name>'
                        f"<surname>{sur}</surname>{cjk_el}"
                        f"<given-names>{giv}</given-names></name></contrib>")
    am.append(f"<contrib-group>{''.join(contribs)}</contrib-group>")
    am.append(f"<issue>{f['issue']}</issue>")

    if d % 13 == 0:
        am.append("<abstract><p>Video Abstract for sample.</p></abstract>")
    else:
        formula = "<inline-formula>x=1</inline-formula>" if d % 10 == 0 else ""
        # copyright only when the extractor will see the ECS journal-title
        # (the d%23 publisher-id fallback changes the title → no strip)
        ecs = _esc(ECS_COPYRIGHT) if (d % 5 == 0 and d % 23 != 0) else ""
        # golden: "We study sample {d} in detail." (title child + formula
        # stripped, copyright removed for the ECS journal)
        body_txt = f"We study sample {d} {formula}in detail.{ecs}"
        am.append(f"<abstract><title>Abstract</title><p>{body_txt}</p></abstract>")
    if d % 6 == 0:
        am.append("<abstract><p>Graphical Abstract teaser.</p></abstract>")

    body = "<body><p>Body text.</p></body>" if f["contains_body"] else ""
    return ("<article><front>"
            f"<journal-meta>{''.join(jm)}</journal-meta>"
            f"<article-meta>{''.join(am)}</article-meta>"
            f"</front>{body}</article>")


def _meta_payload(d: int, f: dict) -> str:
    tags = []
    if d % 19 == 0:
        pass  # no DOI in any form → extractor aborts, record dropped
    elif d % 17 == 0:
        tags.append(f'<meta name="prism.doi" content="doi:{f["doi"]}"/>')
    else:
        tags.append(f'<meta name="DOI" content="{f["doi"]}"/>')
    if d % 13:
        tags.append('<meta name="dc.publisher" content="SpringerNature"/>')
    tags.append(f'<meta name="prism.publicationName" content="{_esc(f["journal"])}"/>')
    if f["issn"]:
        tags.append(f'<meta name="prism.issn" content="{f["issn"]}"/>')
    tags.append(f'<meta name="prism.number" content="{f["issue"]}"/>')
    tags.append(f'<meta name="dc.date" content="{f["year"]}-03-15"/>')
    tags.append(f'<meta name="dc.title" content="{_esc(f["title"])}"/>')
    for i in range(len(f["authors"])):
        giv = GIVEN[(d * 7 + i * 3) % 8]
        sur = SURNAME[(d * 5 + i * 11) % 8]
        if d % 29 == 0:  # malformed: no ", " separator → authors becomes None
            tags.append(f'<meta name="dc.creator" content="{giv} {sur}"/>')
        else:
            tags.append(f'<meta name="dc.creator" content="{sur}, {giv}"/>')
    tags.append(f'<meta name="dc.description" content="{_esc(f["abstract"])}"/>')

    if f["contains_body"]:
        main = '<div class="main-content"><p>B</p></div>'
    elif d % 16 < 8:
        main = '<div class="main-content"></div>'  # present but EMPTY → False
    else:
        main = ""
    return (f"<html><head>{''.join(tags)}</head>"
            f"<body>{main}</body></html>")


def golden_meta(d: int, text: str) -> dict | None:
    """Expected extractor output for doc ``d`` (None = aborted/dropped).
    This is the python twin of the DuckDB oracle expression — unit tests
    assert extractor(synth) == golden."""
    if d % 2 == 1 and d % 19 == 0:
        return None
    f = _fields(d, text)
    jats = d % 2 == 0
    journal = (f"pub-id-{d % 5}" if jats and d % 23 == 0 else f["journal"])
    authors = None if (not jats and d % 29 == 0) else f["authors"]
    return {
        "doc_id": d,
        "doi": f["doi"],
        "publisher": "Institute of Physics" if jats else "SpringerNature",
        "journal": journal,
        "journal_issn": f["issn"],
        "journal_eissn": f["eissn"] if jats else None,
        "published_year": f["year"],
        "title": f["title"],
        "authors": "; ".join(authors) if authors is not None else None,
        "issue": f["issue"],
        "abstract": None if (jats and d % 13 == 0) else f["abstract"],
        "contains_body": f["contains_body"],
    }


def synth_api_body(d: int) -> tuple[str, str, str]:
    """(json_body, journal, source) for the API-record parser fixture
    (M17/M18).  Branch coverage vs paper_index.py:43-95: missing coverDate
    (d%6==0), missing doi (d%9==0), missing title (d%11==0), missing
    open-access flag (d%5==0 → False default), malformed creators → raw
    authors fallback (d%29==0), non-numeric issue (d%13==0 → None)."""
    import json

    res: dict = {}
    source = "Scopus" if d % 2 == 0 else "SciDir"
    if d % 6:
        res["prism:coverDate"] = f"{1990 + d % 30}-03-15"
    if d % 9:
        res["prism:doi"] = f"10.1016/j.{d}"
    if d % 11:
        res["dc:title"] = f"Title {d}"
    if d % 5:
        oa_key = "openaccessFlag" if source == "Scopus" else "openaccessArticle"
        res[oa_key] = bool(d % 3 == 0)
    n = 1 + d % 3
    names = [(GIVEN[(d * 7 + i * 3) % 8], SURNAME[(d * 5 + i * 11) % 8])
             for i in range(n)]
    if d % 29 == 0:
        res["authors"] = f"raw-{d}"  # no dc:creator → except → raw fallback
    else:
        k = (n + 1) // 2
        res["dc:creator"] = [{"$": f"{s}, {g}"} for g, s in names[:k]]
        res["authors"] = {"author": [{"$": f"{s}, {g}"} for g, s in names[k:]]}
    res["prism:issueIdentifier"] = "n/a" if d % 13 == 0 else str(1 + d % 12)
    return json.dumps(res, sort_keys=True), f"J-{d % 5}", source


def synth_abstract_fulltext(d: int) -> tuple[str, str]:
    """(abstract_xml, fulltext_xml) pair for the J5 merge fixture
    (download_abstract.py:84-128 branches): no-<p> abstract (d%11==0 →
    error), duplicated abstract (d%7==0 → first instance + note),
    key-points abstract excluded (d%4==0), duplicated fulltext collapsed
    (d%10==0)."""
    if d % 11 == 0:
        abs_inner = "<abstract><note>no paragraphs</note></abstract>"
    else:
        core = f"<abstract><p>Abs {d}.</p></abstract>"
        abs_inner = core + core if d % 7 == 0 else core
    if d % 4 == 0:
        abs_inner = ('<abstract abstract-type="key-points"><p>KP.</p>'
                     "</abstract>") + abs_inner
    ft = f"<fulltext><p>Full {d}.</p></fulltext>"
    ft_inner = ft + ft if d % 10 == 0 else ft
    return f"<r>{abs_inner}</r>", f"<r>{ft_inner}</r>"


def articles_from_documents(ds):
    """documents Dataset → (doc_id, content_kind, payload) Dataset — the
    synthetic stand-in for the reference's downloaded article files
    (S14 bulk-download analogue feeding M9/M10)."""

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        kinds, payloads = [], []
        for d, t in zip(df["doc_id"], df["text"]):
            k, p = synth_article(int(d), t or "")
            kinds.append(k)
            payloads.append(p)
        return pd.DataFrame({"doc_id": df["doc_id"], "content_kind": kinds,
                             "payload": payloads})

    return ds.map_batches(gen, batch_format="pandas")
