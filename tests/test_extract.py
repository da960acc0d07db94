from borges_ray.extract import (
    COPYRIGHT_SENTINEL,
    extract_links,
    extract_text,
    tag_lang,
    tag_lang_batch,
)


def page(body: str, anchors: str = "") -> bytes:
    return (
        f'<html><head><title>t</title></head><body><div id="maincontent">{body}</div>'
        f'<div id="nav">{anchors}</div></body></html>'
    ).encode()


def test_extract_basic():
    assert extract_text(page("hello world")) == "hello world"


def test_extract_strips_inline_tags_and_entities():
    assert extract_text(page("a <b>bold</b> &amp; done")) == "a bold & done"


def test_extract_replaces_newlines_not_spaces():
    # itertext-join + replace('\n','') parity (article_xml_extractor.py:201)
    assert extract_text(page("line1\nline2  spaced")) == "line1line2  spaced"


def test_extract_strips_copyright_sentinel():
    import html as h

    assert extract_text(page("abstract." + h.escape(COPYRIGHT_SENTINEL))) == "abstract."


def test_extract_nested_div_balanced():
    assert extract_text(page('<div class="s">inner</div> tail')) == "inner tail"


def test_extract_missing_div_empty():
    assert extract_text(b"<html><body>no content div</body></html>") == ""


def test_links_filtering():
    anchors = (
        '<a href="/p/1" class="article">a</a>'
        '<a href="/p/2" class="cover">c</a>'
        '<a href="/p/3" class="article" rel="nofollow">n</a>'
        '<a class="article">missing href</a>'
        '<a href="/p/4" class="article">d</a>'
    )
    links = extract_links(page("x", anchors))
    assert links == [("/p/1", "article"), ("/p/4", "article")]


def test_lang_tagging():
    assert tag_lang("plain english text") == "en"
    assert tag_lang("一丁丂") == "cjk"
    assert tag_lang("abc 一") == "mixed"
    assert tag_lang("") == "en"
    assert tag_lang_batch(["abc", "一丁", ""]) == ["en", "cjk", "en"]


def test_parse_sitemap():
    from borges_ray.extract import parse_sitemap

    xml = ('<?xml version="1.0"?>'
           '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           '<url><loc> https://a.com/1 </loc>'
           '<lastmod>2026-01-15</lastmod><priority>0.7</priority></url>'
           '<url><loc>https://a.com/2</loc></url>'
           '<url><lastmod>2026-01-15</lastmod></url>'  # no loc: dropped
           '</urlset>')
    out = parse_sitemap(xml)
    assert out == [
        {"loc": "https://a.com/1", "lastmod": "2026-01-15",
         "priority_x10": 7},
        {"loc": "https://a.com/2", "lastmod": None, "priority_x10": -1},
    ]
    # namespace-free documents parse too; malformed XML yields []
    assert parse_sitemap("<urlset><url><loc>u</loc></url></urlset>") == [
        {"loc": "u", "lastmod": None, "priority_x10": -1}]
    assert parse_sitemap("<bad") == []
    assert parse_sitemap("<urlset/>") == []
    # priority edge cases: 1.0 -> 10, junk -> -1
    assert parse_sitemap(
        "<urlset><url><loc>u</loc><priority>1.0</priority></url>"
        "<url><loc>v</loc><priority>high</priority></url></urlset>") == [
        {"loc": "u", "lastmod": None, "priority_x10": 10},
        {"loc": "v", "lastmod": None, "priority_x10": -1}]


def test_parse_sitemap_index():
    from borges_ray.extract import parse_sitemap_index

    xml = ('<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           '<sitemap><loc>https://a.com/sm1.xml</loc>'
           '<lastmod>2026-01-01</lastmod></sitemap>'
           '<sitemap><loc> https://a.com/sm2.xml </loc></sitemap>'
           '<sitemap></sitemap>'  # no loc: dropped
           '</sitemapindex>')
    assert parse_sitemap_index(xml) == [
        "https://a.com/sm1.xml", "https://a.com/sm2.xml"]
    # a LEAF sitemap is not an index: [] so callers fall back
    assert parse_sitemap_index(
        "<urlset><url><loc>u</loc></url></urlset>") == []
    assert parse_sitemap_index("<bad") == []


def test_sniff_kind_batch():
    from borges_ray.extract import sniff_kind_batch

    assert sniff_kind_batch([
        b"%PDF-1.4", b"\x1f\x8b\x08", b"PK\x03\x04", b"\x89PNG\r\n",
        b"  \t\r\n<!DOCTYPE html>", b"<svg>", b"%PD", b"PK\x05\x06",
        b"", None,
    ]) == ["pdf", "gzip", "zip", "png", "html", "html", "other",
           "other", "empty", "empty"]


def test_decode_payload_ladder():
    from borges_ray.extract import decode_payload

    assert decode_payload(b"plain") == ("plain", "utf-8")
    assert decode_payload("café".encode("utf-8")) == ("café", "utf-8")
    # bare 0xE9 is invalid utf-8 -> cp1252 gives the same text
    assert decode_payload(b"caf\xe9") == ("café", "cp1252")
    assert decode_payload(b"") == ("", "empty")
    assert decode_payload(None) == ("", "empty")
    # cp1252-undefined byte replaces rather than raising (total ladder)
    txt, enc = decode_payload(b"\x81x")
    assert enc == "cp1252" and txt.endswith("x")
