import pyarrow as pa

from borges_ray.canonical import canonicalize
from borges_ray.extract import extract_text, tag_lang
from borges_ray.synth import WebPlan, synth_pages, synth_pages_range, synth_robots, synth_seeds


def test_pages_deterministic_and_golden():
    t1 = synth_pages(42, 300, verify=True)
    t2 = synth_pages(42, 300)
    assert t1.equals(t2)
    assert t1.num_rows == 300
    # golden contract: text == extract_text(html), lang == tag_lang(text)
    for i in range(0, 300, 37):
        assert extract_text(t1["html"][i].as_py()) == t1["text"][i].as_py()
        assert tag_lang(t1["text"][i].as_py()) == t1["lang"][i].as_py()


def test_pages_range_partition_equals_whole():
    whole = synth_pages(42, 200)
    parts = pa.concat_tables(
        [synth_pages_range(42, 200, lo, lo + 64) for lo in range(0, 200, 64)]
    )
    assert whole.equals(parts)


def test_urls_are_canonical_and_unique():
    t = synth_pages(42, 300)
    urls = t["url"].to_pylist()
    assert len(set(urls)) == len(urls)
    assert all(canonicalize(u) == u for u in urls)


def test_zipf_skew():
    plan = WebPlan(42, 1000)
    assert plan.counts[0] > 3 * plan.counts[-1]  # hot-host fixture


def test_seeds_and_robots():
    seeds = synth_seeds(42, 300)
    pages = set(synth_pages(42, 300)["url"].to_pylist())
    hits = [u for u in seeds["url"].to_pylist() if u in pages]
    assert len(hits) >= 1 and len(hits) < seeds.num_rows  # some seeds dead
    robots = synth_robots(42, 300)
    assert robots.num_rows == len(WebPlan(42, 300).hosts)
    dis = robots["disallow_prefixes"].to_pylist()
    assert any(d == ["/private/"] for d in dis) and any(d == [] for d in dis)
    allow = synth_robots(42, 300, allow_all=True)
    assert all(d == [] for d in allow["disallow_prefixes"].to_pylist())
    assert set(allow["crawl_delay_ms"].to_pylist()) == {1000}
