"""Tests for API-JSON record shaping (M17), abstract↔fulltext merge (J5),
and keyed overwrite (S8)."""

import pandas as pd
import pytest

from borges_ray.ops.records import (
    DUP_ABSTRACT_ERR,
    NON_ABSTRACT_ERR,
    merge_abstract_fulltext,
    parse_api_record,
)


def test_parse_api_record_full():
    res = {"prism:coverDate": "2013-05-01", "prism:doi": "10.1016/j.1",
           "dc:title": "T", "openaccessFlag": True,
           "dc:creator": [{"$": "Lee, Sam"}],
           "authors": {"author": [{"$": "Kim, Min"}]},
           "prism:issueIdentifier": "4"}
    r = parse_api_record(res, "J", "Scopus")
    assert r["published_year"] == 2013 and r["doi"] == "10.1016/j.1"
    assert r["open_access"] is True and r["issue"] == 4
    assert r["authors"] == ["Sam Lee", "Min Kim"]
    assert r["crawled"] is False and r["publisher"] == "Elsevier"


def test_parse_api_record_null_branches():
    r = parse_api_record({"authors": "rawval", "prism:issueIdentifier": "n/a"},
                         "J", "SciDir")
    assert r["published_year"] is None and r["doi"] is None
    assert r["title"] is None and r["issue"] is None
    assert r["open_access"] is False          # missing openaccessArticle
    assert r["authors"] == "rawval"           # creator KeyError → raw fallback


def test_merge_abstract_branches():
    m, e = merge_abstract_fulltext(
        "<r><abstract><p>A.</p></abstract></r>",
        "<r><fulltext><p>F.</p></fulltext></r>")
    assert (m, e) == ("A. F.", None)
    # duplicated abstract → first instance + note
    m, e = merge_abstract_fulltext(
        "<r><abstract><p>A.</p></abstract><abstract><p>A.</p></abstract></r>",
        "<r><fulltext><p>F.</p></fulltext></r>")
    assert (m, e) == ("A. F.", DUP_ABSTRACT_ERR)
    # key-points abstracts excluded; no <p> abstracts → error, fulltext only
    m, e = merge_abstract_fulltext(
        '<r><abstract abstract-type="key-points"><p>KP.</p></abstract>'
        "<abstract><note>x</note></abstract></r>",
        "<r><fulltext><p>F.</p></fulltext><fulltext><p>F.</p></fulltext></r>")
    assert (m, e) == ("F.", NON_ABSTRACT_ERR)


def test_keyed_overwrite_untouched_rows_identical(ray_session):
    import ray.data as rd

    from borges_ray.ops.records import keyed_overwrite

    base = pd.DataFrame({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
    upd = pd.DataFrame({"k": [2, 5], "v": ["B2", "E2"]})
    out = keyed_overwrite(rd.from_pandas(base), rd.from_pandas(upd), "k")
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    want = pd.DataFrame({"k": [1, 2, 3, 4, 5],
                         "v": ["a", "B2", "c", "d", "E2"]})
    pd.testing.assert_frame_equal(got, want)


def test_snapshot_diff_classification(ray_session):
    """added/removed/changed/unchanged across two snapshots, including the
    NULL-payload corners (present-with-null != absent; both-null payloads
    are unchanged)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from borges_ray.ops.records import snapshot_diff

    old = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int64),
                        "v": ["a", "b", None, None]})
    new = pd.DataFrame({"k": np.array([2, 3, 4, 5], dtype=np.int64),
                        "v": ["B", None, "now-set", "fresh"]})
    out = (snapshot_diff(rd.from_pandas(old).repartition(2),
                         rd.from_pandas(new).repartition(3), "k", "v")
           .to_pandas().sort_values("k", ignore_index=True))
    got = dict(zip(out["k"], out["change"]))
    assert got == {1: "removed", 2: "changed", 3: "unchanged",
                   4: "changed", 5: "added"}
