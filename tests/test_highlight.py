"""Highlighter unit + integration tests, mirroring the reference's
fragmenter/formatter tests (/root/reference/search/highlight/fragmenter/
simple/simple_test.go, format/html/html_test.go patterns)."""

from bleve_spark import HighlightRequest, Searcher, SearchRequest
from bleve_spark import query as Q
from bleve_spark.analysis import get_analyzer
from bleve_spark.highlight import (
    best_fragments,
    highlight_text,
    term_locations,
)


def test_term_locations_standard():
    a = get_analyzer("standard")
    text = "The quick brown Fox jumps over the lazy dog"
    locs = term_locations(text, a, {"fox", "dog"})
    assert locs == [(16, 19), (40, 43)]


def test_highlight_html_wraps_matches():
    a = get_analyzer("standard")
    text = "the quick brown fox"
    frags = highlight_text(text, a, {"fox"}, size=200)
    assert frags == ["the quick brown <mark>fox</mark>"]


def test_highlight_ansi_tags():
    a = get_analyzer("standard")
    frags = highlight_text(
        "a fox here", a, {"fox"}, pre="\x1b[43m", post="\x1b[0m"
    )
    assert frags == ["a \x1b[43mfox\x1b[0m here"]


def test_fragment_clipping_ellipses():
    a = get_analyzer("standard")
    text = ("filler " * 50) + "needle" + (" filler" * 50)
    frags = highlight_text(text, a, {"needle"}, size=40)
    assert len(frags) == 1
    assert "<mark>needle</mark>" in frags[0]
    assert frags[0].startswith("…") and frags[0].endswith("…")
    # fragment body (sans tags/ellipses) stays near the requested size
    body = frags[0].replace("<mark>", "").replace("</mark>", "").strip("…")
    assert len(body) <= 60


def test_no_match_returns_leading_fragment():
    a = get_analyzer("standard")
    frags = highlight_text("plain text with nothing", a, {"zzz"}, size=10)
    assert frags == ["plain text…"]


def test_best_fragments_non_overlapping():
    text = "x" * 1000
    locs = [(10, 15), (12, 18), (500, 510)]
    frags = best_fragments(text, locs, size=50, max_fragments=2)
    assert len(frags) == 2
    (s1, e1, _), (s2, e2, _) = frags
    assert e1 <= s2 or e2 <= s1


def test_search_with_highlight(built_index):
    s = Searcher(built_index)
    res = s.search(
        SearchRequest(
            query=Q.TermQuery(field="content", term="return"),
            size=3,
            highlight=HighlightRequest(fields=["content"]),
        )
    )
    rows = res.hits.collect()
    assert rows and "content_fragments" in res.hits.columns
    for r in rows:
        frags = r["content_fragments"]
        assert frags and any("<mark>" in f for f in frags)
