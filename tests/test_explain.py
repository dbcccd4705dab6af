"""Explanation tree parity: values must equal the actual scores and the
message shapes must mirror the reference's scorer explanations
(/root/reference/search/scorer/scorer_term.go:117-170,
scorer_term_test.go explanation cases)."""

import pytest

from bleve_spark import Searcher, SearchRequest
from bleve_spark import query as Q


def _score_of(index, q, doc_id):
    s = Searcher(index)
    res = s.search(SearchRequest(query=q, size=100))
    for r in res.hits.collect():
        if r["_id"] == doc_id:
            return r["score"]
    return None


def test_term_explanation_matches_score(built_index):
    q = Q.TermQuery(field="content", term="return")
    s = Searcher(built_index)
    hit = s.search(SearchRequest(query=q, size=1)).hits.collect()[0]
    expl = s.explain(q, hit["_id"])
    assert expl["value"] == pytest.approx(hit["score"], rel=1e-12)
    assert expl["message"].startswith("fieldWeight(content:return in ")
    msgs = [c["message"] for c in expl["children"]]
    assert msgs[0].startswith("tf(termFreq(content:return)=")
    assert msgs[1].startswith("fieldNorm(field=content")
    assert msgs[2].startswith("idf(docFreq=")
    # children multiply to the value (product-of semantics)
    prod = 1.0
    for c in expl["children"]:
        prod *= c["value"]
    assert prod == pytest.approx(expl["value"], rel=1e-12)


def test_match_or_explanation_matches_score(built_index):
    q = Q.MatchQuery(field="content", text="return value")
    s = Searcher(built_index)
    hits = s.search(SearchRequest(query=q, size=5)).hits.collect()
    for hit in hits[:3]:
        expl = s.explain(q, hit["_id"])
        assert expl["value"] == pytest.approx(hit["score"], rel=1e-12)


def test_conjunction_explanation_matches_score(built_index):
    q = Q.ConjunctionQuery(
        conjuncts=[
            Q.TermQuery(field="content", term="func"),
            Q.TermQuery(field="content", term="return"),
        ]
    )
    s = Searcher(built_index)
    hit = s.search(SearchRequest(query=q, size=1)).hits.collect()[0]
    expl = s.explain(q, hit["_id"])
    assert expl["value"] == pytest.approx(hit["score"], rel=1e-12)
    assert expl["message"] == "sum of:"
    # each child is a weight(...) node carrying queryNorm
    for c in expl["children"]:
        assert c["message"].startswith("weight(content:")


def test_explain_nonmatching_doc_returns_none(built_index):
    s = Searcher(built_index)
    some_id = s.index.docs.select("_id").limit(1).collect()[0]["_id"]
    assert (
        s.explain(Q.TermQuery(field="content", term="zz_nonexistent"), some_id)
        is None
    )


def test_bm25_term_explanation_matches_score(built_index):
    from bleve_spark import scoring

    q = Q.TermQuery(field="content", term="return")
    s = Searcher(built_index, scoring.BM25)
    hit = s.search(
        SearchRequest(query=q, size=1, similarity=scoring.BM25)
    ).hits.collect()[0]
    expl = s.explain(q, hit["_id"])
    assert expl["value"] == pytest.approx(hit["score"], rel=1e-12)
    msgs = [c["message"] for c in expl["children"]]
    assert msgs[0] == "boost"
    assert msgs[1].startswith("idf(docFreq=")
    assert msgs[2].startswith("tfNorm(freq=")


def test_bm25_match_explanation_matches_score(built_index):
    from bleve_spark import scoring

    q = Q.MatchQuery(field="content", text="return value")
    s = Searcher(built_index, scoring.BM25)
    hits = s.search(
        SearchRequest(query=q, size=3, similarity=scoring.BM25)
    ).hits.collect()
    for hit in hits:
        expl = s.explain(q, hit["_id"])
        assert expl["value"] == pytest.approx(hit["score"], rel=1e-12)


def test_phrase_explanation_matches_score(built_index):
    q = Q.MatchPhraseQuery(field="content", text="apache license")
    s = Searcher(built_index)
    hits = s.search(SearchRequest(query=q, size=3)).hits.collect()
    assert hits, "phrase fixture must match"
    for hit in hits:
        expl = s.explain(q, hit["_id"])
        assert expl is not None
        assert expl["value"] == pytest.approx(hit["score"], rel=1e-12)
    # a phrase with no position path explains to None even when the
    # terms are present (order matters)
    q_rev = Q.MatchPhraseQuery(field="content", text="version apache")
    assert s.explain(q_rev, hits[0]["_id"]) is None
