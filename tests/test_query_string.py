"""Query-string parser cases ported from the reference grammar tests
(/root/reference/search/query/query_string_parser_test.go). Pure parser
tests — no Spark session needed."""

import pytest

from bleve_spark import query as Q
from bleve_spark.query_string import parse_query_string


def should_of(q):
    assert isinstance(q, Q.BooleanQuery)
    return q.should


def test_simple_match():
    q = parse_query_string("test")
    assert isinstance(q, Q.MatchQuery) and q.text == "test"


def test_phrase():
    q = parse_query_string('"test phrase 1"')
    assert isinstance(q, Q.MatchPhraseQuery) and q.text == "test phrase 1"


def test_field_term():
    q = parse_query_string("field:test")
    assert isinstance(q, Q.MatchQuery)
    assert q.field == "field" and q.text == "test"


def test_must_mustnot_should():
    q = parse_query_string("+field6:test3 -field7:test4 field8:test5")
    assert isinstance(q, Q.BooleanQuery)
    assert [c.text for c in q.must] == ["test3"]
    assert [c.text for c in q.must_not] == ["test4"]
    assert [c.text for c in q.should] == ["test5"]


def test_boost():
    q = parse_query_string("test^3")
    assert q.boost == 3.0
    q2 = parse_query_string("term^")  # empty boost = 1.0 (ref parser_test)
    assert isinstance(q2, Q.MatchQuery) and q2.text == "term" and q2.boost == 1.0


def test_phrase_boost_and_slop():
    # ADVICE fix: suffixes after the closing quote must bind to the phrase
    q = parse_query_string('"foo bar"^2')
    assert isinstance(q, Q.MatchPhraseQuery)
    assert q.text == "foo bar" and q.boost == 2.0 and q.slop == 0
    q2 = parse_query_string('"foo bar"~2')
    assert isinstance(q2, Q.MatchPhraseQuery) and q2.slop == 2
    q3 = parse_query_string('"foo bar"~1^3')
    assert q3.slop == 1 and q3.boost == 3.0


def test_fuzzy():
    q = parse_query_string("watex~")
    assert isinstance(q, Q.MatchQuery) and q.fuzziness == 1
    q2 = parse_query_string("watex~2")
    assert q2.fuzziness == 2


def test_numeric_ranges():
    q = parse_query_string("field:>5")
    assert isinstance(q, Q.NumericRangeQuery)
    assert q.min == 5.0 and not q.inclusive_min
    q = parse_query_string("field:>=-5")
    assert q.min == -5.0 and q.inclusive_min
    q = parse_query_string("field:<-5")
    assert q.max == -5.0 and not q.inclusive_max
    q = parse_query_string("field:<=5")
    assert q.max == 5.0 and q.inclusive_max


def test_quoted_date_range_endpoints():
    # ref: query_string.y:246-291
    q = parse_query_string('field:>"2006-01-02T15:04:05Z"')
    assert isinstance(q, Q.DateRangeQuery)
    assert q.start == "2006-01-02T15:04:05Z" and not q.inclusive_start
    q2 = parse_query_string('field:<="2006-01-02T15:04:05Z"')
    assert q2.end == "2006-01-02T15:04:05Z" and q2.inclusive_end


def test_bare_number_is_match_or_numeric():
    # ref parser_test "33": disjunction(match "33", numeric ==33)
    q = parse_query_string("field:33")
    assert isinstance(q, Q.DisjunctionQuery)
    m, nr = q.disjuncts
    assert isinstance(m, Q.MatchQuery) and m.text == "33" and m.field == "field"
    assert isinstance(nr, Q.NumericRangeQuery)
    assert nr.min == 33.0 and nr.max == 33.0
    assert nr.inclusive_min and nr.inclusive_max


def test_regexp_and_wildcard():
    q = parse_query_string("name:/mar.*ty/")
    assert isinstance(q, Q.RegexpQuery) and q.regexp == "mar.*ty"
    q2 = parse_query_string("name:mart*")
    assert isinstance(q2, Q.WildcardQuery) and q2.wildcard == "mart*"


def test_escaping():
    # ref parser_test: name\:marty, marty\ couchbase, \+marty
    q = parse_query_string(r"name\:marty")
    assert isinstance(q, Q.MatchQuery) and q.text == "name:marty"
    q2 = parse_query_string(r"marty\ couchbase")
    assert isinstance(q2, Q.MatchQuery) and q2.text == "marty couchbase"
    q3 = parse_query_string(r"\+marty")
    assert isinstance(q3, Q.MatchQuery) and q3.text == "+marty"
    q4 = parse_query_string(r'"what does \"quote\" mean"')
    assert isinstance(q4, Q.MatchPhraseQuery)
    assert q4.text == 'what does "quote" mean'


def test_quoted_field_name():
    q = parse_query_string('"fie ld":test')
    assert isinstance(q, Q.MatchQuery)
    assert q.field == "fie ld" and q.text == "test"


def test_no_junk_empty_clause_from_phrase_suffix():
    # the old regex split "foo bar"^2 into phrase + junk empty clause
    q = parse_query_string('"foo bar"^2 baz')
    assert isinstance(q, Q.BooleanQuery)
    assert len(q.should) == 2
    kinds = {type(c) for c in q.should}
    assert kinds == {Q.MatchPhraseQuery, Q.MatchQuery}


def test_ip_like_stays_match():
    q = parse_query_string("127.0.0.1")
    assert isinstance(q, Q.MatchQuery) and q.text == "127.0.0.1"
