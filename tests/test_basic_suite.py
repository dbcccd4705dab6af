"""Port of the reference's end-to-end golden suite
/root/reference/test/tests/basic/ (mapping.json + data/{a,b,c,d}.json +
searches.json): same 4-person corpus, same mapping semantics (name:en
analyzer + include_in_all, dynamic standard-analyzed title/tags, numeric
age, datetime birthday), same queries, same expected total_hits and
ordered hit ids (runner model: /root/reference/test/integration_test.go:
176-179)."""

import shutil

import pytest
from pyspark.sql import functions as F, types as T

from bleve_spark import (
    SearchIndex,
    FieldMapping,
    HighlightRequest,
    IndexBuilder,
    IndexMapping,
    SearchIndex,
    Searcher,
    SearchRequest,
    parse_query,
)

SUITE_DIR = "/tmp/bleve_spark_basic_suite_index"

PEOPLE = [
    # ref: test/tests/basic/data/{a,b,c,d}.json
    ("a", "marty", 19, None, "mista", ["gopher", "belieber"]),
    ("b", "steve has <a> long & complicated name", 27,
     "2001-09-09T01:46:40Z", "missess", None),
    ("c", "bob walks home", 64, "2014-05-13T16:53:20Z", "masta", None),
    ("d", "bobbleheaded wings top the phone", 72,
     "2014-05-13T16:53:20Z", "mizz", None),
]

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("age", T.LongType()),
        T.StructField("birthday", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)


@pytest.fixture(scope="module")
def suite_index(spark):
    shutil.rmtree(SUITE_DIR, ignore_errors=True)
    # ref: test/tests/basic/mapping.json — name uses the en analyzer and
    # is included in _all; dynamic fields default to standard
    m = IndexMapping(default_analyzer="standard", compose_all=True)
    m.add(FieldMapping("name", analyzer="en"))
    m.add(FieldMapping("title"))
    m.add(FieldMapping("tags"))
    corpus = spark.createDataFrame(PEOPLE, schema=SCHEMA)
    IndexBuilder(spark, m, SUITE_DIR).build(corpus, id_expr=F.col("id"))
    return SearchIndex(spark, SUITE_DIR, m)


# (comment, search-request dict, expected total, expected ordered ids,
#  optional extra-expectations dict)
CASES = [
    ("term exact", {"query": {"field": "name", "term": "marti"}}, 1, ["a"], None),
    ("term no match", {"query": {"field": "name", "term": "noone"}}, 0, [], None),
    ("match phrase", {"query": {"match_phrase": "steve has"}}, 1, ["b"], None),
    ("unanalyzed term misses", {"query": {"field": "name", "term": "walking"}}, 0, [], None),
    ("match via analysis", {"query": {"field": "name", "match": "walking",
      "fuzziness": 0, "prefix_length": 0}}, 1, ["c"], None),
    ("term prefix", {"query": {"field": "name", "prefix": "bobble"}}, 1, ["d"], None),
    ("query string must", {"query": {"query": "+name:phone"}}, 1, ["d"], None),
    ("numeric no lower", {"query": {"field": "age", "max": 30}}, 2, ["a", "b"], None),
    ("numeric both bounds", {"query": {"field": "age", "max": 30, "min": 20}}, 1, ["b"], None),
    ("conjunction of ranges", {"query": {"conjuncts": [
        {"boost": 1, "field": "age", "min": 20},
        {"boost": 1, "field": "age", "max": 30}]}}, 1, ["b"], None),
    ("date no upper", {"query": {"field": "birthday", "start": "2010-01-01"}}, 2, ["c", "d"], None),
    ("date no lower", {"query": {"field": "birthday", "end": "2010-01-01"}}, 1, ["b"], None),
    ("term in array", {"query": {"field": "tags", "term": "gopher"}}, 1, ["a"], None),
    ("term other array elem", {"query": {"field": "tags", "term": "belieber"}}, 1, ["a"], None),
    ("term not in array", {"query": {"field": "tags", "term": "notintagsarray"}}, 0, [], None),
    ("size 0 keeps total", {"query": {"field": "name", "term": "marti"}, "size": 0}, 1, [], None),
    ("fields returns array", {"query": {"field": "name", "term": "marti"},
      "fields": ["tags"]}, 1, ["a"],
     {"fields": {"a": {"tags": ["gopher", "belieber"]}}}),
    ("fuzzy 1", {"query": {"field": "name", "term": "msrti", "fuzziness": 1}}, 1, ["a"], None),
    ("highlight named field", {"query": {"field": "name", "match": "long"},
      "highlight": {"fields": ["name"]}}, 1, ["b"],
     {"fragments": {"b": {"name":
        ["steve has &lt;a&gt; <mark>long</mark> &amp; complicated name"]}}}),
    ("highlight default fields", {"query": {"field": "name", "match": "long"},
      "highlight": {}}, 1, ["b"],
     {"fragments": {"b": {"name":
        ["steve has &lt;a&gt; <mark>long</mark> &amp; complicated name"]}}}),
    ("request stored fields", {"query": {"field": "name", "match": "long"},
      "fields": ["age", "birthday"]}, 1, ["b"],
     {"fields": {"b": {"age": 27, "birthday": "2001-09-09T01:46:40Z"}}}),
    ("must_not-only query string (bug #193)",
     {"query": {"query": "-title:mista"}}, 3, ["b", "c", "d"], None),
    ("highlight non-matching field whole",
     {"query": {"field": "name", "match": "long"},
      "highlight": {"fields": ["name", "title"]}}, 1, ["b"],
     {"fragments": {"b": {"title": ["missess"]}}}),
    ("highlight array field", {"query": {"field": "tags", "match": "gopher"},
      "highlight": {"fields": ["tags"]}}, 1, ["a"],
     {"fragments": {"a": {"tags": ["<mark>gopher</mark>"]}}}),
    ("prefix bug repro", {"query": {"field": "title", "prefix": "miss"}}, 1, ["b"], None),
    ("match none", {"query": {"match_none": {}}}, 0, [], None),
    ("match all", {"query": {"match_all": {}}}, 4, ["a", "b", "c", "d"], None),
    ("doc id query", {"query": {"ids": ["b", "c"]}}, 2, ["b", "c"], None),
    ("query string must+should", {"query": {"query": "+age:>20 missess"}}, 3,
     ["b", "c", "d"], None),
    ("regexp match", {"query": {"field": "name", "regexp": "mar.*"}}, 1, ["a"], None),
    ("regexp anchored miss", {"query": {"field": "name", "regexp": "mar."}}, 0, [], None),
    ("wildcard", {"query": {"field": "name", "wildcard": "mar*"}}, 1, ["a"], None),
    ("boost term disjunction", {"query": {"disjuncts": [
        {"field": "name", "term": "marti", "boost": 1.0},
        {"field": "name", "term": "steve", "boost": 5.0}]}}, 2, ["b", "a"], None),
    ("boost fuzzy disjunction", {"query": {"disjuncts": [
        {"field": "name", "term": "marti", "boost": 1.0},
        {"fuzziness": 1, "field": "name", "term": "steve", "boost": 5.0}]}},
     2, ["b", "a"], None),
    ("boost numeric-range disjunction", {"query": {"disjuncts": [
        {"field": "name", "term": "marti", "boost": 1.0},
        {"field": "age", "min": 25, "max": 29, "boost": 50.0}]}},
     2, ["b", "a"], None),
    ("boost regexp disjunction", {"query": {"disjuncts": [
        {"field": "name", "term": "marti", "boost": 1.0},
        {"field": "name", "regexp": "stev.*", "boost": 5.0}]}},
     2, ["b", "a"], None),
    ("wildcard in query string", {"query": {"query": "name:mar*"}}, 1, ["a"], None),
    ("regexp in query string", {"query": {"query": "name:/mar.*/"}}, 1, ["a"], None),
    ("term range", {"query": {"field": "title", "max": "miz", "min": "mis"}},
     2, ["a", "b"], None),
]


@pytest.mark.parametrize(
    "case", CASES, ids=[c[0].replace(" ", "_") for c in CASES]
)
def test_basic_suite_case(suite_index, case):
    comment, search, exp_total, exp_ids, extra = case
    req = SearchRequest(
        query=parse_query(search["query"]),
        size=search.get("size", 10),
        from_=search.get("from", 0),
        fields=search.get("fields", ()),
        highlight=(
            HighlightRequest(fields=search["highlight"].get("fields", ()))
            if "highlight" in search
            else None
        ),
        with_total=True,
    )
    res = Searcher(suite_index).search(req)
    rows = res.hits.collect()
    assert res.total == exp_total, comment
    assert [r["_id"] for r in rows] == exp_ids, comment
    if extra and "fields" in extra:
        for r in rows:
            want = extra["fields"].get(r["_id"])
            if want:
                for fname, val in want.items():
                    assert r[fname] == val, (comment, fname)
    if extra and "fragments" in extra:
        for r in rows:
            want = extra["fragments"].get(r["_id"])
            if want:
                for fname, frags in want.items():
                    assert r[f"{fname}_fragments"] == frags, (comment, fname)


def test_ip_range_query(spark, suite_index):
    """IPRangeQuery over a stored dotted-quad column
    (ref: query/ip_range.go, searcher/search_ip_range.go)."""
    import shutil as sh
    from bleve_spark import IndexBuilder
    from pyspark.sql import functions as F

    path = "/tmp/bleve_spark_ip_test_index"
    sh.rmtree(path, ignore_errors=True)
    m = IndexMapping(default_analyzer="keyword", compose_all=True)
    m.add(FieldMapping("host", analyzer="keyword"))
    corpus = spark.createDataFrame(
        [
            ("a", "web1", "192.168.1.10"),
            ("b", "web2", "192.168.1.250"),
            ("c", "db1", "192.168.2.7"),
            ("d", "edge", "10.0.0.1"),
        ],
        ["id", "host", "addr"],
    )
    IndexBuilder(spark, m, path).build(corpus, id_expr=F.col("id"))
    idx = SearchIndex(spark, path, m)

    def ids(cidr):
        res = Searcher(idx).search(
            SearchRequest(
                query=parse_query({"field": "addr", "cidr": cidr}),
                with_total=True,
            )
        )
        return sorted(r["_id"] for r in res.hits.collect())

    assert ids("192.168.1.0/24") == ["a", "b"]
    assert ids("192.168.0.0/16") == ["a", "b", "c"]
    assert ids("10.0.0.1") == ["d"]  # bare address = /32
    assert ids("172.16.0.0/12") == []
