"""Port of the reference sort golden suite
/root/reference/test/tests/sort/ (empty mapping -> all-dynamic standard
analysis; 6 person docs with partially-missing fields): string/numeric/
date sort asc+desc, missing first/last, multi-valued min mode,
multi-column tie-breaks, and search_after/search_before keyset paging on
field, id, and score sorts.

The two score-anchored paging cases use anchors derived from THIS
engine's scores rather than the reference's literal 0.286889: the
reference's _all-composite norm includes prefix-coded numeric/datetime
tokens, a representation detail this engine intentionally replaces with
native columns (SURVEY.md §1.2), so absolute _all scores differ while
ranking semantics match."""

import shutil

import pytest
from pyspark.sql import types as T, functions as F

from bleve_spark import (
    FieldMapping,
    IndexBuilder,
    IndexMapping,
    SearchIndex,
    Searcher,
    SearchRequest,
    parse_query,
)

SUITE_DIR = "/tmp/bleve_spark_sort_suite_index"

PEOPLE = [
    # ref: test/tests/sort/data/{a..f}.json
    ("a", "marty", 19, "2014-11-25", "mista", ["gopher", "belieber"]),
    ("b", "steve", 21, "2000-09-11", "zebra", ["thought-leader", "futurist"]),
    ("c", "aster", 21, "1954-02-02", "blogger", ["red", "blue", "green"]),
    ("d", None, 65, "1978-12-02",
     "agent d is desperately trying out to be successful rapster!", ["cats"]),
    ("e", "nancy", None, "1954-10-22", "rapstar nancy rapster", ["pain"]),
    ("f", "frank", 1, None, "frank the taxman of cb, Rapster!",
     ["vitamin", "purple"]),
]

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("age", T.LongType()),
        T.StructField("born", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)


@pytest.fixture(scope="module")
def sort_index(spark):
    shutil.rmtree(SUITE_DIR, ignore_errors=True)
    m = IndexMapping(default_analyzer="standard", compose_all=True)
    for f in ("name", "title", "tags"):
        m.add(FieldMapping(f))
    corpus = spark.createDataFrame(PEOPLE, schema=SCHEMA)
    IndexBuilder(spark, m, SUITE_DIR).build(corpus, id_expr=F.col("id"))
    return SearchIndex(spark, SUITE_DIR, m)


def run(index, sort, **kw):
    res = Searcher(index).search(
        SearchRequest(
            query=parse_query(kw.pop("query", {"match_all": {}})),
            sort=sort,
            with_total=True,
            **kw,
        )
    )
    return [r["_id"] for r in res.hits.collect()], res.total


SORT_CASES = [
    (["name"], ["c", "f", "a", "e", "b", "d"]),
    (["-name"], ["b", "e", "a", "f", "c", "d"]),
    ([{"by": "field", "field": "name", "missing": "first", "desc": True}],
     ["d", "b", "e", "a", "f", "c"]),
    (["age", "_id"], ["f", "a", "b", "c", "d", "e"]),
    (["-age", "_id"], ["d", "b", "c", "a", "f", "e"]),
    ([{"by": "field", "field": "age", "missing": "first", "desc": True},
      {"by": "id", "desc": False}], ["e", "d", "b", "c", "a", "f"]),
    (["born"], ["c", "e", "d", "b", "a", "f"]),
    (["-born"], ["a", "b", "d", "e", "c", "f"]),
    ([{"by": "field", "field": "born", "missing": "first", "desc": True}],
     ["f", "a", "b", "d", "e", "c"]),
    ([{"by": "field", "field": "tags", "mode": "min"}],
     ["a", "c", "d", "b", "e", "f"]),
    (["age", "name"], ["f", "a", "c", "b", "d", "e"]),
    (["-_id"], ["f", "e", "d", "c", "b", "a"]),
]


@pytest.mark.parametrize("case", SORT_CASES, ids=[str(c[0]) for c in SORT_CASES])
def test_sort_case(sort_index, case):
    sort, exp = case
    ids, total = run(sort_index, sort)
    assert ids == exp
    assert total == 6


def test_search_after_name(sort_index):
    ids, total = run(sort_index, ["name"], search_after=["marty"])
    assert ids == ["e", "b", "d"] and total == 6


def test_search_before_name(sort_index):
    ids, total = run(sort_index, ["name"], search_before=["nancy"])
    assert ids == ["c", "f", "a"] and total == 6


def test_search_after_id(sort_index):
    ids, total = run(sort_index, ["_id"], search_after=["d"])
    assert ids == ["e", "f"] and total == 6


def test_search_before_id(sort_index):
    ids, total = run(sort_index, ["_id"], search_before=["d"])
    assert ids == ["a", "b", "c"] and total == 6


def _rapster_scores(sort_index):
    # full (score, _id) tuple sort: doc d and f tie on score in this
    # engine (equal _all lengths — the reference breaks the tie via
    # numeric-token _all norms it gets from its prefix-coded numerics),
    # so paging anchors use the whole tuple like any robust client would
    res = Searcher(sort_index).search(
        SearchRequest(
            query=parse_query({"query": "rapster"}),
            sort=["_score", "_id"],
            with_total=True,
        )
    )
    return [(r["_id"], r["score"]) for r in res.hits.collect()], res.total


def test_search_after_score(sort_index):
    full, total = _rapster_scores(sort_index)
    assert total == 3 and len(full) == 3
    anchor = [str(full[0][1]), full[0][0]]  # after the 1st hit's tuple
    ids, _ = run(
        sort_index, ["_score", "_id"], query={"query": "rapster"},
        search_after=anchor,
    )
    assert ids == [full[1][0], full[2][0]]


def test_search_before_score(sort_index):
    full, _total = _rapster_scores(sort_index)
    anchor = [str(full[1][1]), full[1][0]]  # before the 2nd hit's tuple
    ids, _ = run(
        sort_index, ["_score", "_id"], query={"query": "rapster"},
        search_before=anchor,
    )
    assert ids == [full[0][0]]
