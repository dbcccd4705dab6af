"""Ports of the reference fosdem and employee golden suites
(/root/reference/test/tests/{fosdem,employee}): mixed keyword/en field
mappings with _all-composite query-string searches; dotted-path array
fields with unicode terms."""

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

FOSDEM_DIR = "/tmp/bleve_spark_fosdem_suite_index"
EMP_DIR = "/tmp/bleve_spark_employee_suite_index"

LISP_DESC = (
    "From Prolog to Erlang to Haskell to Lisp to TLC and then back to "
    "Prolog I have journeyed, and I'd like to share some of the beautiful"
)

TALKS = [
    # ref: test/tests/fosdem/data/*.json (id, description, category)
    ("3311@FOSDEM15@fosdem.org", LISP_DESC, "Word"),
    ("3492@FOSDEM15@fosdem.org", "different cats", "Perl"),
    ("3496@FOSDEM15@fosdem.org", "many cats", "Perl"),
    ("3505@FOSDEM15@fosdem.org", LISP_DESC, "Perl"),
    ("3507@FOSDEM15@fosdem.org", LISP_DESC.replace("Lisp", "Gel"), "Perl"),
]


@pytest.fixture(scope="module")
def fosdem_index(spark):
    shutil.rmtree(FOSDEM_DIR, ignore_errors=True)
    # ref: fosdem mapping.json — category/url keyword, description/summary
    # en, default analyzer en, default field _all
    m = IndexMapping(default_analyzer="en", compose_all=True)
    m.add(FieldMapping("description", analyzer="en"))
    m.add(FieldMapping("category", analyzer="keyword"))
    corpus = spark.createDataFrame(TALKS, ["id", "description", "category"])
    IndexBuilder(spark, m, FOSDEM_DIR).build(corpus, id_expr=F.col("id"))
    return SearchIndex(spark, FOSDEM_DIR, m)


FOSDEM_CASES = [
    ({"field": "category", "match_phrase": "Perl"}, 4,
     ["3492@FOSDEM15@fosdem.org", "3496@FOSDEM15@fosdem.org",
      "3505@FOSDEM15@fosdem.org", "3507@FOSDEM15@fosdem.org"]),
    ({"match": "lisp"}, 2,
     ["3311@FOSDEM15@fosdem.org", "3505@FOSDEM15@fosdem.org"]),
    ({"boost": 1, "query": "+lisp +category:Perl"}, 1,
     ["3505@FOSDEM15@fosdem.org"]),
    ({"boost": 1, "query": '+lisp +category:"Perl"'}, 1,
     ["3505@FOSDEM15@fosdem.org"]),
    ({"must": {"conjuncts": [
        {"boost": 1, "query": "+cats"},
        {"field": "category", "match_phrase": "Perl"}]}}, 2,
     ["3492@FOSDEM15@fosdem.org", "3496@FOSDEM15@fosdem.org"]),
]


@pytest.mark.parametrize("case", FOSDEM_CASES, ids=[str(i) for i in range(len(FOSDEM_CASES))])
def test_fosdem_case(fosdem_index, case):
    query, exp_total, exp_ids = case
    res = Searcher(fosdem_index).search(
        SearchRequest(query=parse_query(query), with_total=True)
    )
    assert res.total == exp_total
    assert sorted(r["_id"] for r in res.hits.collect()) == exp_ids


@pytest.fixture(scope="module")
def employee_index(spark):
    shutil.rmtree(EMP_DIR, ignore_errors=True)
    # ref: employee suite — dotted-path array field (manages.reports);
    # nested paths flatten to dotted columns at ingest (SURVEY.md §1.2)
    m = IndexMapping(default_analyzer="standard", compose_all=True)
    m.add(FieldMapping("name"))
    m.add(FieldMapping("dept"))
    m.add(FieldMapping("manages.reports"))
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("dept", T.StringType()),
            T.StructField("manages.reports", T.ArrayType(T.StringType())),
        ]
    )
    corpus = spark.createDataFrame(
        [
            (
                "emp10508560",
                "Deirdre Reed",
                "Accounts",
                [
                    "Gallia Julián",
                    "Duvessa Nicolás",
                    "Beryl Thomas",
                    "Deirdre Julián",
                    "Antonia Gerónimo",
                    "Ciara Young",
                    "Riona Richardson IX",
                    "Severin Jr.",
                    "Perdita Morgan",
                ],
            )
        ],
        schema=schema,
    )
    IndexBuilder(spark, m, EMP_DIR).build(corpus, id_expr=F.col("id"))
    return SearchIndex(spark, EMP_DIR, m)


def test_employee_unicode_term_in_nested_array(employee_index):
    # ref: employee searches.json — term "julián" on manages.reports with
    # includeLocations; golden locations: pos 2, BYTE offsets 7-14/8-15,
    # array_positions [0] and [3]
    res = Searcher(employee_index).search(
        SearchRequest(
            query=parse_query(
                {"field": "manages.reports", "term": "julián"}
            ),
            with_total=True,
            include_locations=True,
        )
    )
    rows = res.hits.collect()
    assert res.total == 1
    assert [r["_id"] for r in rows] == ["emp10508560"]
    locs = rows[0]["locations"]["manages.reports"]["julián"]
    got = sorted(
        (l["pos"], l["start"], l["end"], tuple(l["array_positions"]))
        for l in locs
    )
    assert got == [(2, 7, 14, (0,)), (2, 8, 15, (3,))]


def test_employee_term_not_crossing_elements(employee_index):
    # phrase across two array elements must not match
    res = Searcher(employee_index).search(
        SearchRequest(
            query=parse_query(
                {"field": "manages.reports", "match_phrase": "Julián Duvessa"}
            ),
            with_total=True,
        )
    )
    assert res.total == 0
