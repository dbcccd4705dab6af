"""Port of the reference facet golden suite
/root/reference/test/tests/facet/ (10 inventory docs; terms, numeric-
range, and date-range facets over a term-query hit set)."""

import shutil

import pytest
from pyspark.sql import functions as F

from bleve_spark import (
    FacetRequest,
    FieldMapping,
    IndexBuilder,
    IndexMapping,
    SearchIndex,
    Searcher,
    SearchRequest,
    parse_query,
)

SUITE_DIR = "/tmp/bleve_spark_facet_suite_index"

INVENTORY = [
    # ref: test/tests/facet/data/{a..j}.json
    ("a", "inventory", "book", 2, "2014-11-25"),
    ("b", "inventory", "book", 7, "2013-07-25"),
    ("c", "inventory", "book", 1, "2014-03-03"),
    ("d", "inventory", "book", 9, "2014-09-16"),
    ("e", "inventory", "book", 5, "2014-11-15"),
    ("f", "inventory", "movie", 3, "2017-06-05"),
    ("g", "inventory", "movie", 9, "2011-10-03"),
    ("h", "inventory", "movie", 9, "2019-08-26"),
    ("i", "inventory", "movie", 1, "2014-12-14"),
    ("j", "inventory", "game", 9, "2013-10-20"),
]


@pytest.fixture(scope="module")
def facet_index(spark):
    shutil.rmtree(SUITE_DIR, ignore_errors=True)
    m = IndexMapping(default_analyzer="standard", compose_all=True)
    m.add(FieldMapping("category"))
    m.add(FieldMapping("type"))
    corpus = spark.createDataFrame(
        INVENTORY, ["id", "category", "type", "rating", "updated"]
    )
    IndexBuilder(spark, m, SUITE_DIR).build(corpus, id_expr=F.col("id"))
    return SearchIndex(spark, SUITE_DIR, m)


def run_facet(index, facet):
    res = Searcher(index).search(
        SearchRequest(
            query=parse_query({"field": "category", "term": "inventory"}),
            size=0,
            facets={"types": facet},
            with_total=True,
        )
    )
    assert res.total == 10
    assert res.hits.collect() == []
    return res.facets["types"].collect()


def test_terms_facet(facet_index):
    rows = run_facet(facet_index, FacetRequest(field="type", size=3))
    assert [(r["term"], r["count"]) for r in rows] == [
        ("book", 5),
        ("movie", 4),
        ("game", 1),
    ]


def test_numeric_range_facet(facet_index):
    rows = run_facet(
        facet_index,
        FacetRequest(
            field="rating",
            size=3,
            numeric_ranges=[
                {"name": "low", "max": 5},
                {"name": "high", "min": 5},
            ],
        ),
    )
    assert [(r["range"], r["count"]) for r in rows] == [
        ("high", 6),
        ("low", 4),
    ]


def test_date_range_facet(facet_index):
    rows = run_facet(
        facet_index,
        FacetRequest(
            field="updated",
            size=3,
            date_ranges=[
                {"name": "old", "end": "2012-01-01"},
                {"name": "new", "start": "2012-01-01"},
            ],
        ),
    )
    assert [(r["range"], r["count"]) for r in rows] == [
        ("new", 9),
        ("old", 1),
    ]
