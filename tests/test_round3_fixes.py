"""Regression tests for the round-3 advice fixes:

1. document() pruning with non-string id columns (_idh built over the
   string cast, matching the probe hash).
2. HTTP FilterQuery predicate validation (no F.expr function-call
   surface from untrusted bodies).
3. plan_merges honors max_segment_size when composing a task.
4. UnixParser per-unit bounds (milli/micro/nano were 10^divisor too
   lax) + fromtimestamp overflow mapped to ErrInvalidDateTime.
5. Faceted search unpersists its cached match set.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from bleve_spark import Index, IndexBuilder
from bleve_spark.mapping import IndexMapping, FieldMapping
from bleve_spark.query import (
    UnsafeFilterPredicateError,
    parse_query,
    validate_filter_predicate,
    validate_query_filters,
)


# -- 1. non-string ids ------------------------------------------------------


def test_document_fetch_with_int_ids(spark):
    """Builder.build over an integer id column: _idh must be the hash of
    the STRING form, so document('7') finds the doc (xxhash64 over a
    long column hashes raw int64 bytes and would never match the
    string-literal probe)."""
    path = "/tmp/bleve_spark_intid_test_index"
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(7, "red fox runs"), (8, "blue cow sleeps")], ["doc_num", "body"]
    )
    mapping = IndexMapping(
        fields={"body": FieldMapping(name="body", type="text")}
    )
    IndexBuilder(spark, mapping, path).build(
        df, id_expr=F.col("doc_num")
    )
    idx = Index(spark, path, mapping)
    assert "_idh" in idx.reader().docs.columns
    doc = idx.document(7)
    assert doc is not None and doc["body"] == "red fox runs"
    assert idx.document("8")["body"] == "blue cow sleeps"
    assert idx.document(9) is None
    shutil.rmtree(path, ignore_errors=True)


# -- 2. filter predicate validation -----------------------------------------


def test_filter_predicate_allows_column_comparisons():
    for ok in [
        "lang = 'go'",
        "size >= 10 AND lang != 'py'",
        "NOT (lang = 'go' OR lang = 'py')",
        "lang IN ('go', 'py') AND repo LIKE 'apache%'",
        "stars BETWEEN 1 AND 100",
        "meta.owner IS NOT NULL",
        "`weird col` = 'x''y'",
        "flag = true",
        "score > -1.5e3",
    ]:
        validate_filter_predicate(ok)  # no raise


def test_filter_predicate_rejects_function_calls():
    for bad in [
        "java_method('java.lang.Runtime', 'getRuntime') IS NOT NULL",
        "reflect('java.lang.System', 'getenv') = 'x'",
        "lower(lang) = 'go'",
        "lang = 'go'; drop table x",
        "cast(lang as int) = 1",
        "(select 1) = 1",
        # backtick-quoted call syntax must not bypass the check
        "`java_method`('java.lang.Runtime','getRuntime') IS NOT NULL",
        "`reflect`('a','b') = 1",
        "`select` = 1 AND `cast`(x) = 2",
    ]:
        with pytest.raises(UnsafeFilterPredicateError):
            validate_filter_predicate(bad)


def test_validate_query_filters_walks_tree():
    q = parse_query(
        {
            "conjuncts": [
                {"term": "fox"},
                {
                    "query": {"term": "cow"},
                    "filter": "java_method('a','b') = 1",
                },
            ]
        }
    )
    with pytest.raises(UnsafeFilterPredicateError):
        validate_query_filters(q)
    ok = parse_query(
        {"query": {"term": "cow"}, "filter": "lang = 'go'"}
    )
    validate_query_filters(ok)  # no raise


def test_http_search_rejects_unsafe_filter(spark):
    import json
    import urllib.request

    from bleve_spark.http_api import HttpServer

    base = "/tmp/bleve_spark_http_filter_test"
    shutil.rmtree(base, ignore_errors=True)
    with HttpServer(spark, base) as srv:
        p = srv.port

        def call(method, path, body=None):
            data = json.dumps(body).encode() if body is not None else None
            req = urllib.request.Request(
                f"http://127.0.0.1:{p}{path}", data=data, method=method
            )
            try:
                with urllib.request.urlopen(req) as resp:
                    return resp.status, json.loads(resp.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        call("PUT", "/api/t")
        call("PUT", "/api/t/a", {"body": "red fox"})
        code, res = call(
            "POST",
            "/api/t/_search",
            {
                "query": {
                    "query": {"term": "fox"},
                    "filter": "java_method('java.lang.System','getenv')"
                    " IS NOT NULL",
                }
            },
        )
        assert code == 400 and "not allowed" in res["error"]
        # a plain column comparison still works over HTTP
        code, res = call(
            "POST",
            "/api/t/_search",
            {
                "query": {
                    "query": {"term": "fox"},
                    "filter": "body IS NOT NULL",
                }
            },
        )
        assert code == 200 and res["total_hits"] == 1
    shutil.rmtree(base, ignore_errors=True)


# -- 3. merge plan size cap -------------------------------------------------


def test_plan_merges_respects_max_segment_size():
    from bleve_spark.writer import MergePlanOptions, plan_merges

    opts = MergePlanOptions(
        max_segments_per_tier=10,
        segments_per_merge_task=10,
        floor_segment_size=2_000,
        tier_growth=10.0,
        max_segment_size=5_000_000,
    )
    # 11 segments of 4M live docs: merging even two busts the 5M cap,
    # so no task may be emitted (ref mergeplan skips oversize tasks)
    sizes = {i: 4_000_000 for i in range(11)}
    assert plan_merges(sizes, opts) == []
    # 11 segments of 600k: task stops at 8 members (4.8M <= 5M < 5.4M)
    sizes = {i: 600_000 for i in range(11)}
    plans = plan_merges(sizes, opts)
    assert len(plans) == 1 and len(plans[0]) == 8
    # 12 segments of 2M in one tier: task stops at 2 members (4M <= 5M)
    sizes = {i: 2_000_000 for i in range(12)}
    plans = plan_merges(sizes, opts)
    assert plans == [[0, 1]]
    assert sum(sizes[s] for s in plans[0]) <= opts.max_segment_size


# -- 4. unix parser bounds --------------------------------------------------


def test_unix_parser_unit_bounds():
    from bleve_spark.analysis.datetimes import (
        ErrInvalidDateTime,
        datetime_parser_named,
    )

    # correct bound: (2^63-1) * divisor / 1e9
    cases = {
        "unix_sec": 9_223_372_036,
        "unix_milli": 9_223_372_036_854,
        "unix_micro": 9_223_372_036_854_775,
        "unix_nano": 9_223_372_036_854_775_807,
    }
    for name, bound in cases.items():
        p = datetime_parser_named(name)
        with pytest.raises(ErrInvalidDateTime):
            p.parse(str(bound * 10))
        # the old (divisor^2) formula admitted bound*1000 for milli —
        # which then blew up inside fromtimestamp
        with pytest.raises(ErrInvalidDateTime):
            p.parse(str(bound * 2))


# -- 5. faceted search unpersists ------------------------------------------


def test_faceted_search_releases_cache(built_index):
    from bleve_spark.search import FacetRequest, SearchRequest, Searcher

    spark = built_index.spark
    jsc = spark.sparkContext._jsc.sc()

    def n_cached():
        return jsc.getPersistentRDDs().size()

    before = n_cached()
    res = Searcher(built_index).search(
        SearchRequest(
            query=parse_query({"term": "the", "field": "content"}),
            facets={"lang": FacetRequest(field="lang", size=5)},
            with_total=True,
        )
    )
    # facets and page are already materialized; no cached RDD remains
    assert n_cached() == before
    assert res.facets["lang"].count() >= 0
    assert res.hits.count() >= 0


# -- vector fields: build-time LSH buckets ---------------------------------


def test_vector_field_persisted_buckets(spark):
    """A vector-mapped field gets a multi-table LSH bucket column at
    build time; the kNN scale route then prefilters with a pure-JVM
    bitcount expression (no Python eval in the candidate plan) and
    returns the same top-k as the brute-force route."""
    import numpy as np

    from bleve_spark import IndexBuilder, Searcher
    from bleve_spark.index import SearchIndex
    from bleve_spark.search import KNNRequest, SearchRequest
    from bleve_spark.query import parse_query

    path = "/tmp/bleve_spark_vector_test_index"
    shutil.rmtree(path, ignore_errors=True)
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((50, 8))
    rows = [
        (str(i), f"doc {i}", [float(x) for x in vecs[i]])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["_id", "body", "embedding"])
    mapping = IndexMapping(
        fields={
            "body": FieldMapping(name="body", type="text"),
            "embedding": FieldMapping(name="embedding", type="vector"),
        }
    )
    IndexBuilder(spark, mapping, path).build(df, id_expr=F.col("_id"))
    idx = SearchIndex(spark, path, mapping)
    assert "embedding__buckets" in idx.docs.columns

    q = [float(x) for x in vecs[7]]

    def req():
        return SearchRequest(
            query=parse_query({"term": "doc", "field": "body"}),
            knn=[KNNRequest(field="embedding", vector=q, k=3)],
        )
    brute = Searcher(idx).search(req())
    lsh = Searcher(idx, knn_lsh_min_docs=0, knn_lsh_probe=16).search(
        req()
    )  # probe == planes -> full recall, exercises the bucket route
    bt = [(r["_id"], round(r["score"], 5)) for r in brute.hits.collect()]
    lt = [(r["_id"], round(r["score"], 5)) for r in lsh.hits.collect()]
    assert bt == lt

    # the precomputed-bucket candidate plan is JVM-only
    from bleve_spark.ops.similarity import lsh_candidates_tables

    pre = idx.docs.withColumnRenamed("embedding__buckets", "buckets")
    plan = lsh_candidates_tables(
        pre, q, vec_col="embedding"
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan

    # internal helper column is not exposed by document()
    from bleve_spark import Index

    doc = Index(spark, path, mapping).document("7")
    assert doc is not None and "embedding__buckets" not in doc
    shutil.rmtree(path, ignore_errors=True)


def test_vector_index_rebuild_and_overrides(spark):
    """Rebuilding from a corpus that already carries the persisted
    __buckets column (compact()/merge inputs do) must not produce a
    duplicate column; half-specified all_pairs_above band overrides
    raise instead of being silently replanned."""
    import numpy as np
    import pytest

    from bleve_spark import IndexBuilder
    from bleve_spark.index import SearchIndex
    from bleve_spark.ops.similarity import all_pairs_above

    path = "/tmp/bleve_spark_vector_rebuild_index"
    path2 = path + "_2"
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path2, ignore_errors=True)
    rng = np.random.default_rng(6)
    rows = [
        (str(i), [float(x) for x in rng.standard_normal(8)])
        for i in range(20)
    ]
    # one null vector row: bucket UDF must stay robust, build must
    # still persist buckets (dim sampled via max, not first)
    rows.append(("null", None))
    df = spark.createDataFrame(rows, "str_id string, embedding array<double>")
    mapping = IndexMapping(
        fields={"embedding": FieldMapping(name="embedding", type="vector")}
    )
    IndexBuilder(spark, mapping, path).build(df, id_expr=F.col("str_id"))
    idx = SearchIndex(spark, path, mapping)
    assert idx.docs.columns.count("embedding__buckets") == 1
    # rebuild from the stored plane (the compact()/merge input shape)
    stored = idx.docs.drop("docid", "_idh")
    IndexBuilder(spark, mapping, path2).build(
        stored, id_expr=F.col("_id")
    )
    idx2 = SearchIndex(spark, path2, mapping)
    assert idx2.docs.columns.count("embedding__buckets") == 1

    vec_df = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(30)],
        ["vec_id", "embedding"],
    )
    with pytest.raises(ValueError, match="BOTH"):
        all_pairs_above(vec_df, 0.9, n_bands=48)
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path2, ignore_errors=True)
