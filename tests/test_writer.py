"""Incremental write path: batch segments, upsert, delete tombstones,
compaction — the scorch Batch/Delete/merge semantics (SURVEY.md §2.1/2.3;
ref index/scorch/scorch.go:365-443, README.md:108-133, builder.go:135-240)
re-done as immutable parquet segments + read-time masking."""

import shutil

import pytest
from pyspark.sql import functions as F

from bleve_spark import (
    FieldMapping,
    IndexMapping,
    IndexWriter,
    SearchIndex,
    Searcher,
    SearchRequest,
    parse_query,
)

IDX = "/tmp/bleve_spark_writer_test_index"


def _mapping():
    m = IndexMapping(default_analyzer="standard", compose_all=True)
    m.add(FieldMapping("body"))
    return m


def _search_ids(spark, q):
    idx = SearchIndex(spark, IDX, _mapping())
    res = Searcher(idx).search(
        SearchRequest(query=parse_query(q), with_total=True)
    )
    return sorted(r["_id"] for r in res.hits.collect()), res.total


@pytest.fixture(scope="module")
def writer(spark):
    shutil.rmtree(IDX, ignore_errors=True)
    return IndexWriter(spark, _mapping(), IDX)


def test_batch_index_and_search(spark, writer):
    writer.batch_index(
        spark.createDataFrame(
            [("a", "red fox runs"), ("b", "blue cow sleeps")],
            ["id", "body"],
        ),
        id_expr=F.col("id"),
    )
    ids, total = _search_ids(spark, {"field": "body", "term": "fox"})
    assert ids == ["a"] and total == 1


def test_second_batch_appends(spark, writer):
    writer.batch_index(
        spark.createDataFrame(
            [("c", "green fox naps"), ("d", "grey dog digs")],
            ["id", "body"],
        ),
        id_expr=F.col("id"),
    )
    ids, total = _search_ids(spark, {"field": "body", "term": "fox"})
    assert ids == ["a", "c"] and total == 2
    # doc_count spans both segments
    assert SearchIndex(spark, IDX, _mapping()).doc_count == 4


def test_upsert_supersedes_old_version(spark, writer):
    # re-index doc a with new content: old version must disappear
    writer.batch_index(
        spark.createDataFrame([("a", "red wolf howls")], ["id", "body"]),
        id_expr=F.col("id"),
    )
    ids, _ = _search_ids(spark, {"field": "body", "term": "fox"})
    assert ids == ["c"]  # old a is dead
    ids, _ = _search_ids(spark, {"field": "body", "term": "wolf"})
    assert ids == ["a"]
    assert SearchIndex(spark, IDX, _mapping()).doc_count == 4


def test_delete_tombstones(spark, writer):
    writer.delete(["d"])
    ids, total = _search_ids(spark, {"field": "body", "term": "dog"})
    assert ids == [] and total == 0
    assert SearchIndex(spark, IDX, _mapping()).doc_count == 3


def test_doc_added_after_delete_survives(spark, writer):
    writer.batch_index(
        spark.createDataFrame([("d", "grey dog returns")], ["id", "body"]),
        id_expr=F.col("id"),
    )
    ids, _ = _search_ids(spark, {"field": "body", "term": "dog"})
    assert ids == ["d"]
    assert SearchIndex(spark, IDX, _mapping()).doc_count == 4


def test_compact_preserves_results(spark, writer):
    before_fox, _ = _search_ids(spark, {"field": "body", "term": "fox"})
    before_dog, _ = _search_ids(spark, {"field": "body", "term": "dog"})
    writer.compact()
    idx = SearchIndex(spark, IDX, _mapping())
    assert len(idx._seg_metas) == 1
    assert idx.doc_count == 4
    after_fox, _ = _search_ids(spark, {"field": "body", "term": "fox"})
    after_dog, _ = _search_ids(spark, {"field": "body", "term": "dog"})
    assert after_fox == before_fox
    assert after_dog == before_dog
    # tombstones are gone; dictionary df no longer counts dead docs
    assert idx._tombstones is None


def test_snapshot_time_travel(spark):
    """at_seq opens a historical view — the rollback analogue
    (ref: index/scorch/rollback.go)."""
    import shutil as sh

    from pyspark.sql import functions as F

    path = "/tmp/bleve_spark_tt_index"
    sh.rmtree(path, ignore_errors=True)
    m = _mapping()
    from bleve_spark import IndexWriter

    w = IndexWriter(spark, m, path)
    w.batch_index(
        spark.createDataFrame([("a", "first era fox")], ["id", "body"]),
        id_expr=F.col("id"),
    )
    w.batch_index(
        spark.createDataFrame([("b", "second era owl")], ["id", "body"]),
        id_expr=F.col("id"),
    )
    w.delete(["a"])
    now = SearchIndex(spark, path, m)
    assert now.doc_count == 1  # a deleted
    past = SearchIndex(spark, path, m, at_seq=0)
    assert past.doc_count == 1  # only segment 0, before the delete
    res = Searcher(past).search(
        SearchRequest(
            query=parse_query({"field": "body", "term": "fox"}),
            with_total=True,
        )
    )
    assert res.total == 1  # a alive in the old snapshot
    res2 = Searcher(past).search(
        SearchRequest(
            query=parse_query({"field": "body", "term": "owl"}),
            with_total=True,
        )
    )
    assert res2.total == 0  # b does not exist yet at seq 0
