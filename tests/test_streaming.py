"""Streaming ingestion: file stream -> micro-batch segments -> searchable
snapshots (bleve_spark/streaming.py)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F, types as T

from bleve_spark import (
    FieldMapping,
    IndexMapping,
    IndexWriter,
    SearchIndex,
    Searcher,
    SearchRequest,
    parse_query,
)
from bleve_spark.streaming import stream_index

BASE = "/tmp/bleve_spark_streaming_test"
SRC = f"{BASE}/incoming"
IDX = f"{BASE}/index"
CKPT = f"{BASE}/ckpt"

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def _mapping():
    m = IndexMapping(default_analyzer="standard", compose_all=True)
    m.add(FieldMapping("body"))
    return m


def test_stream_ingestion_end_to_end(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(SRC)
    spark.createDataFrame(
        [("a", "streamed fox document"), ("b", "streamed owl document")],
        schema=SCHEMA,
    ).coalesce(1).write.mode("append").parquet(SRC)

    writer = IndexWriter(spark, _mapping(), IDX)
    stream = spark.readStream.schema(SCHEMA).parquet(SRC)
    q = stream_index(
        writer, stream, id_expr=F.col("id"), checkpoint=CKPT
    )
    q.awaitTermination(120)

    idx = SearchIndex(spark, IDX, _mapping())
    assert idx.doc_count == 2
    res = Searcher(idx).search(
        SearchRequest(
            query=parse_query({"field": "body", "term": "fox"}),
            with_total=True,
        )
    )
    assert [r["_id"] for r in res.hits.collect()] == ["a"]

    # second wave of files -> new segment, visible in a fresh snapshot
    spark.createDataFrame(
        [("c", "late fox arrival")], schema=SCHEMA
    ).coalesce(1).write.mode("append").parquet(SRC)
    q2 = stream_index(
        writer, stream, id_expr=F.col("id"), checkpoint=CKPT
    )
    q2.awaitTermination(120)

    idx2 = SearchIndex(spark, IDX, _mapping())
    assert idx2.doc_count == 3
    res2 = Searcher(idx2).search(
        SearchRequest(
            query=parse_query({"field": "body", "term": "fox"}),
            with_total=True,
        )
    )
    assert sorted(r["_id"] for r in res2.hits.collect()) == ["a", "c"]
    # checkpoint made wave 1 exactly-once: still exactly 2 segments
    from bleve_spark.writer import segment_metas

    assert len(segment_metas(IDX)) == 2


def test_streaming_tiered_merge(spark, tmp_path):
    """compact_every triggers the tiered merger: small segments fold
    incrementally, results stay identical."""
    import os

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
    from bleve_spark.streaming import stream_index
    from bleve_spark.writer import MergePlanOptions, segment_metas

    src_dir = str(tmp_path / "src")
    idx_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    m = IndexMapping(default_analyzer="standard")
    m.add(FieldMapping("body"))
    w = IndexWriter(spark, m, idx_dir)
    # 5 waves of 3 docs -> 5 segments without merging
    import json as _json

    for wave in range(5):
        with open(f"{src_dir}/wave{wave}.json", "w") as f:
            for i in range(3):
                f.write(
                    _json.dumps(
                        {"_id": f"w{wave}d{i}", "body": f"common token{wave}"}
                    )
                    + "\n"
                )
        stream = (
            spark.readStream.schema("_id string, body string")
            .option("maxFilesPerTrigger", 1)
            .json(src_dir)
        )
        q = stream_index(
            w,
            stream,
            checkpoint=ckpt,
            compact_every=3,
            merge_opts=MergePlanOptions(
                max_segments_per_tier=2,
                segments_per_merge_task=2,
                floor_segment_size=2,
            ),
        )
        q.awaitTermination()
    # tiered merging kept the segment count below the unmerged 5
    assert len(segment_metas(idx_dir)) < 5
    res = Searcher(SearchIndex(spark, idx_dir, m)).search(
        SearchRequest(query=parse_query({"term": "common"}), size=50)
    )
    assert res.hits.count() == 15


def test_windowed_term_counts(spark, tmp_path):
    """Watermarked tumbling-window term frequencies (append mode after
    watermark passes; here read via complete-mode memory sink)."""
    import json as _json

    from bleve_spark.streaming import windowed_term_counts

    src = str(tmp_path / "wsrc")
    os.makedirs(src)
    rows = [
        ("2024-01-01T10:05:00", "spark merge spark"),
        ("2024-01-01T10:20:00", "merge plan"),
        ("2024-01-01T11:10:00", "spark"),
    ]
    with open(f"{src}/a.json", "w") as f:
        for ts, text in rows:
            f.write(_json.dumps({"ts": ts, "text": text}) + "\n")
    stream = (
        spark.readStream.schema("ts timestamp, text string").json(src)
    )
    counts = windowed_term_counts(
        stream, window="1 hour", watermark="30 minutes"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("wtc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["win"]["start"].hour, r["term"]): r["count"]
        for r in spark.sql("select * from wtc").collect()
    }
    assert got[(10, "spark")] == 2
    assert got[(10, "merge")] == 2
    assert got[(10, "plan")] == 1
    assert got[(11, "spark")] == 1


def test_streaming_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState exact-dedup: state per content hash
    persists ACROSS micro-batches (maxFilesPerTrigger=1 forces three
    batches); duplicates emit (doc_id, dup_of=first seen, nth)."""
    import json as _json

    from bleve_spark.streaming import streaming_dedup

    src = str(tmp_path / "dsrc")
    ckpt = str(tmp_path / "dckpt")
    os.makedirs(src)
    batches = [
        [("a", "red fox"), ("b", "blue cow")],
        [("c", "red fox")],           # dup of a, later batch
        [("d", "blue cow"), ("e", "red fox"), ("f", "green owl")],
    ]
    for i, batch in enumerate(batches):
        with open(f"{src}/b{i}.json", "w") as f:
            for doc_id, text in batch:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("sdup")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dups = {
        r["doc_id"]: (r["dup_of"], r["nth"])
        for r in spark.sql("select * from sdup").collect()
    }
    # file order may vary per listing; identify first-seen per content
    firsts = {v[0] for v in dups.values()}
    # a first-seen doc never also appears as a duplicate
    assert firsts.isdisjoint(dups)
    # exactly three duplicate emissions (6 docs, 3 distinct texts,
    # one text unique)
    assert len(dups) == 3
    # every duplicate points at a doc with the same text
    text_of = dict(
        (d, t) for batch in batches for d, t in batch
    )
    for doc_id, (dup_of, nth) in dups.items():
        assert text_of[doc_id] == text_of[dup_of]
        assert nth >= 2
