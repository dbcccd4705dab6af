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


# -- round-4: transformWithState processor + 50-batch compaction bound ------


class _FakeValueState:
    """Minimal stand-in for the TWS ValueState client (the real one
    needs the protobuf state-server protocol, absent in this sandbox —
    streaming.has_tws_runtime). Mirrors exists/get/update."""

    def __init__(self, row=None):
        self._row = row

    def exists(self):
        return self._row is not None

    def get(self):
        return self._row

    def update(self, row):
        self._row = tuple(row)


class _FakeHandle:
    def __init__(self, state):
        self._s = state

    def getValueState(self, name, schema, ttl=None):
        return self._s


def _run_processor(proc, state, batches):
    """Drive ExactDedupProcessor.handleInputRows as the TWS runtime
    would: one grouped key, a sequence of micro-batches."""
    import pandas as pd

    proc.init(_FakeHandle(state))
    out = []
    for pdfs in batches:
        for res in proc.handleInputRows(
            ("HASH",), iter(pdfs), timerValues=None
        ):
            out.append(res)
    proc.close()
    return pd.concat(out, ignore_index=True) if out else None


def test_tws_dedup_processor_logic():
    """ExactDedupProcessor semantics match streaming_dedup: first doc
    per content hash passes, later ones emit (dup_of, nth) — state
    carried across micro-batches."""
    import pandas as pd

    from bleve_spark.streaming import ExactDedupProcessor

    state = _FakeValueState()
    out = _run_processor(
        ExactDedupProcessor(),
        state,
        [
            [pd.DataFrame({"doc_id": ["a"]})],
            [pd.DataFrame({"doc_id": ["b", "c"]})],
        ],
    )
    assert list(out["doc_id"]) == ["b", "c"]
    assert list(out["dup_of"]) == ["a", "a"]
    assert list(out["nth"]) == [2, 3]
    assert state.get() == ("a", 3)


def test_tws_dedup_state_schema_evolution():
    """A v1 checkpoint row (first_id only — `seen` added later as a
    nullable column, the evolution TWS supports and the old API does
    not) resumes correctly: count restarts from 1, dup_of survives."""
    import pandas as pd

    from bleve_spark.streaming import ExactDedupProcessor

    for legacy in [("a",), ("a", None)]:
        state = _FakeValueState(legacy)
        out = _run_processor(
            ExactDedupProcessor(),
            state,
            [[pd.DataFrame({"doc_id": ["z"]})]],
        )
        assert list(out["dup_of"]) == ["a"]
        assert list(out["nth"]) == [2]
        assert state.get() == ("a", 2)


@pytest.mark.skipif(
    not __import__("bleve_spark.streaming", fromlist=["x"]).has_tws_runtime(),
    reason="transformWithStateInPandas needs python protobuf "
    "(state-server protocol) — unavailable in this sandbox",
)
def test_streaming_dedup_tws_end_to_end(spark, tmp_path):
    """Full transformWithStateInPandas run (RocksDB state store).
    Skipped here; runs on any image with `protobuf` installed."""
    import json as _json

    from bleve_spark.streaming import streaming_dedup_tws

    src = str(tmp_path / "tsrc")
    ckpt = str(tmp_path / "tckpt")
    os.makedirs(src)
    for i, batch in enumerate(
        [[("a", "red fox"), ("b", "blue cow")], [("c", "red fox")]]
    ):
        with open(f"{src}/b{i}.json", "w") as f:
            for doc_id, text in batch:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        streaming_dedup_tws(stream)
        .writeStream.format("memory")
        .queryName("twsdup")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from twsdup").collect()
    assert [(r["doc_id"], r["dup_of"]) for r in rows] == [("c", "a")]


def test_streaming_dedup_tws_raises_without_runtime(spark, tmp_path):
    from bleve_spark import streaming as S

    if S.has_tws_runtime():
        pytest.skip("protobuf present — covered by the e2e test")
    src = str(tmp_path / "esrc")
    os.makedirs(src)
    stream = spark.readStream.schema("doc_id string, text string").json(src)
    with pytest.raises(RuntimeError, match="protobuf"):
        S.streaming_dedup_tws(stream)


def test_streaming_tiered_merge_50_batches(spark, tmp_path):
    """Verdict item 7 bound: 50 micro-batches through ONE streaming
    query (maxFilesPerTrigger=1) with compact_every=4 — the tiered
    merger must hold the segment count to a logarithmic-ish bound, not
    50, and every doc stays searchable exactly once."""
    import json as _json

    from bleve_spark.writer import MergePlanOptions, segment_metas

    src = str(tmp_path / "msrc")
    idx = str(tmp_path / "midx")
    ckpt = str(tmp_path / "mckpt")
    os.makedirs(src)
    n_batches, per_batch = 50, 2
    for wave in range(n_batches):
        with open(f"{src}/w{wave:03d}.json", "w") as f:
            for i in range(per_batch):
                f.write(
                    _json.dumps(
                        {"_id": f"w{wave}d{i}", "body": f"common tok{wave}"}
                    )
                    + "\n"
                )
    m = _mapping()
    w = IndexWriter(spark, m, idx)
    stream = (
        spark.readStream.schema("_id string, body string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = stream_index(
        w,
        stream,
        checkpoint=ckpt,
        compact_every=4,
        merge_opts=MergePlanOptions(
            max_segments_per_tier=2,
            segments_per_merge_task=4,
            floor_segment_size=8,
        ),
    )
    q.awaitTermination()
    n_seg = len(segment_metas(idx))
    # 50 unmerged segments must have folded hard; 12 allows tier
    # residue but proves continuous compaction kept up
    assert n_seg <= 12, n_seg
    res = Searcher(SearchIndex(spark, idx, m)).search(
        SearchRequest(query=parse_query({"term": "common"}), size=200)
    )
    ids = [r["_id"] for r in res.hits.collect()]
    assert len(ids) == n_batches * per_batch
    assert len(set(ids)) == len(ids)


def test_streaming_curation_stateless_ops(spark, tmp_path):
    """The stateless curation ops (pii_scan, code_quality,
    stratified_sample) are pure column expressions, so they compose
    directly with readStream — the same operator object serves batch
    backfill and the streaming ingest path with no code fork (the
    Structured Streaming unification the engine is designed around)."""
    import json as _json

    from bleve_spark.ops import curate

    src = str(tmp_path / "csrc")
    os.makedirs(src)
    rows = [
        (0, "mail bob@corp.io now", "en"),
        (1, "plain text only", "en"),
        (2, "ping 10.0.0.7 ok", "de"),
    ]
    with open(f"{src}/a.json", "w") as f:
        for i, text, lang in rows:
            f.write(
                _json.dumps({"doc_id": i, "text": text, "lang": lang}) + "\n"
            )
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string"
    ).json(src)
    out = curate.pii_scan(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cur_pii")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["doc_id"]: (r["n_emails"], r["n_ipv4"])
        for r in spark.sql("select * from cur_pii").collect()
    }
    assert got == {0: (1, 0), 1: (0, 0), 2: (0, 1)}

    # sampling as a streaming filter: same rows kept as in batch mode
    kept_stream = curate.stratified_sample(stream, {"en": 100, "de": 0})
    q2 = (
        kept_stream.writeStream.format("memory")
        .queryName("cur_sample")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    kept = sorted(
        r["doc_id"] for r in spark.sql("select * from cur_sample").collect()
    )
    assert kept == [0, 1]
