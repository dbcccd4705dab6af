"""Per-row content sha256 ingest invariant (BASELINE.json input_hint):
content bytes must survive every pipeline stage unchanged."""

import hashlib

from pyspark.sql import functions as F


def test_corpus_sha256_recorded(corpus_pdf):
    # synthesis-recorded hash matches recomputation
    for _, row in corpus_pdf.head(50).iterrows():
        assert (
            hashlib.sha256(row["content"].encode()).hexdigest()
            == row["content_sha256"]
        )


def test_docs_stage_preserves_content(spark, corpus_pdf, built_index):
    """After docid assignment + docs-table write, every row's content
    sha256 equals the synthesis-recorded value."""
    expected = {
        f"{r.repo}|{r.path}|{r.commit}": r.content_sha256
        for r in corpus_pdf.itertuples()
    }
    got = (
        built_index.docs.select(
            "_id", F.sha2(F.col("content"), 256).alias("h")
        )
        .collect()
    )
    assert len(got) == len(expected)
    for row in got:
        assert expected[row["_id"]] == row["h"], row["_id"]


def test_docid_dense_and_deterministic(built_index):
    rows = built_index.docs.select("docid", "_id").orderBy("docid").collect()
    assert [r["docid"] for r in rows] == list(range(len(rows)))
    # docid order is (hash-bucket, _id) order — a pure function of the
    # data (build.assign_docids); cross-partition-count equality is
    # asserted in test_properties.py
    ids = [r["_id"] for r in rows]
    assert len(set(ids)) == len(ids)
