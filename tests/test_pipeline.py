"""clean_corpus funnel: every stage fires on a crafted corpus and
attribution follows the declared quality -> repetition -> exact_dup ->
span_dup -> near_dup order."""

import pytest

from bleve_spark.ops import pipeline as pipeline_ops


@pytest.fixture(scope="module")
def corpus(spark):
    w20 = " ".join(f"w{i}" for i in range(20))
    w20_tail = " ".join(f"w{i}" for i in range(19)) + " zz"
    rows = [
        (0, "a b", "en"),  # too short -> quality
        (1, "p q p q p q p q", "en"),  # hot bigram -> repetition
        (2, "m n o p q r", "en"),  # canonical -> kept
        (3, "m n o p q r", "en"),  # byte-identical -> exact_dup
        (4, "o p m n q r", "en"),  # all chunks seen in doc 2 -> span_dup
        (5, w20, "en"),  # kept
        (6, w20_tail, "en"),  # 17/19 shared shingles with 5 -> near_dup
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def _stages(df):
    return {
        r["doc_id"]: r["stage"]
        for r in pipeline_ops.clean_corpus(
            df,
            min_tokens=4,
            min_distinct_ratio=0.2,
            max_top_bigram_frac=0.5,
            max_dup_trigram_frac=0.9,
            chunk_tokens=2,
            max_dup_chunk_frac=0.95,
            neardup_est_jaccard=0.4,
            fingerprint_mode="text",
        ).collect()
    }


def test_funnel_attribution(corpus):
    assert _stages(corpus) == {
        0: "quality",
        1: "repetition",
        2: "kept",
        3: "exact_dup",
        4: "span_dup",
        5: "kept",
        6: "near_dup",
    }


def test_funnel_counts(corpus):
    out = pipeline_ops.clean_corpus(
        corpus,
        min_tokens=4,
        min_distinct_ratio=0.2,
        max_top_bigram_frac=0.5,
        max_dup_trigram_frac=0.9,
        chunk_tokens=2,
        max_dup_chunk_frac=0.95,
        neardup_est_jaccard=0.4,
        fingerprint_mode="text",
    )
    counts = {
        r["stage"]: r["n_docs"] for r in pipeline_ops.funnel(out).collect()
    }
    assert counts == {
        "quality": 1,
        "repetition": 1,
        "exact_dup": 1,
        "span_dup": 1,
        "near_dup": 1,
        "kept": 2,
    }


def test_filtered_doc_never_shields_duplicates(spark):
    # the only copy that would be canonical fails quality, so the later
    # surviving copy becomes canonical instead of being dropped
    rows = [
        (0, "m n", "en"),  # quality-dropped (too short)
        (1, "x y z u v w", "en"),
        (2, "x y z u v w", "en"),  # exact dup of 1 -> dropped; 1 kept
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        r["doc_id"]: r["stage"]
        for r in pipeline_ops.clean_corpus(
            df,
            min_tokens=4,
            min_distinct_ratio=0.2,
            max_top_bigram_frac=0.9,
            max_dup_trigram_frac=0.9,
            chunk_tokens=3,
            max_dup_chunk_frac=0.95,
            neardup_est_jaccard=0.99,
            fingerprint_mode="text",
        ).collect()
    }
    assert out == {0: "quality", 1: "kept", 2: "exact_dup"}


def test_bad_fingerprint_mode(spark):
    df = spark.createDataFrame([(0, "a b c", "en")], ["doc_id", "text", "lang"])
    with pytest.raises(ValueError, match="fingerprint_mode"):
        pipeline_ops.clean_corpus(df, fingerprint_mode="nope")
