"""Corpus-curation ops: decontamination, PII, code filters, sampling."""

import hashlib

import pytest
from pyspark.sql import functions as F

from bleve_spark.ops import curate


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta", "en"),
        (1, "alpha beta gamma delta epsilon iota kappa mu", "en"),  # shares 5-gram with 0
        (2, "one two three four five six seven eight nine", "en"),
        (3, "tiny doc", "de"),  # < n tokens
        (4, "uno dos tres cuatro cinco seis siete ocho", "es"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_decontaminate_flags_overlap(spark, docs):
    bench = docs.where(F.col("doc_id") == 0)
    out = {
        r["doc_id"]: r
        for r in curate.decontaminate(docs, bench, n=5).collect()
    }
    assert len(out) == 5  # every doc reported, even the short one
    # benchmark doc flags itself on all 4 of its 5-grams
    assert out[0]["n_contaminated"] == 4 and out[0]["contaminated"] == 1
    # doc 1 shares exactly one 5-gram (alpha..epsilon) with the benchmark
    assert out[1]["n_contaminated"] == 1 and out[1]["contaminated"] == 1
    assert out[2]["contaminated"] == 0
    # short doc: no n-grams at all, still present and clean
    assert out[3]["n_ngrams"] == 0 and out[3]["contaminated"] == 0


def test_decontaminate_distinct_ngrams(spark):
    # repeated n-gram in one doc counts once (distinct shingles)
    df = spark.createDataFrame(
        [(0, "a b c d e a b c d e")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "a b c d e")], ["doc_id", "text"])
    row = curate.decontaminate(df, bench, n=5).collect()[0]
    # 10-5+1=6 positions but position 5 repeats position 0's gram
    assert row["n_ngrams"] == 5
    assert row["n_contaminated"] == 1


def test_pii_scan_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (0, "write to bob@corp.io or alice@example.org now"),
            (1, "server at 192.168.0.1 and 10.0.0.2 up"),
            (2, "call +4915112345678 today"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curate.pii_scan(df).collect()}
    assert out[0]["n_emails"] == 2 and out[0]["n_ipv4"] == 0
    assert out[1]["n_ipv4"] == 2
    assert out[2]["n_phones"] == 1
    assert (
        out[3]["n_emails"] == out[3]["n_ipv4"] == out[3]["n_phones"] == 0
    )
    # redaction: placeholders in, original strings out
    exp = hashlib.md5(
        b"write to <EMAIL> or <EMAIL> now"
    ).hexdigest()
    assert out[0]["redacted_md5"] == exp
    # untouched text hashes to itself
    assert (
        out[3]["redacted_md5"]
        == hashlib.md5(b"nothing sensitive here").hexdigest()
    )


def test_code_quality_signals(spark):
    df = spark.createDataFrame(
        [
            (0, "short\na much longer line here\nmid"),
            (1, "// AUTO-GENERATED file, DO NOT EDIT\nx = 1"),
            (2, ""),
            (3, "#### !!!! $$$$"),
        ],
        ["doc_id", "content"],
    )
    out = {r["doc_id"]: r for r in curate.code_quality(df).collect()}
    assert out[0]["n_lines"] == 3
    assert out[0]["max_line_len"] == len("a much longer line here")
    # avg over 5, 23, 3 chars
    assert abs(out[0]["avg_line_len"] - round((5 + 23 + 3) / 3, 4)) < 1e-9
    assert out[0]["is_autogen"] == 0
    assert out[1]["is_autogen"] == 1  # case-insensitive markers
    assert out[2]["n_lines"] == 1 and out[2]["alnum_frac"] == 0.0
    assert out[3]["alnum_frac"] == 0.0  # symbols only


def test_stratified_sample_deterministic(spark, docs):
    rates = {"en": 100, "de": 0, "es": 50}
    a = sorted(
        r["doc_id"]
        for r in curate.stratified_sample(docs, rates).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in curate.stratified_sample(docs, rates).collect()
    )
    assert a == b  # no RNG: identical across runs
    kept = set(a)
    assert {0, 1, 2} <= kept  # en rate 100 keeps all en docs
    assert 3 not in kept  # de rate 0 drops all de docs


def test_stratified_sample_rates_monotone(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    n30 = curate.stratified_sample(df, {"en": 30}).count()
    n60 = curate.stratified_sample(df, {"en": 60}).count()
    n100 = curate.stratified_sample(df, {"en": 100}).count()
    assert n100 == 1000
    # hash buckets are uniform-ish; a higher rate strictly keeps a
    # superset (same bucket function, larger threshold)
    assert n30 < n60 < n100
    assert 200 < n30 < 400 and 500 < n60 < 700


def test_pack_sequences_layout(spark):
    # one bucket -> one concatenation stream; seq_len 10
    rows = [(0, " ".join(["w"] * 7)), (4, " ".join(["w"] * 6)),
            (8, " ".join(["w"] * 12))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in curate.pack_sequences(
            df, seq_len=10, n_buckets=4
        ).collect()
    }
    assert all(r["bucket"] == 0 for r in out.values())
    # doc0: tokens 0-6 -> pack 0 offset 0, stays inside
    assert (out[0]["pack_id"], out[0]["pack_offset"],
            out[0]["crosses_boundary"]) == (0, 0, 0)
    # doc4: tokens 7-12 -> pack 0 offset 7, crosses into pack 1
    assert (out[4]["pack_id"], out[4]["pack_offset"],
            out[4]["crosses_boundary"]) == (0, 7, 1)
    # doc8: tokens 13-24 -> pack 1 offset 3, crosses into pack 2
    assert (out[8]["pack_id"], out[8]["pack_offset"],
            out[8]["crosses_boundary"]) == (1, 3, 1)


def test_pack_sequences_bucket_independence(spark):
    # docs in different buckets pack independently from offset 0
    rows = [(0, "a b c"), (1, "d e f")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in curate.pack_sequences(df, seq_len=10, n_buckets=4).collect()
    }
    assert out[0]["bucket"] == 0 and out[1]["bucket"] == 1
    assert out[0]["pack_offset"] == 0 and out[1]["pack_offset"] == 0


def test_cap_per_source(spark):
    rows = [(i, f"src{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = sorted(
        r["doc_id"]
        for r in curate.cap_per_source(df, max_per_source=3).collect()
    )
    # first 3 by id within each of the 2 sources
    assert kept == [0, 1, 2, 3, 4, 5]


def test_argument_guards(spark, docs):
    with pytest.raises(ValueError, match="n-gram width"):
        curate.decontaminate(docs, docs, n=0)
    with pytest.raises(ValueError, match="seq_len"):
        curate.pack_sequences(docs, seq_len=0)
    with pytest.raises(ValueError, match="max_per_source"):
        curate.cap_per_source(docs, max_per_source=0)
    with pytest.raises(ValueError, match="rate"):
        curate.stratified_sample(docs, {"en": 101})
    with pytest.raises(ValueError, match="rate"):
        curate.stratified_sample(docs, {"en": 50}, default_rate=-1)


def test_token_count_bpe(spark):
    from bleve_spark.ops import text as text_ops

    df = spark.createDataFrame(
        [
            (0, "don't count 42 tokens... 你好世界 foo_bar x2"),
            (1, "plain words here"),
            (2, ""),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in text_ops.token_count_bpe(df).collect()
    }
    # don|'|t|count|42|tokens|...|你好世界|foo|_|bar|x|2
    assert out[0] == 13
    assert out[1] == 3
    assert out[2] == 0


def test_dup_clusters_transitive(spark):
    from bleve_spark.ops import dedup

    # components: {1,2,3} via chain 1-2, 2-3; {10,11}; pair order and
    # direction must not matter
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dup_clusters_long_path_converges(spark):
    from bleve_spark.ops import dedup

    # path graph 0-1-2-...-9: worst-case diameter for propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["doc_a", "doc_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(pairs).collect()
    }
    assert set(out.values()) == {0} and len(out) == 10


def test_dup_clusters_max_iters_raises(spark):
    from bleve_spark.ops import dedup

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(pairs, max_iters=2)


def test_license_detect(spark):
    df = spark.createDataFrame(
        [
            (0, "/* MIT License */ code here"),
            (1, "Licensed under the Apache License, Version 2.0"),
            (2, "Redistribution and use in source and binary forms"),
            (3, "GNU General Public License v3"),
            (4, "no header at all"),
            # priority: MIT signature wins over GPL mention later on
            (5, "Permission is hereby granted, free of charge ... "
                "unlike the GNU General Public License"),
        ],
        ["doc_id", "content"],
    )
    out = {
        r["doc_id"]: (r["license"], r["is_permissive"])
        for r in curate.license_detect(df).collect()
    }
    assert out[0] == ("mit", 1)
    assert out[1] == ("apache-2.0", 1)
    assert out[2] == ("bsd", 1)
    assert out[3] == ("gpl", 0)
    assert out[4] == ("none", 0)
    assert out[5] == ("mit", 1)


def test_dsir_weights_prefer_target_like(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta gamma"),   # target-like
            (1, "totally unrelated words here"),  # off-domain
            (2, "alpha beta delta"),              # mixed
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(100, "alpha beta alpha beta"), (101, "beta gamma alpha")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in curate.dsir_weights(
            corpus, target, n_features=64
        ).collect()
    }
    assert len(out) == 3
    # n_feats = unigrams + bigrams
    assert out[0]["n_feats"] == 5 + 4
    # importance ordering: target-like > mixed > off-domain
    assert (
        out[0]["dsir_logweight"]
        > out[2]["dsir_logweight"]
        > out[1]["dsir_logweight"]
    )


def test_dsir_weights_guard():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_features"):
        curate.dsir_weights(None, None, n_features=1)


def test_lm_score_unigram_values(spark):
    from bleve_spark.ops import text as text_ops

    # corpus: 4 tokens total, p(a)=p(b)=0.5 -> every doc's mean
    # log10 prob is log10(0.5) and unigram perplexity is exactly 2
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r for r in text_ops.lm_score(df).collect()
    }
    assert out[0]["lm_logprob"] == out[1]["lm_logprob"] == -0.301
    assert out[0]["lm_ppl"] == out[1]["lm_ppl"] == 2.0
    # a rarer-token doc scores lower (higher perplexity)
    df2 = spark.createDataFrame(
        [(0, "x x x x x x x x x"), (1, "y")], ["doc_id", "text"]
    )
    out2 = {r["doc_id"]: r for r in text_ops.lm_score(df2).collect()}
    assert out2[1]["lm_ppl"] > out2[0]["lm_ppl"]


def test_stratified_sample_default_rate(spark, docs):
    out = curate.stratified_sample(
        docs, {"en": 0}, default_rate=100
    ).collect()
    langs = {r["lang"] for r in out}
    assert "en" not in langs and {"de", "es"} == langs
