"""Training-data pipeline ops: dedup, similarity, text analysis,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bleve_spark.ops import dedup, multimodal, similarity
from bleve_spark.ops import text as text_ops


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (3, "der hund und die katze sind mit dem ball", "de"),
        (4, "completely different words appear here tonight", "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup(docs_df):
    groups = dedup.exact_groups(docs_df).collect()
    dup = [g for g in groups if g["dup_count"] > 1]
    assert len(dup) == 1
    assert dup[0]["dup_count"] == 2 and dup[0]["keep_doc_id"] == 0


def test_ngram_jaccard(docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, k=3, threshold=0.5).collect()
    }
    assert pairs[(0, 2)] == 1.0  # identical
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0  # near-dup
    assert (0, 4) not in pairs


def test_minhash_lsh(docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(docs_df).collect()
    }
    assert pairs[(0, 2)] == 1.0
    assert (3, 4) not in pairs


def test_simhash(docs_df):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs_df).collect()}
    assert sigs[0] == sigs[2]
    ham01 = bin(sigs[0] ^ sigs[1] & (2**64 - 1)).count("1")
    ham04 = bin((sigs[0] ^ sigs[4]) & (2**64 - 1)).count("1")
    assert ham01 < ham04  # near-dup closer than unrelated
    pairs = dedup.simhash_pairs(docs_df, max_hamming=3).collect()
    assert any(p["doc_a"] == 0 and p["doc_b"] == 2 for p in pairs)
    # narrow-band configurations refuse to plan a degenerate join
    with pytest.raises(ValueError, match="all-pairs"):
        dedup.simhash_pairs(docs_df, max_hamming=16)
    # ... unless the caller accepts the cost explicitly
    loose = dedup.simhash_pairs(
        docs_df, max_hamming=16, min_band_bits=3
    ).collect()
    assert any(p["doc_a"] == 0 and p["doc_b"] == 2 for p in loose)


def test_knn_brute_vs_lsh(spark):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((200, 16))
    pdf = pd.DataFrame(
        {"vec_id": range(200), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    q = vecs[0].tolist()
    exact = similarity.brute_force_topk(df, q, k=5, exclude_id=0).collect()
    assert len(exact) == 5
    # full-probe LSH == brute force
    approx = similarity.lsh_topk(
        df, q, k=5, n_planes=8, probe_hamming=8
    ).collect()
    assert [r["vec_id"] for r in approx[:5]] == [
        r["vec_id"] for r in exact
    ] or set(r["vec_id"] for r in approx) & set(r["vec_id"] for r in exact)
    # self-similarity sanity
    withself = similarity.brute_force_topk(df, q, k=1).collect()
    assert withself[0]["vec_id"] == 0 and withself[0]["cos_r"] == 1.0


def test_lsh_topk_tables_parity(spark):
    """Multi-table LSH at probe == planes degenerates to a full scan in
    every table -> identical to brute force; at default probe it is a
    subset whose members keep exact scores."""
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((400, 16))
    pdf = pd.DataFrame(
        {"vec_id": range(400), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    q = vecs[5] + 0.05 * rng.standard_normal(16)
    exact = similarity.brute_force_topk(df, q, k=5).collect()
    full = similarity.lsh_topk_tables(
        df, q, k=5, n_tables=3, n_planes=8, probe_hamming=8
    ).collect()
    assert [(r["vec_id"], r["cos_r"]) for r in full] == [
        (r["vec_id"], r["cos_r"]) for r in exact
    ]
    approx = similarity.lsh_topk_tables(df, q, k=5).collect()
    exact_scores = {r["vec_id"]: r["cos_r"] for r in exact}
    for r in approx:
        if r["vec_id"] in exact_scores:
            assert r["cos_r"] == exact_scores[r["vec_id"]]
    # the planted near-dup of the query is always recalled
    assert approx and approx[0]["vec_id"] == 5


def test_all_pairs_above_full_recall(spark):
    """Banded LSH candidates + exact cosine filter == brute-force all
    pairs at test scale (precision exact by construction; recall from
    24x2 banding: miss < 1e-6 per pair at cos=0.5)."""
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((300, 16))
    vecs[7] = vecs[3] + 0.1 * rng.standard_normal(16)  # planted near-dup
    pdf = pd.DataFrame(
        {"vec_id": range(300), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    got = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in similarity.all_pairs_above(df, threshold=0.5).collect()
    )
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    from bleve_spark.ops.util import r4

    cos = similarity._dot(F.col("va"), F.col("vb")) / (
        similarity._norm(F.col("va")) * similarity._norm(F.col("vb"))
    )
    want = sorted(
        (r["id_a"], r["id_b"], r["c"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("c", r4(cos))
        .where(F.col("c") >= 0.5)
        .collect()
    )
    assert got == want
    assert (3, 7) in {(x, y) for x, y, _ in got}


def test_plan_lsh_bands_scale_guard():
    """Band planner bounds candidate volume at corpus scale and raises
    (like simhash's min_band_bits) when the recall target is
    unreachable, instead of degenerating into an all-pairs join."""
    import math

    import pytest

    from bleve_spark.ops.similarity import (
        LSHBandPlanError,
        plan_lsh_bands,
    )

    # synthetic 10^6-vector corpus at a production near-dup threshold
    n = 1_000_000
    bands, bits = plan_lsh_bands(n, threshold=0.9)
    # candidate volume bound: each band has 2^bits buckets, so a row
    # meets ~n/2^bits candidates per band — bounded by the budget
    assert n / 2**bits <= 64
    # recall bound at the threshold
    p = 1 - math.acos(0.9) / math.pi
    assert (1 - p**bits) ** bands <= 1e-6
    assert bands <= 128
    # total candidate work is ~n * budget * bands << n^2 (the old 2-bit
    # default generated ~n^2/4 pairs per band = 2.5e11 per band at n=1e6)
    assert n * 64 * bands < n * n / 100

    # at the same scale a threshold of 0.5 cannot reach the recall
    # target within the band budget -> loud failure, not quiet blowup
    with pytest.raises(LSHBandPlanError):
        plan_lsh_bands(n, threshold=0.5)

    # small-n plans stay small and recall-safe (the full-recall test
    # above runs this path end-to-end)
    bands, bits = plan_lsh_bands(300, threshold=0.5)
    assert bits <= 4 and bands <= 64


def test_text_ops(docs_df):
    tc = {r["doc_id"]: r["n_tokens"] for r in text_ops.token_count(docs_df).collect()}
    assert tc[0] == 9
    qual = {
        r["doc_id"]: r for r in text_ops.quality_score(docs_df).collect()
    }
    assert qual[0]["distinct_ratio"] == pytest.approx(8 / 9, abs=1e-4)
    langs = {
        r["doc_id"]: r["pred_lang"] for r in text_ops.language_id(docs_df).collect()
    }
    assert langs[0] == "en" and langs[3] == "de"
    fps = {r["doc_id"]: r["fp"] for r in text_ops.fingerprint(docs_df).collect()}
    assert fps[0] == fps[2] and fps[0] != fps[4]


def test_chunk_dedup(spark):
    rows = [
        (0, "a b c d e f", "en"),
        (1, "a b c x y z", "en"),  # first chunk dups doc 0
        (2, "d e f d e f", "en"),  # both chunks dup doc 0's second chunk
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        r["doc_id"]: r
        for r in text_ops.chunk_dedup(df, chunk_tokens=3).collect()
    }
    assert (out[0]["n_chunks"], out[0]["n_dup_chunks"]) == (2, 0)
    assert (out[1]["n_chunks"], out[1]["n_dup_chunks"]) == (2, 1)
    assert out[1]["dup_chunk_frac"] == pytest.approx(0.5)
    # doc 2's repeated chunk dups the earlier doc AND its own repeat
    assert (out[2]["n_chunks"], out[2]["n_dup_chunks"]) == (2, 2)
    assert out[2]["dup_chunk_frac"] == pytest.approx(1.0)


def test_chunk_dedup_ragged_tail(spark):
    # 7 tokens at chunk_tokens=3 -> chunks of 3, 3, 1 (tail not padded)
    df = spark.createDataFrame(
        [(0, "a b c d e f g", "en")], ["doc_id", "text", "lang"]
    )
    out = text_ops.chunk_dedup(df, chunk_tokens=3).collect()[0]
    assert (out["n_chunks"], out["n_dup_chunks"]) == (3, 0)


def test_repetition_metrics(spark):
    rows = [
        (0, "a a a b", "en"),
        (1, "x", "en"),
        (2, "p q p q p q", "en"),
        (3, "u v w x y z", "en"),  # no repetition at all
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        r["doc_id"]: r for r in text_ops.repetition_metrics(df).collect()
    }
    # doc 0: 4 tokens 2 distinct; bigrams [a a, a a, a b] -> top 2/3;
    # trigrams [a a a, a a b] both unique
    assert out[0]["dup_token_frac"] == pytest.approx(0.5)
    assert out[0]["top_bigram_frac"] == pytest.approx(0.6667)
    assert out[0]["dup_trigram_frac"] == pytest.approx(0.0)
    # single-token doc: no n-grams, all-zero signals
    assert (
        out[1]["dup_token_frac"],
        out[1]["top_bigram_frac"],
        out[1]["dup_trigram_frac"],
    ) == (0.0, 0.0, 0.0)
    # doc 2: 6 tokens 2 distinct -> 0.6667; bigrams [pq qp pq qp pq]
    # top 3/5; trigrams [pqp qpq pqp qpq] -> 1 - 2/4
    assert out[2]["dup_token_frac"] == pytest.approx(0.6667)
    assert out[2]["top_bigram_frac"] == pytest.approx(0.6)
    assert out[2]["dup_trigram_frac"] == pytest.approx(0.5)
    assert out[3]["dup_token_frac"] == pytest.approx(0.0)
    assert out[3]["top_bigram_frac"] == pytest.approx(0.2)
    assert out[3]["dup_trigram_frac"] == pytest.approx(0.0)


def test_multimodal_plumbing(spark):
    media = multimodal.synthesize_media(spark, n=12)
    feats = multimodal.extract_features(media, decode_mode="fake").collect()
    assert len(feats) == 12
    f0 = [f for f in feats if f["media_id"] == 0][0]
    assert len(f0["feature"]) == multimodal.FEATURE_DIM
    # deterministic: same payload -> same feature
    feats2 = multimodal.extract_features(media, decode_mode="fake").collect()
    f0b = [f for f in feats2 if f["media_id"] == 0][0]
    assert f0["feature"] == f0b["feature"]
    # real decode is explicitly stubbed
    with pytest.raises(Exception):
        multimodal.extract_features(media, decode_mode="real").collect()


def test_multimodal_pluggable_decoder(spark):
    """A custom MediaDecoder rides the same Arrow plumbing — the
    adapter seam a codec-backed implementation plugs into."""

    class KindLengthDecoder(multimodal.MediaDecoder):
        def features(self, kind, mime, payload):
            v = np.zeros(multimodal.FEATURE_DIM, dtype=np.float32)
            v[0] = float(len(payload))
            v[1] = {"image": 1.0, "audio": 2.0, "video": 3.0}[kind]
            return v

    media = multimodal.synthesize_media(spark, n=6)
    out = {
        r["media_id"]: r
        for r in multimodal.extract_features(
            media, decoder=KindLengthDecoder()
        ).collect()
    }
    assert out[0]["feature"][0] == out[0]["n_bytes"]
    assert out[1]["feature"][1] == 2.0  # media 1 is audio
    assert out[3]["kind"] == "image" and out[3]["feature"][1] == 1.0


def test_ngram_jaccard_hot_shingle_cap(spark):
    """Shingles over max_shingle_df are excluded from candidate
    generation (quadratic-blowup guard) but still count toward the
    exact Jaccard of surviving candidates."""
    rows = (
        # 6 docs share the hot boilerplate prefix; two of them are
        # near-dups beyond it
        [(i, "common boiler plate header text unique%d word%d tail%d" % (i, i, i), "en")
         for i in range(4)]
        + [(10, "common boiler plate header text alpha beta gamma delta", "en"),
           (11, "common boiler plate header text alpha beta gamma epsilon", "en")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    # cap at 3: the boilerplate shingles (shared by all 6 docs) are
    # dropped from candidate generation; the (10,11) pair still
    # surfaces through its distinctive shingles, and its jaccard
    # counts the boilerplate overlap exactly
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, k=3, threshold=0.5, max_shingle_df=3
        ).collect()
    }
    assert (10, 11) in pairs
    # exact jaccard: doc 10/11 shingle sets (k=3, 9 tokens -> 7 each),
    # sharing 6 of them (prefix incl. alpha beta gamma) -> 6/8
    assert pairs[(10, 11)] == pytest.approx(6 / 8, abs=1e-4)
    # pure-boilerplate pairs (0..3 share ONLY >cap shingles) are not
    # candidates at this cap
    assert not any(a < 10 for a, _b in pairs)
