"""Similarity models.

1. ``tfidf`` — the reference's exact Lucene-classic model, the rank/score
   parity target (/root/reference/search/scorer/scorer_term.go:64-170):
     idf        = 1 + ln(N / (df + 1))
     tf         = sqrt(freq)
     fieldNorm  = float32(1 / sqrt(fieldLength))
     score      = tf * fieldNorm * idf            [ * queryWeight ]
     queryWeight= boost * idf * queryNorm  (only when a composite pushed
                  a queryNorm; ref scorer_term.go:92-115)
     weight     = (boost * idf)^2
     queryNorm  = 1 / sqrt(sum of leaf weights)   (ref:
                  search_conjunction.go:108-120, search_boolean.go:92-103)

2. ``bm25`` — BM25(k1=1.2, b=0.75) per the north rule (absent in the
   reference snapshot; grep bm25 -> zero non-test hits):
     idf   = ln(1 + (N - df + 0.5) / (df + 0.5))
     score = boost * idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avgLen))
   (no queryNorm/coord — Lucene's BM25 practice.)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

BM25_K1 = 1.2
BM25_B = 0.75

TFIDF = "tfidf"
BM25 = "bm25"


def idf(similarity: str, n_docs: int, df: int) -> float:
    if similarity == TFIDF:
        # ref: scorer_term.go:71
        return 1.0 + math.log(float(n_docs) / float(df + 1))
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def term_weight(similarity: str, boost: float, idf_val: float) -> float:
    """Leaf weight fed into queryNorm (ref: scorer_term.go:92-96)."""
    if similarity == TFIDF:
        w = boost * idf_val
        return w * w
    return 0.0  # bm25: no queryNorm


def term_score_col(
    similarity: str,
    tf_col: Column,
    len_col: Column,
    idf_val: float,
    boost: float,
    query_norm: float | None,
    avg_len: float,
) -> Column:
    """Per-posting score column for one term."""
    if similarity == TFIDF:
        # float32 norm emulation for parity
        # (ref: index/upsidedown/upsidedown.go:608-609)
        norm = (F.lit(1.0) / F.sqrt(F.greatest(len_col, F.lit(1)))).cast(
            "float"
        ).cast("double")
        score = F.sqrt(tf_col.cast("double")) * norm * F.lit(idf_val)
        if query_norm is not None:
            score = score * F.lit(boost * idf_val * query_norm)
        return score
    tf_d = tf_col.cast("double")
    denom = tf_d + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * len_col.cast("double") / F.lit(max(avg_len, 1e-9))
    )
    return F.lit(boost * idf_val) * tf_d * F.lit(BM25_K1 + 1.0) / denom


def tfidf_score_py(
    tf: float, length: float, idf_val: float, query_weight: float = 1.0
) -> float:
    """Driver-side scalar version (for golden tests)."""
    import numpy as np

    norm = float(np.float32(1.0 / math.sqrt(max(length, 1))))
    return math.sqrt(tf) * norm * idf_val * query_weight


def bm25_score_py(
    tf: float, length: float, idf_val: float, avg_len: float, boost: float = 1.0
) -> float:
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * length / max(avg_len, 1e-9))
    return boost * idf_val * tf * (BM25_K1 + 1.0) / denom
