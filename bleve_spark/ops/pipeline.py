"""End-to-end corpus cleaning for LLM training-data preparation.

Composes the individually-oracled ops (quality scoring, Gopher
repetition metrics, exact dedup, C4-style span dedup, minhash-LSH
near-dup) into ONE attribution pass: every input document gets the
first pipeline stage that would drop it, or 'kept'. This is the shape
real corpus pipelines (C4, Gopher, FineWeb) publish as their "filter
funnel" table, and the per-stage counts fall out of a groupBy on the
result.

Design for scale:
- Every signal is computed CORPUS-WIDE in one pass (quality and
  repetition are zero-shuffle per-row expressions; span dedup and
  minhash are partial-agg groupBys + equi-joins — see text.py /
  dedup.py for each op's scale notes), then combined with plain
  equi-joins on doc_id. No stage re-scans the corpus conditioned on an
  earlier stage's output, so the whole funnel is a single DAG Catalyst
  optimizes end to end; attribution order is applied as column logic.
- Drop attribution IS sequential where it must be: the exact-dup
  canonical is the min doc_id among same-fingerprint docs that
  SURVIVED the quality+repetition stages (a filtered doc never shields
  its duplicates), and the near-dup rule drops a doc only when a
  smaller-id near-duplicate itself survived stages 1-4. The near-dup
  rule is single-hop (no transitive closure): doc_b is dropped when a
  surviving doc_a < doc_b is est-similar — the deterministic greedy
  rule; a production variant would cluster pairs with union-find and
  keep one doc per component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup
from .text import chunk_dedup, quality_score, repetition_metrics

STAGES = ("quality", "repetition", "exact_dup", "span_dup", "near_dup")


def clean_corpus(
    df: DataFrame,
    text: str = "text",
    *,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_distinct_ratio: float = 0.2,
    max_top_bigram_frac: float = 0.6,
    max_dup_trigram_frac: float = 0.6,
    chunk_tokens: int = 10,
    max_dup_chunk_frac: float = 0.6,
    neardup_est_jaccard: float = 0.8,
    shingle_k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    fingerprint_mode: str = "text",
) -> DataFrame:
    """One row per input doc: (doc_id, stage) where stage is the first
    of quality -> repetition -> exact_dup -> span_dup -> near_dup that
    drops it, else 'kept'.

    fingerprint_mode picks the exact-dup key: 'text' (md5 of the raw
    text — classic exact dedup) or 'token_set' (md5 of the sorted
    distinct token set — catches token-permuted copies, the
    text.fingerprint contract)."""
    if fingerprint_mode == "text":
        fp_col = F.md5(F.col(text))
    elif fingerprint_mode == "token_set":
        fp_col = F.md5(
            F.concat_ws(
                " ",
                F.array_sort(F.array_distinct(F.split(F.col(text), " "))),
            )
        )
    else:
        raise ValueError(
            f"fingerprint_mode must be 'text' or 'token_set', "
            f"got {fingerprint_mode!r}"
        )
    base = df.select("doc_id", fp_col.alias("fp"))
    q = quality_score(df, text).select(
        "doc_id", "n_tokens", "distinct_ratio"
    )
    r = repetition_metrics(df, text).select(
        "doc_id", "top_bigram_frac", "dup_trigram_frac"
    )
    c = chunk_dedup(df, text, chunk_tokens=chunk_tokens).select(
        "doc_id", "dup_chunk_frac"
    )
    j = base.join(q, "doc_id").join(r, "doc_id").join(c, "doc_id")

    drop_quality = (
        (F.col("n_tokens") < min_tokens)
        | (F.col("n_tokens") > max_tokens)
        | (F.col("distinct_ratio") < min_distinct_ratio)
    )
    drop_rep = (
        F.col("top_bigram_frac") > max_top_bigram_frac
    ) | (F.col("dup_trigram_frac") > max_dup_trigram_frac)
    j = j.withColumn("s12", ~drop_quality & ~drop_rep).withColumn(
        "drop_quality", drop_quality
    )

    # exact-dup canonical among quality+repetition survivors
    canon = (
        j.where("s12")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canon_id"))
    )
    j = j.join(canon, "fp", "left")
    drop_exact = F.col("s12") & (F.col("doc_id") != F.col("canon_id"))
    s13 = F.col("s12") & ~drop_exact
    drop_span = s13 & (F.col("dup_chunk_frac") > max_dup_chunk_frac)
    s14 = s13 & ~drop_span
    j = j.withColumn("drop_exact", drop_exact).withColumn(
        "drop_span", drop_span
    ).withColumn("s14", s14)

    # near-dup: docs with a smaller-id, stage-1-4-surviving near-dup
    pairs = dedup.minhash_lsh_pairs(
        df, text, k=shingle_k, n_hashes=n_hashes, bands=bands
    ).where(F.col("est_jaccard") >= neardup_est_jaccard)
    surviving_a = j.where("s14").select(F.col("doc_id").alias("doc_a"))
    dropped_b = (
        pairs.join(surviving_a, "doc_a")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("near_hit", F.lit(True))
    )
    j = j.join(dropped_b, "doc_id", "left")

    stage = (
        F.when(F.col("drop_quality"), F.lit("quality"))
        .when(~F.col("s12"), F.lit("repetition"))
        .when(F.col("drop_exact"), F.lit("exact_dup"))
        .when(F.col("drop_span"), F.lit("span_dup"))
        .when(
            F.col("s14") & F.coalesce(F.col("near_hit"), F.lit(False)),
            F.lit("near_dup"),
        )
        .otherwise(F.lit("kept"))
    )
    return j.select("doc_id", stage.alias("stage"))


def funnel(stages_df: DataFrame) -> DataFrame:
    """Per-stage drop counts from clean_corpus output — the pipeline
    report table."""
    return stages_df.groupBy("stage").agg(
        F.count("*").cast("long").alias("n_docs")
    )
