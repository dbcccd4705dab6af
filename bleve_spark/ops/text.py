"""Text-analysis operators for training-data pipelines.

All operators are pure Spark-SQL column expressions (JVM-side, whole-stage
codegen, no Python in the hot path) over a `(doc_id, text, ...)` table and
are exactly reproducible in ANSI SQL — the driver's DuckDB oracle runs the
same logic. Tokenization here is whitespace-split (the oracle-exact chain);
richer analyzer chains come from bleve_spark.analysis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..analysis.stopwords_en import ENGLISH_STOP_WORDS
from .util import r4

# small per-language marker sets for the n-gram/stopword language-ID
# heuristic; deterministic and trivially SQL-portable
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "mit", "von", "ein"],
    "fr": ["le", "la", "les", "et", "est", "pour", "avec", "une"],
    "es": ["el", "la", "los", "y", "es", "para", "con", "una"],
}


def tokens_col(text_col: Column) -> Column:
    return F.split(text_col, " ")


def token_count(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count per doc."""
    return df.select(
        "doc_id", F.size(tokens_col(F.col(text))).cast("long").alias("n_tokens")
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Length/stopword/distinct ratios — the standard cheap quality
    signals for corpus filtering."""
    toks = tokens_col(F.col(text))
    stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    n = F.size(toks).cast("double")
    n_stop = F.size(F.array_intersect(toks, stop_arr)).cast("double")
    # note: array_intersect dedups; stop_hits counts *distinct* stopwords
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        r4(n_stop / n).alias("stop_distinct_ratio"),
        r4(n_distinct / n).alias("distinct_ratio"),
        r4(F.length(F.col(text)).cast("double") / n).alias("avg_token_len"),
    )


def language_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Marker-token language ID: argmax of per-language distinct marker
    hits; ties -> 'und'. (A real deployment would swap in fastText/CLD3
    behind the same column contract.)"""
    toks = tokens_col(F.col(text))
    hits = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    # deterministic priority order on ties: en > de > fr > es handled by
    # checking in fixed order for == best
    for lang in ["es", "fr", "de", "en"]:
        pred = F.when(
            (hits[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.select("doc_id", pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (set-semantics rolling-hash analogue)."""
    toks = tokens_col(F.col(text))
    return df.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
        ).alias("fp"),
    )
