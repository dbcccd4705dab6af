"""Text-analysis operators for training-data pipelines.

All operators are pure Spark-SQL column expressions (JVM-side, whole-stage
codegen, no Python in the hot path) over a `(doc_id, text, ...)` table and
are exactly reproducible in ANSI SQL — the driver's DuckDB oracle runs the
same logic. Tokenization here is whitespace-split (the oracle-exact chain);
richer analyzer chains come from bleve_spark.analysis.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..analysis.stopwords_en import ENGLISH_STOP_WORDS
from .util import ensure_parallelism, r4

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


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs
# (whitespace-skipping), the GPT-2 pre-split shape reduced to the
# Java-regex ∩ RE2 common subset (unicode \p classes, no lookaround)
# so Spark and the DuckDB oracle count identically — including CJK
# text, where an unspaced sentence is one letter run in both engines.
BPE_TOKEN_RE = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"


def token_count_bpe(df: DataFrame, text: str = "text") -> DataFrame:
    """Tokenizer-aware token count: BPE-style pre-tokenization runs
    (letters / digits / punctuation) rather than whitespace splits —
    the count a GPT-2-family tokenizer's pre-splitter would produce
    before merges, which is the budgeting signal training pipelines
    actually need (whitespace counts undercount CJK and code by a lot).
    Pure JVM regexp_count; zero shuffle."""
    return df.select(
        "doc_id",
        F.regexp_count(F.col(text), F.lit(BPE_TOKEN_RE))
        .cast("long")
        .alias("n_bpe_tokens"),
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


def chunk_dedup(
    df: DataFrame,
    text: str = "text",
    chunk_tokens: int = 10,
    id_mult: int = 1_000_000,
) -> DataFrame:
    """Corpus-level exact span dedup: the paragraph-dedup stage of
    C4-style pipelines (Raffel et al. 2020 §2.2 dedups three-sentence
    spans; FineWeb dedups paragraphs), re-expressed for token streams
    as fixed-width `chunk_tokens` windows.

    A chunk's canonical occurrence is its earliest (doc_id, chunk_no);
    every later occurrence — in other docs or repeated within one doc —
    counts as duplicated. Per doc: total chunks, duplicated chunks, and
    the duplicated fraction (the signal C4 thresholds on).

    Scale shape: chunks are built per-row with array slicing (no
    shuffle), then ONE groupBy on the chunk string computes the
    first-occurrence key with map-side partial aggregation — hot chunks
    (boilerplate repeated millions of times) partial-combine before the
    exchange, so the shuffle carries one row per distinct chunk per
    partition, and the join back is a plain equi-join Catalyst/AQE can
    re-plan. No windows, no driver state.

    The first-occurrence key is `doc_id * id_mult + chunk_no`
    (lexicographic (doc_id, chunk_no) order so long as every doc has
    fewer than `id_mult` chunks) so the DuckDB oracle reproduces it
    with integer arithmetic; a deployment with unbounded ids would use
    `min(struct(doc_id, chunk_no))` — identical ordering.
    """
    toks = tokens_col(F.col(text))
    n = F.size(toks)
    nchunks = (F.floor((n - F.lit(1)) / F.lit(chunk_tokens)) + 1).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    chunks = ensure_parallelism(df.select("doc_id", text)).select(
        F.col("doc_id"),
        F.posexplode(chunk_arr).alias("chunk_no", "chunk"),
    ).withColumn(
        "occ_key",
        F.col("doc_id").cast("long") * id_mult + F.col("chunk_no"),
    )
    firsts = chunks.groupBy("chunk").agg(
        F.min("occ_key").alias("first_key")
    )
    flagged = chunks.join(firsts, "chunk").withColumn(
        "is_dup", (F.col("occ_key") != F.col("first_key")).cast("int")
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum("is_dup").cast("long").alias("n_dup_chunks"),
        r4(F.sum("is_dup") / F.count("*")).alias("dup_chunk_frac"),
    )


def repetition_metrics(df: DataFrame, text: str = "text") -> DataFrame:
    """Within-document repetition signals from Gopher's quality
    heuristics (Rae et al. 2021, Table A1): duplicate-token fraction,
    the fraction of bigrams occupied by the single most frequent
    bigram, and the duplicate-trigram fraction.

    Implementation note — why a pandas UDF and not column expressions:
    Spark evaluates higher-order array lambdas (transform / filter /
    aggregate) in INTERPRETED mode (no whole-stage codegen), and
    re-evaluates shared subtrees per reference, so the n-gram
    construction + mode count as column expressions measured ~50 ms of
    core time per 100-token doc (and the O(n^2)
    distinct-x-filter mode variant ~70x worse end-to-end). The
    Arrow-batched UDF does the same math in ~0.1 ms/doc with
    Counter/set per doc. Semantics are bit-identical: same 1.0-x
    ordering and the shared r4 half-up rounding, so the DuckDB oracle
    is unchanged. Per-row work, zero shuffle, embarrassingly parallel;
    ensure_parallelism spreads a single-row-group parquet scan (no-op
    on well-partitioned cluster scans).
    """
    import math

    @F.pandas_udf(
        "struct<dup_token_frac:double,top_bigram_frac:double,"
        "dup_trigram_frac:double>"
    )
    def rep_udf(texts: pd.Series) -> pd.DataFrame:
        from collections import Counter

        def r4f(x: float) -> float:
            return math.floor(x * 10000 + 0.5) / 10000.0

        out = {"dup_token_frac": [], "top_bigram_frac": [],
               "dup_trigram_frac": []}
        for t in texts:
            toks = (t or "").split(" ")
            n = len(toks)
            out["dup_token_frac"].append(r4f(1.0 - len(set(toks)) / n))
            bgs = list(zip(toks, toks[1:]))
            out["top_bigram_frac"].append(
                r4f(Counter(bgs).most_common(1)[0][1] / len(bgs))
                if bgs
                else 0.0
            )
            tgs = list(zip(toks, toks[1:], toks[2:]))
            out["dup_trigram_frac"].append(
                r4f(1.0 - len(set(tgs)) / len(tgs)) if tgs else 0.0
            )
        return pd.DataFrame(out)

    src = ensure_parallelism(df.select("doc_id", text))
    return src.select(
        "doc_id", rep_udf(F.col(text)).alias("m")
    ).select(
        "doc_id",
        F.col("m.dup_token_frac").alias("dup_token_frac"),
        F.col("m.top_bigram_frac").alias("top_bigram_frac"),
        F.col("m.dup_trigram_frac").alias("dup_trigram_frac"),
    )


def lm_score(df: DataFrame, text: str = "text") -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020 filters
    CommonCrawl by KenLM perplexity; this is the deterministic
    re-derivation with a unigram LM trained on the corpus itself —
    no external model, same filtering shape: low-probability token
    streams score as high-perplexity garbage).

    Returns per doc the mean log10 unigram probability and the
    unigram perplexity 10^(-mean). No OOV smoothing is needed — the
    LM's training corpus IS the scored corpus.

    Scale: one groupBy(term) trains the LM (map-side partial agg;
    vocabulary-sized result), one shuffle join tokens x LM on term,
    one partial-agg groupBy(doc). The corpus-total token count is a
    vocabulary-sized sum collected as a single scalar. All exchanges
    are keyed on high-cardinality columns; no driver-side loops.
    """
    toks = df.select(
        "doc_id", F.explode(tokens_col(F.col(text))).alias("term")
    )
    lm = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = lm.agg(F.sum("cnt")).collect()[0][0]
    logp = F.log10(F.col("cnt") / F.lit(float(total)))
    scored = toks.join(lm.select("term", logp.alias("logp")), "term")
    avg_lp = F.avg("logp")
    return scored.groupBy("doc_id").agg(
        r4(avg_lp).alias("lm_logprob"),
        r4(F.pow(F.lit(10.0), -avg_lp)).alias("lm_ppl"),
    )


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
