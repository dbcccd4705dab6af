"""Deduplication operators.

Scale design: every operator is a pure shuffle-keyed DataFrame pipeline —
exact dedup is one groupBy on a content hash; near-dup generates candidate
pairs ONLY through equi-join keys (shared shingle / LSH band bucket), never
a cross join, so cost is bounded by bucket sizes, and hot buckets can be
capped. md5 is the shared hash everywhere so the DuckDB oracle reproduces
results bit-for-bit.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from .util import ensure_parallelism, r4


def exact_groups(df: DataFrame, text: str = "text") -> DataFrame:
    """Exact duplicate groups by md5(text): (text_hash, dup_count,
    keep_doc_id) — keep the smallest doc_id per group."""
    return (
        df.groupBy(F.md5(F.col(text)).alias("text_hash"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def _shingles(text_col: Column, k: int) -> Column:
    """Distinct word k-gram shingles via transform over token positions
    (JVM-side, no UDF)."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_sets(df: DataFrame, text: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct rows + per-doc set size."""
    sh = ensure_parallelism(df.select("doc_id", text)).select(
        "doc_id", F.explode(_shingles(F.col(text), k)).alias("shingle")
    )
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    text: str = "text",
    k: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Near-dup pairs by k-gram shingle Jaccard >= threshold.

    Candidate generation = self-equi-join on shingle (co-partitioned
    shuffle join on the shingle key). Shingles shared by more than
    `max_shingle_df` docs are EXCLUDED from candidate generation — one
    boilerplate shingle shared by m docs otherwise makes m^2 candidate
    rows, the classic quadratic blowup on web/code corpora. The
    Jaccard itself is still computed over the FULL shingle sets
    (|A∩B| counts hot shingles too), so results are exact for every
    pair that shares at least one sub-cap shingle; only pairs whose
    overlap is exclusively >cap boilerplate are missed, which at a
    0.6 threshold means m near-identical copies of one hot template —
    exact-dedup's job, not Jaccard's.
    """
    sh = shingle_sets(df, text, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("sdf"))
        .where(F.col("sdf") > max_shingle_df)
        .select("shingle")
    )
    cand_sh = sh.join(hot, "shingle", "left_anti")
    a = cand_sh.alias("a")
    b = cand_sh.alias("b")
    cands = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # exact |A∩B| for the candidates over the FULL shingle sets
    fa = sh.alias("fa")
    fb = sh.alias("fb")
    common = (
        cands.join(fa, F.col("fa.doc_id") == F.col("doc_a"))
        .join(
            fb,
            (F.col("fb.doc_id") == F.col("doc_b"))
            & (F.col("fb.shingle") == F.col("fa.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b")
    )
    return (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            r4(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, text: str = "text", k: int = 3, n_hashes: int = 16
) -> DataFrame:
    """(doc_id, h (hash index), minhash): minhash_j = min over shingles of
    md5(j:shingle) — md5-keyed so any SQL engine reproduces it.

    Computed as n_hashes min-aggregates over ONE pass of the shingle
    rows (map-side partial min per aggregate), instead of exploding
    every shingle x n_hashes into the shuffle: shuffle volume is
    docs x n_hashes partial minima, not shingles x n_hashes rows. The
    md5 inputs are identical to the old explode formulation, so
    signatures (and the DuckDB oracle) are unchanged."""
    sh = shingle_sets(df, text, k)
    aggs = [
        F.min(
            F.md5(F.concat_ws(":", F.lit(j), F.col("shingle")))
        ).alias(f"mh{j}")
        for j in range(n_hashes)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("h"), F.col(f"mh{j}").alias("minhash")
            )
            for j in range(n_hashes)
        ]
    )
    return wide.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", "p.h", "p.minhash")


def minhash_lsh_pairs(
    df: DataFrame,
    text: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs via banded minhash-LSH: band signature =
    concat of the band's minhashes; docs sharing any band bucket pair up.
    Returns (doc_a, doc_b, est_jaccard) where est = fraction of matching
    minhash components."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text, k, n_hashes)
    banded = sig.withColumn(
        "band", (F.col("h") / rows_per_band).cast("int")
    )
    band_keys = banded.groupBy("doc_id", "band").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("minhash"))).alias(
            "band_key"
        )
    )
    a = band_keys.alias("a")
    b = band_keys.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # estimate similarity = matching minhash fraction
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "h", F.col("minhash").alias("mh_a")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "h", F.col("minhash").alias("mh_b")
    )
    est = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(
            r4(
                F.sum((F.col("mh_a") == F.col("mh_b")).cast("int"))
                / F.lit(n_hashes)
            ).alias("est_jaccard")
        )
    )
    return est


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate clusters (connected
    components): pipelines don't drop per-pair — they keep one
    canonical doc per component (MinHashLSH emits pairs; the keep/drop
    decision needs the transitive closure, e.g. A~B, B~C must retire
    both B and C, not just one of each pair).

    Algorithm: Hash-Min label propagation (the standard BSP/GraphX
    connected-components loop): every node starts labeled with its own
    id; each round every node takes the min of its own and its
    neighbors' labels; at fixpoint label == min id of the component,
    reached in at most diameter rounds (dup clusters are small and
    dense, so a handful). Each round is one equi-join + one partial-agg
    groupBy — the shape that scales; `localCheckpoint` truncates the
    growing lineage each round (the documented Spark idiom for
    iterative algorithms). Convergence is detected by the label-sum
    fixpoint (labels are monotone non-increasing, so an unchanged sum
    means no label moved; summed as decimal(38,0) so 10^12-scale ids
    cannot overflow the check).

    Returns (doc_id, cluster_id = min doc id in its component) for
    every doc that appears in at least one pair; docs with no pair are
    their own singleton cluster and are simply absent.

    No SQL oracle can express the unbounded iteration directly; the
    driver-gate oracle uses DuckDB's recursive CTE transitive closure
    (exact at test scale) — see __spark_entry__ dup_clusters.
    """
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    edges = fwd.union(rev).distinct().cache()
    try:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint()
        )
        prev = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        for _ in range(max_iters):
            neigh = (
                edges.join(labels, edges["src"] == labels["node"])
                .groupBy(F.col("dst").alias("nnode"))
                .agg(F.min("label").alias("nlabel"))
            )
            labels = (
                labels.join(neigh, labels["node"] == neigh["nnode"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nlabel"), F.col("label")),
                    ).alias("label"),
                )
                .localCheckpoint()
            )
            cur = labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))
            ).collect()[0][0]
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError(
                f"dup_clusters did not converge in {max_iters} rounds — "
                f"component diameter exceeds max_iters; raise max_iters"
            )
    finally:
        # unpersist on every exit path — the non-convergence raise (and
        # any mid-loop failure) must not leak the cached edges for the
        # session lifetime
        edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def simhash64(df: DataFrame, text: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens (md5-derived bit vectors,
    tf-weighted), via an Arrow-batched pandas UDF. Hamming-close pairs =
    near-dups. (No SQL oracle — bit twiddling; driver does a rows-only
    check.)"""
    import hashlib

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        # vectorized per Arrow batch: the batch's token VOCABULARY is
        # md5-hashed once (each distinct token, once per batch — not
        # once per doc), then tf-weighted accumulation is one
        # np.add.at over (token -> ±1 bit matrix) rows
        tok_lists = [t.split(" ") if t else [] for t in texts]
        n_docs = len(tok_lists)
        doc_lens = np.array([len(x) for x in tok_lists], dtype=np.int64)
        if doc_lens.sum() == 0:
            return pd.Series(np.zeros(n_docs, dtype=np.int64))
        flat = np.concatenate(
            [np.asarray(x, dtype=object) for x in tok_lists if x]
        )
        vocab, inv = np.unique(flat, return_inverse=True)
        pm1 = np.empty((len(vocab), 64), dtype=np.int32)
        for vi, tok in enumerate(vocab):
            digest = hashlib.md5(tok.encode()).digest()[:8]
            bits = np.unpackbits(np.frombuffer(digest, np.uint8))
            pm1[vi] = np.where(bits == 1, 1, -1)
        doc_idx = np.repeat(np.arange(n_docs), doc_lens)
        acc = np.zeros((n_docs, 64), dtype=np.int64)
        np.add.at(acc, doc_idx, pm1[inv])
        sig_bits = (acc > 0).astype(np.uint64)
        sigs = (sig_bits << np.arange(64, dtype=np.uint64)).sum(axis=1)
        out = sigs.astype(np.int64)  # two's-complement wrap == old path
        out[doc_lens == 0] = 0
        return pd.Series(out, dtype="int64")

    return ensure_parallelism(df.select("doc_id", text)).select(
        "doc_id", simhash_udf(F.col(text)).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    text: str = "text",
    max_hamming: int = 3,
    min_band_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.
    Candidate generation: split the 64-bit signature into max_hamming+1
    bands (pigeonhole: any pair within distance shares one exact band);
    equi-join on (band_idx, band_value) — never a cross join.

    The pigeonhole guarantee forces band width = 64 // (max_hamming+1),
    so large distances make bands narrow and the equi-join degenerates
    toward all-pairs (e.g. max_hamming=16 -> 3-bit bands -> 8 buckets).
    min_band_bits floors this: the default 8 admits max_hamming <= 7
    (256+ buckets per band); anything looser raises instead of silently
    planning a quadratic join. Distances past that are not meaningful
    near-dup thresholds for 64-bit SimHash anyway."""
    sig = simhash64(df, text)
    nbands = max_hamming + 1
    width = 64 // nbands
    if width < min_band_bits:
        raise ValueError(
            f"max_hamming={max_hamming} forces {width}-bit bands "
            f"(2^{width} join buckets) — candidate generation degenerates "
            f"toward all-pairs. Use max_hamming <= "
            f"{64 // min_band_bits - 1}, or pass a smaller min_band_bits "
            f"to accept the cost explicitly."
        )
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col("simhash"), i * width
                        ).bitwiseAND(F.lit((1 << width) - 1)).alias("val"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.val")
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    # hamming filter BEFORE the dedup-distinct: the filter is a cheap
    # row expression evaluated streaming out of the band join, while
    # distinct is an exchange — filtering first means the shuffle
    # carries only true near-dup pairs (duplicated at most nbands x),
    # not every band collision. Same result set: duplicates of a pair
    # are identical rows, so filter-then-distinct == distinct-then-filter.
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val")),
        )
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .where(hamming <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )
