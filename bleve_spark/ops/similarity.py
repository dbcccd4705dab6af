"""Similarity search over embedding columns (array<float/double>).

Baseline: brute-force cosine top-k — JVM-side F.aggregate/F.zip_with dot
products, broadcast query vector, TakeOrderedAndProject top-k. Scale path:
LSH (random-hyperplane) bucketing — candidates only from the probe's
bucket(s), deterministic seeded hyperplanes so results are reproducible
across cluster sizes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .util import r4


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_to_query(
    df: DataFrame, query_vec: Sequence[float], vec_col: str = "embedding"
) -> DataFrame:
    """Adds `cos` = cosine(vec, query) as a JVM-side column expression."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col)
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return df.withColumn("cos", cos)


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Exact cosine top-k: distributed scan + TakeOrderedAndProject."""
    scored = cosine_to_query(df, query_vec, vec_col)
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return (
        scored.select(id_col, r4(F.col("cos")).alias("cos_r"))
        .orderBy(F.desc("cos_r"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature per vector (deterministic seed);
    bucket = sign-bit integer. Arrow-batched matrix multiply per batch."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        bits = (m @ planes.T) > 0
        vals = (bits.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    return df.withColumn("bucket", bucket_udf(F.col(vec_col)))


def lsh_candidates(
    df: DataFrame,
    query_vec: Sequence[float],
    n_planes: int = 12,
    seed: int = 7,
    vec_col: str = "embedding",
    probe_hamming: int = 2,
) -> DataFrame:
    """Multi-probe LSH candidate filter: rows whose bucket is within
    `probe_hamming` bits of the query's bucket. probe_hamming ==
    n_planes degenerates to a full scan (exact recall)."""
    dim = len(query_vec)
    bucketed = lsh_bucket(df, dim, n_planes, seed, vec_col)
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = (planes @ np.asarray(query_vec, dtype=float)) > 0
    qbucket = int((qbits.astype(np.int64) << np.arange(n_planes)).sum())
    return bucketed.where(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qbucket)))
        <= probe_hamming
    ).drop("bucket")


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    `probe_hamming` bits of the query bucket (multi-probe). At 10^9
    vectors this scans ~(sum_{i<=h} C(p,i))/2^p of the data."""
    cand = lsh_candidates(
        df, query_vec, n_planes, seed, vec_col, probe_hamming
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def lsh_band_keys(
    df: DataFrame,
    dim: int,
    n_bands: int = 8,
    bits_per_band: int = 4,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded random-hyperplane signature: one (band, band_val) row per
    band per vector.  A pair with angular similarity p per bit collides in
    >=1 band w.p. 1-(1-p^bits)^bands — the OR-of-bands construction that
    gives high recall at a cosine threshold without an all-pairs join."""
    planes = _hyperplanes(dim, n_bands * bits_per_band, seed)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def bands_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        bits = ((m @ planes.T) > 0).astype(np.int64)
        # pack each band's bits into one int
        out = []
        weights = 1 << np.arange(bits_per_band)
        for row in bits:
            out.append(
                [
                    int((row[b * bits_per_band:(b + 1) * bits_per_band] * weights).sum())
                    for b in range(n_bands)
                ]
            )
        return pd.Series(out)

    return df.withColumn("bands", bands_udf(F.col(vec_col))).select(
        "*", F.posexplode("bands").alias("band", "band_val")
    ).drop("bands")


def all_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 24,
    bits_per_band: int = 2,
    seed: int = 7,
    dim: Optional[int] = None,
) -> DataFrame:
    """Embedding near-dup pairs: banded-LSH equi-join candidates (same
    (band, band_val) in any band), exact cosine filter >= threshold.
    The equi-join keeps this shuffle-bound instead of O(n^2); the exact
    filter means precision is 1.0 — LSH only generates candidates.

    Recall: a pair at cosine c collides per bit w.p. 1-arccos(c)/pi, so
    per band p^bits and overall 1-(1-p^bits)^bands.  Defaults (24 bands x
    2 bits) give miss < 1e-6 at c=0.5.  At a production near-dup
    threshold (c>=0.9, p=0.86) use wider bands (e.g. 12 bits) so each
    band has 4096 buckets and candidate volume stays ~n^2/2^bits per
    band; bits_per_band should grow with log2(n) at fixed candidate
    budget.  tests/test_ops.py asserts full recall vs brute force at
    test scale."""
    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    b = lsh_band_keys(df, dim, n_bands, bits_per_band, seed, vec_col)
    a = b.alias("a")
    c = b.alias("b")
    pairs = (
        a.join(c, ["band", "band_val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        pairs.withColumn("cos", r4(cos))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
