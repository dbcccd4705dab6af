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


def dot_to_query(
    df: DataFrame, query_vec: Sequence[float], vec_col: str = "embedding"
) -> DataFrame:
    """Adds `dot` = raw inner product — the reference's "dot_product"
    metric (ref: util/knn.go:22-28: equals cosine only for unit-norm
    vectors; no normalization is applied, matching FAISS IndexFlatIP)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return df.withColumn("dot", _dot(F.col(vec_col), q))


def l2sq_to_query(
    df: DataFrame, query_vec: Sequence[float], vec_col: str = "embedding"
) -> DataFrame:
    """Adds `l2sq` = squared euclidean distance to the query — the
    reference's default "l2_norm" metric (ref: util/knn.go:21,31; FAISS
    L2 indexes report squared distances, which the KNN scorer then
    inverts: search/scorer/scorer_knn.go:71-75)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sq = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("l2sq", sq)


def brute_force_topk_l2(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Exact euclidean top-k (nearest = smallest squared distance):
    distributed scan + TakeOrderedAndProject, like brute_force_topk."""
    scored = l2sq_to_query(df, query_vec, vec_col)
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return (
        scored.select(id_col, r4(F.col("l2sq")).alias("l2sq_r"))
        .orderBy(F.asc("l2sq_r"), F.asc(id_col))
        .limit(k)
    )


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


def _check_n_planes(n_planes: int) -> None:
    """Bucket ids are packed sign bits in an IntegerType (int32) column;
    n_planes >= 32 would silently wrap the int32 cast and produce buckets
    that can never equal the query side's values (zero candidates)."""
    if not (1 <= n_planes <= 31):
        raise ValueError(
            f"n_planes must be in [1, 31] (bucket ids are int32 sign-bit "
            f"packs; {n_planes} planes would overflow silently)"
        )


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature per vector (deterministic seed);
    bucket = sign-bit integer. Arrow-batched matrix multiply per batch."""
    _check_n_planes(n_planes)
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


# shared defaults: ingest-time bucket columns (build.py vector fields)
# and query-time probes must agree on these to interoperate
LSH_N_TABLES = 4
LSH_N_PLANES = 16
LSH_SEED = 7


def lsh_bucket_tables(
    df: DataFrame,
    dim: int,
    n_tables: int = LSH_N_TABLES,
    n_planes: int = LSH_N_PLANES,
    seed: int = LSH_SEED,
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH: n_tables independent hyperplane sets, one
    bucket id per table (array column). One Arrow-batched matrix
    multiply computes all tables at once.

    The output `buckets` column carries the LSH parameters
    (n_tables/n_planes/seed) as StructField metadata — persisted through
    parquet — so a later `lsh_candidates_tables` reuse can verify it was
    built with the SAME parameters instead of silently producing zero or
    wrong candidates on a mismatched column."""
    _check_n_planes(n_planes)
    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    planes = np.concatenate(
        [
            _hyperplanes(dim, n_planes, seed + 1000 * t)
            for t in range(n_tables)
        ]
    )  # (n_tables*n_planes, dim)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        # null / ragged rows map to the zero vector (bucket 0 in every
        # table) instead of crashing np.stack with an opaque error
        m = np.zeros((len(vecs), dim), dtype=np.float64)
        for i, v in enumerate(vecs):
            if v is not None and len(v) == dim:
                m[i] = v
        bits = ((m @ planes.T) > 0).reshape(len(m), n_tables, n_planes)
        vals = (bits.astype(np.int64) << np.arange(n_planes)).sum(axis=2)
        return pd.Series(vals.astype(np.int32).tolist())

    meta = {
        "lsh_n_tables": int(n_tables),
        "lsh_n_planes": int(n_planes),
        "lsh_seed": int(seed),
    }
    return df.withColumn(
        "buckets", buckets_udf(F.col(vec_col)).alias("buckets", metadata=meta)
    )


def _query_buckets(
    query_vec, n_tables: int, n_planes: int, seed: int
) -> List[int]:
    q = np.asarray(query_vec, dtype=float)
    out = []
    for t in range(n_tables):
        planes = _hyperplanes(len(q), n_planes, seed + 1000 * t)
        bits = (planes @ q) > 0
        out.append(
            int((bits.astype(np.int64) << np.arange(n_planes)).sum())
        )
    return out


def lsh_candidates_tables(
    df: DataFrame,
    query_vec: Sequence[float],
    n_tables: int = LSH_N_TABLES,
    n_planes: int = LSH_N_PLANES,
    seed: int = LSH_SEED,
    vec_col: str = "embedding",
    probe_hamming: int = 2,
) -> DataFrame:
    """Union-of-tables multi-probe candidate filter: a row is a
    candidate if ANY table's bucket is within probe_hamming bits of the
    query's bucket in that table. Multi-table OR-construction lifts
    recall exponentially in n_tables (1-(1-p_table)^T) while the
    per-table scan fraction stays sum_{i<=h} C(p,i)/2^p — with the
    16-plane/4-table/probe-2 defaults ~0.8% of the corpus is scored."""
    dim = len(query_vec)
    pre = None
    if "buckets" in df.columns:
        # Reuse ONLY a column provably built by lsh_bucket_tables with
        # the SAME parameters: array<int> type AND the persisted
        # parameter metadata matching this call. A shorter array would
        # make element_at return NULL (silently dropping rows); a
        # different seed/planes would silently destroy recall. Metadata
        # mismatch raises (the caller asked for an impossible reuse);
        # absent metadata means "not ours" — recompute.
        field = df.schema["buckets"]
        dt = field.dataType
        if isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, T.IntegerType
        ):
            meta = field.metadata or {}
            if "lsh_n_tables" in meta:
                if (
                    meta.get("lsh_n_tables") != n_tables
                    or meta.get("lsh_n_planes") != n_planes
                    or meta.get("lsh_seed") != seed
                ):
                    raise ValueError(
                        "precomputed `buckets` column was built with LSH "
                        f"params (n_tables={meta.get('lsh_n_tables')}, "
                        f"n_planes={meta.get('lsh_n_planes')}, "
                        f"seed={meta.get('lsh_seed')}) but the query asks "
                        f"for (n_tables={n_tables}, n_planes={n_planes}, "
                        f"seed={seed}); rebuild the buckets or match the "
                        "query parameters"
                    )
                pre = df
    if pre is not None:
        # precomputed at index/ingest time (with lsh_bucket_tables,
        # same parameters) — the scale path: per-query work is then a
        # JVM bitcount filter + cosine over the ~1% survivors, with no
        # per-query pass over the vectors
        bucketed = pre
    else:
        bucketed = lsh_bucket_tables(
            df, dim, n_tables, n_planes, seed, vec_col
        )
    qb = _query_buckets(query_vec, n_tables, n_planes, seed)
    pred = None
    for t in range(n_tables):
        c = (
            F.bit_count(
                F.element_at(F.col("buckets"), t + 1).bitwiseXOR(
                    F.lit(qb[t])
                )
            )
            <= probe_hamming
        )
        pred = c if pred is None else (pred | c)
    return bucketed.where(pred).drop("buckets")


def lsh_topk_tables(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_tables: int = LSH_N_TABLES,
    n_planes: int = LSH_N_PLANES,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k over the union of n_tables LSH probes —
    the high-recall scale path (see BASELINE.md for the measured
    recall@10 at 10^6 vectors)."""
    cand = lsh_candidates_tables(
        df, query_vec, n_tables, n_planes, seed, vec_col, probe_hamming
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
    if not (1 <= bits_per_band <= 31):
        raise ValueError(
            "bits_per_band must be in [1, 31] (band values are int32)"
        )
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


class LSHBandPlanError(ValueError):
    """Raised when no band structure meets the recall target within the
    band budget — the analogue of simhash_pairs' min_band_bits raise
    (ops/dedup.py): better to fail loudly than to degenerate into an
    all-pairs join at corpus scale."""


def plan_lsh_bands(
    n_rows: int,
    threshold: float,
    target_miss: float = 1e-6,
    max_candidates_per_row: int = 64,
    max_bands: int = 128,
) -> tuple:
    """Size (n_bands, bits_per_band) for all_pairs_above from the corpus
    size and cosine threshold.

    bits_per_band = ceil(log2(n / max_candidates_per_row)) bounds the
    expected per-band candidate volume at n * max_candidates_per_row
    under a uniform bucket model (each band has 2^bits buckets, so a row
    meets ~n/2^bits candidates per band) — this is what keeps the
    equi-join from degenerating toward all-pairs as n grows.  n_bands is
    then the smallest count whose OR-construction miss probability
    (1 - p^bits)^bands <= target_miss for a pair exactly at the
    threshold, where p = 1 - arccos(threshold)/pi (random-hyperplane
    collision probability).  If that needs more than max_bands bands,
    raise: hyperplane LSH cannot hit the recall target at this
    threshold/scale, and the caller must raise the threshold, the
    candidate budget, or accept more miss — silently proceeding would
    either miss pairs or blow up the join.
    """
    import math

    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    if n_rows > max_candidates_per_row:
        bits = max(2, math.ceil(math.log2(n_rows / max_candidates_per_row)))
    else:
        bits = 2
    p = 1.0 - math.acos(min(threshold, 0.9999)) / math.pi
    p_band = p ** bits
    if p_band <= 0.0:
        raise LSHBandPlanError("threshold too low for banded LSH")
    bands = max(1, math.ceil(math.log(target_miss) / math.log1p(-p_band)))
    if bands > max_bands:
        raise LSHBandPlanError(
            f"banded LSH cannot reach miss<={target_miss:g} at "
            f"threshold={threshold} with n={n_rows}: needs {bands} bands "
            f"of {bits} bits (> max_bands={max_bands}). Raise the "
            f"threshold, raise max_candidates_per_row, or relax "
            f"target_miss."
        )
    return bands, bits


def all_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: Optional[int] = None,
    bits_per_band: Optional[int] = None,
    seed: int = 7,
    dim: Optional[int] = None,
    n_rows: Optional[int] = None,
    target_miss: float = 1e-6,
    max_candidates_per_row: int = 64,
    max_bands: int = 128,
) -> DataFrame:
    """Embedding near-dup pairs: banded-LSH equi-join candidates (same
    (band, band_val) in any band), exact cosine filter >= threshold.
    The equi-join keeps this shuffle-bound instead of O(n^2); the exact
    filter means precision is 1.0 — LSH only generates candidates.

    Recall: a pair at cosine c collides per bit w.p. 1-arccos(c)/pi, so
    per band p^bits and overall 1-(1-p^bits)^bands.  By default the band
    structure is sized by plan_lsh_bands() from the corpus row count
    (one count() planning job; pass n_rows to skip) so that per-band
    candidate volume stays <= n * max_candidates_per_row while pair miss
    probability at the threshold stays <= target_miss — and it RAISES
    (LSHBandPlanError) when no such structure exists, instead of
    silently degenerating to an all-pairs join at corpus scale.
    Explicit n_bands/bits_per_band override the planner (caller-informed
    choice).  tests/test_ops.py asserts full recall vs brute force at
    test scale and bounded candidate volume at 10^6-row scale."""
    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    if (n_bands is None) != (bits_per_band is None):
        # a half-specified override would be silently overwritten by
        # the planner — refuse instead of dropping the caller's choice
        raise ValueError(
            "pass BOTH n_bands and bits_per_band to override the "
            "planner, or neither"
        )
    if n_bands is None:
        if n_rows is None:
            n_rows = df.count()
        n_bands, bits_per_band = plan_lsh_bands(
            n_rows, threshold, target_miss, max_candidates_per_row,
            max_bands,
        )
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
