"""Round-5 ADVICE fixes (ADVICE.md r4, all four low items).

1. ivf_fit seed folded into the hash INPUT (not an additive constant,
   which preserves orderBy order and made the seed a no-op).
2. KNN dot_product no longer takes the angular-LSH prefilter unless the
   FieldMapping opts in with unit_norm=True (hyperplane LSH only
   preserves ANGULAR neighbors; the true MIPS neighbor of non-unit
   vectors can sit in a never-probed bucket).
3. dup_clusters unpersists its cached edges on the non-convergence
   raise path (try/finally), not only on success.
4. ivf_fit deduplicates the init pool so duplicate vectors cannot seed
   identical (forever-frozen) centroids; raises when the sample lacks
   n_cells distinct vectors, matching the docstring.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bleve_spark import FieldMapping, IndexMapping
from bleve_spark.ops import dedup, ivf


# -- 1. seed actually changes the sampled pool / init -----------------------


def _vec_df(spark, n=64, dim=4):
    rows = [
        (i, [float(i % 7 + 1), float(i % 5), float(i % 3), float(i)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_ivf_fit_seed_changes_init(spark):
    df = _vec_df(spark)
    # iters=0 returns the raw init centroids — the part the seed orders
    c1 = ivf.ivf_fit(df, n_cells=4, iters=0, seed=1, sample=64)
    c2 = ivf.ivf_fit(df, n_cells=4, iters=0, seed=2, sample=64)
    assert c1.shape == c2.shape == (4, 4)
    assert not np.allclose(c1, c2), "seed must reorder the init pool"
    # and the same seed is reproducible
    c1b = ivf.ivf_fit(df, n_cells=4, iters=0, seed=1, sample=64)
    assert np.allclose(c1, c1b)


# -- 4. init pool deduplication ----------------------------------------------


def test_ivf_fit_init_is_distinct_under_duplicates(spark):
    # 3 distinct vectors, each repeated 20x: n_cells=3 must seed 3
    # DISTINCT centroids, not whichever duplicates hash first
    rows = [(i, [float(i % 3), 1.0]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf.ivf_fit(df, n_cells=3, iters=0, seed=7, sample=60)
    as_tuples = {tuple(c) for c in cents}
    assert len(as_tuples) == 3


def test_ivf_fit_raises_without_enough_distinct_vectors(spark):
    rows = [(i, [float(i % 3), 1.0]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="distinct"):
        ivf.ivf_fit(df, n_cells=4, iters=0, seed=7, sample=60)


# -- 3. dup_clusters cleans up on the raise path -----------------------------


def test_dup_clusters_nonconvergence_unpersists_edges(spark):
    # a 6-node chain needs more than one hash-min round; max_iters=1
    # forces the RuntimeError path
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(pairs, max_iters=1)
    after = jsc.getPersistentRDDs().size()
    # the cache()d edges RDD must not outlive the failed call
    # (localCheckpoint RDDs from the aborted rounds are reclaimed by GC,
    # but an un-unpersisted cache() entry would sit here forever)
    assert after <= before + 2  # allow localCheckpoint residue, not growth
    # and the success path still works
    got = dedup.dup_clusters(pairs, max_iters=10).collect()
    assert {(r["doc_id"], r["cluster_id"]) for r in got} == {
        (i, 1) for i in range(1, 7)
    }


# -- 2. dot_product routing: exact scan unless unit_norm opt-in --------------


def _mips_corpus(spark):
    # 40 unit vectors hugging the query direction [1, 0] plus ONE
    # large-norm vector ~80 degrees away: the true MIPS winner
    # (dot = 300*cos(80deg) ~ 52) sits far from the query's angular
    # bucket — exactly the case hyperplane LSH mis-serves.
    rows = []
    for i in range(40):
        a = (i - 20) / 200.0  # tiny angles around 0
        rows.append((f"u{i:02d}", [math.cos(a), math.sin(a)]))
    big = 300.0
    rows.append(("mips", [big * math.cos(1.396), big * math.sin(1.396)]))
    return spark.createDataFrame(rows, "id string, embedding array<double>")


def _search_topk(spark, path, mapping, vec, k, min_docs):
    from bleve_spark import SearchIndex, Searcher
    from bleve_spark import query as Qm
    from bleve_spark.search import KNNRequest, SearchRequest

    s = Searcher(
        SearchIndex(spark, path, mapping), knn_lsh_min_docs=min_docs
    )
    res = s.search(
        SearchRequest(
            query=Qm.MatchNoneQuery(),
            knn=[KNNRequest(field="embedding", vector=vec, k=k)],
            size=k,
        )
    )
    return [r["_id"] for r in res.hits.collect()]


@pytest.fixture(scope="module")
def mips_index(spark, tmp_path_factory):
    from bleve_spark import IndexBuilder

    path = str(tmp_path_factory.mktemp("mips") / "idx")
    m = IndexMapping(dynamic=False).add(
        FieldMapping(
            name="embedding", type="vector", similarity="dot_product"
        )
    )
    IndexBuilder(spark, m, path).build(
        _mips_corpus(spark), id_expr=F.col("id")
    )
    return path


def test_knn_dot_product_exact_above_lsh_floor(spark, mips_index):
    # min_docs=1 puts the corpus above the LSH engagement floor; with
    # the fix, non-unit dot_product still takes the exact scan and the
    # angularly-distant MIPS winner is found
    m = IndexMapping(dynamic=False).add(
        FieldMapping(
            name="embedding", type="vector", similarity="dot_product"
        )
    )
    ids = _search_topk(spark, mips_index, m, [1.0, 0.0], k=1, min_docs=1)
    assert ids == ["mips"]


def test_knn_dot_product_unit_norm_optin_takes_lsh(spark, tmp_path):
    # unit-norm vectors with the opt-in flag: the LSH route is sound
    # (dot == cosine) and the same-direction vector is found top-1
    from bleve_spark import IndexBuilder

    rows = [("q", [1.0, 0.0, 0.0]), ("y", [0.0, 1.0, 0.0]),
            ("z", [0.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "id string, embedding array<double>")
    m = IndexMapping(dynamic=False).add(
        FieldMapping(
            name="embedding",
            type="vector",
            similarity="dot_product",
            unit_norm=True,
        )
    )
    path = str(tmp_path / "idx")
    IndexBuilder(spark, m, path).build(df, id_expr=F.col("id"))
    ids = _search_topk(spark, path, m, [1.0, 0.0, 0.0], k=1, min_docs=1)
    assert ids == ["q"]


def test_unit_norm_mapping_roundtrip():
    m = IndexMapping(dynamic=False).add(
        FieldMapping(
            name="embedding",
            type="vector",
            similarity="dot_product",
            unit_norm=True,
        )
    )
    m2 = IndexMapping.from_dict(m.to_dict())
    assert m2.fields["embedding"].unit_norm is True
    # old mapping files without the key default to False
    d = m.to_dict()
    del d["fields"]["embedding"]["unit_norm"]
    m3 = IndexMapping.from_dict(d)
    assert m3.fields["embedding"].unit_norm is False
