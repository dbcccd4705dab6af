"""Regression tests for the round-4 advice fixes:

1. multimodal_features gate shape — every output column is scalar (the
   driver's canonicalizer sorts the raw pandas frame; a list-valued
   column is unhashable and crashed the round-3 gate), and the exploded
   integer dims reproduce the float32 feature exactly.
2. LSH bucket-column provenance — lsh_bucket_tables stamps its params
   as column metadata; lsh_candidates_tables refuses a mismatched
   precomputed column (raise), ignores an unstamped look-alike
   (recompute), and reuses a matching one.
3. n_planes / bits_per_band int32 guards — >=32 planes would wrap the
   int32 bucket id silently.
4. _MAPPING.json is overwritten on rebuild, so an in-place rebuild with
   a changed mapping can't leave a stale persisted mapping.
"""

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from bleve_spark import IndexBuilder
from bleve_spark.mapping import FieldMapping, IndexMapping
from bleve_spark.ops import multimodal, similarity as sim


# -- 1. multimodal gate shape ----------------------------------------------


def test_multimodal_entry_columns_are_scalar(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["multimodal_features"](spark, "unused")
    for field in df.schema.fields:
        assert field.dataType.typeName() in (
            "long", "integer", "string"
        ), f"non-scalar gate column {field.name}: {field.dataType}"
    pdf = df.toPandas()
    # the driver's _canon sorts the raw frame — must not raise
    pdf.sort_values(list(pdf.columns), kind="stable")
    # integer dims round-trip the float32 feature exactly
    rows = multimodal.synthesize_media_rows(n=64)
    import hashlib

    by_id = {r[0]: r[6] for r in rows}
    sample = pdf.set_index("media_id").loc[0]
    d = hashlib.sha256(by_id[0]).digest()
    expect = np.frombuffer(d[:32], dtype=np.uint16)
    got = [int(sample[f"f{i:02d}"]) for i in range(16)]
    assert got == expect.tolist()


# -- 2. LSH bucket provenance ----------------------------------------------


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(64)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_bucket_metadata_roundtrip(spark, vec_df, tmp_path):
    b = sim.lsh_bucket_tables(vec_df, 8, n_tables=2, n_planes=10, seed=5)
    meta = b.schema["buckets"].metadata
    assert meta == {"lsh_n_tables": 2, "lsh_n_planes": 10, "lsh_seed": 5}
    p = str(tmp_path / "buckets.parquet")
    b.write.parquet(p)
    r = spark.read.parquet(p)
    assert r.schema["buckets"].metadata == meta
    # rename (the <field>__buckets persistence path) keeps metadata
    r2 = r.withColumnRenamed("buckets", "embedding__buckets")
    assert r2.schema["embedding__buckets"].metadata == meta


def test_candidates_reject_mismatched_buckets(spark, vec_df):
    q = [0.5] * 8
    b = sim.lsh_bucket_tables(vec_df, 8, n_tables=2, n_planes=10, seed=5)
    with pytest.raises(ValueError, match="params"):
        sim.lsh_candidates_tables(
            b, q, n_tables=2, n_planes=10, seed=6
        )
    with pytest.raises(ValueError, match="params"):
        sim.lsh_candidates_tables(b, q, n_tables=4, n_planes=10, seed=5)


def test_candidates_ignore_unstamped_lookalike(spark, vec_df):
    # a user column named "buckets" with the right type but no
    # provenance metadata must NOT drive candidate selection: results
    # must equal the recomputed-bucket run on the clean frame
    q = [0.5] * 8
    fake = vec_df.withColumn(
        "buckets", F.array(F.lit(0), F.lit(0), F.lit(0), F.lit(0))
    )
    got = sorted(
        r["vec_id"]
        for r in sim.lsh_candidates_tables(fake, q).select("vec_id").collect()
    )
    want = sorted(
        r["vec_id"]
        for r in sim.lsh_candidates_tables(vec_df, q).select("vec_id").collect()
    )
    assert got == want


def test_candidates_reuse_matching_buckets(spark, vec_df):
    q = [0.5] * 8
    b = sim.lsh_bucket_tables(vec_df, 8)  # shared defaults
    reused = sorted(
        r["vec_id"]
        for r in sim.lsh_candidates_tables(b, q).select("vec_id").collect()
    )
    fresh = sorted(
        r["vec_id"]
        for r in sim.lsh_candidates_tables(vec_df, q).select("vec_id").collect()
    )
    assert reused == fresh


# -- 3. int32 guards --------------------------------------------------------


def test_n_planes_int32_guard(spark, vec_df):
    with pytest.raises(ValueError, match="31"):
        sim.lsh_bucket_tables(vec_df, 8, n_planes=32)
    with pytest.raises(ValueError, match="31"):
        sim.lsh_bucket(vec_df, 8, n_planes=40)
    with pytest.raises(ValueError, match="31"):
        sim.lsh_band_keys(vec_df, 8, n_bands=2, bits_per_band=32)


# -- 4. _MAPPING.json overwrite on rebuild ----------------------------------


def test_mapping_json_overwritten_on_rebuild(spark, tmp_path):
    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    m1 = IndexMapping().add(
        FieldMapping(name="text", type="text", analyzer="standard")
    )
    IndexBuilder(spark, m1, path).build(
        docs, id_expr=F.col("doc_id").cast("string"), fingerprint="v1"
    )
    with open(os.path.join(path, "_MAPPING.json")) as f:
        first = json.load(f)
    m2 = IndexMapping().add(
        FieldMapping(name="text", type="text", analyzer="keyword")
    )
    IndexBuilder(spark, m2, path).build(
        docs, id_expr=F.col("doc_id").cast("string"), fingerprint="v2"
    )
    with open(os.path.join(path, "_MAPPING.json")) as f:
        second = json.load(f)
    assert first != second
    assert second == m2.to_dict()
