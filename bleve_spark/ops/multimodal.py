"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side contract — schema, partition-preserving mapInPandas batch
shape, Arrow transfer — is real and tested; the actual media decode is
STUBBED (codec libraries are not in this container): decode_mode="real"
raises NotImplementedError, decode_mode="fake" produces deterministic
features from the bytes so the pipeline is testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic 16-dim feature from the payload digest — the stand-in
    for a real decode->embed step."""
    d = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(d[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / 65535.0
    )


class MediaDecoder:
    """Pluggable decode->embed adapter. Implementations map one payload
    to a FEATURE_DIM float32 vector; the Spark plumbing (Arrow batches,
    schema, partition preservation) is shared and already tested.

    Register codec-backed decoders per kind, e.g.::

        class PILImageDecoder(MediaDecoder):
            def features(self, kind, mime, payload):
                img = PIL.Image.open(io.BytesIO(payload))  # real decode
                return embed(img)

        extract_features(media, decoder=PILImageDecoder())

    The instance is pickled to executors once per task (keep it
    stateless or lazily-initialized)."""

    def features(self, kind: str, mime: str, payload: bytes) -> np.ndarray:
        raise NotImplementedError


class FakeDecoder(MediaDecoder):
    """Deterministic stand-in (sha256-derived features) — the decoder
    used when codec libraries are unavailable; the feature contract is
    DuckDB-oracled by the driver gate."""

    def features(self, kind: str, mime: str, payload: bytes) -> np.ndarray:
        return _fake_feature(payload)


class UnavailableDecoder(MediaDecoder):
    """Raises with guidance — codec libraries are not present in this
    environment. Swap in a MediaDecoder implementation to go real."""

    def features(self, kind: str, mime: str, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "real media decode requires image/audio codec libraries not "
            "present in this environment; implement MediaDecoder."
            "features() and pass extract_features(decoder=...)"
        )


def extract_features(
    media: DataFrame,
    decode_mode: str = "fake",
    batch_hint: int = 256,
    decoder: MediaDecoder = None,
) -> DataFrame:
    """media table -> per-item features via mapInPandas (Arrow batches,
    partition-preserving: no shuffle; co-locate by partitioning the media
    table on media_id ranges upstream). `decoder` plugs in a real
    decode->embed implementation; decode_mode picks a default
    ("fake" = FakeDecoder, "real" = UnavailableDecoder placeholder)."""
    if decoder is None:
        if decode_mode not in ("fake", "real"):
            raise ValueError("decode_mode must be 'fake' or 'real'")
        decoder = (
            FakeDecoder() if decode_mode == "fake" else UnavailableDecoder()
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder.features(k, m, p if p is not None else b"")
                for k, m, p in zip(
                    pdf["kind"], pdf["mime"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def synthesize_media_rows(n: int = 64, seed: int = 42) -> list:
    """Deterministic fake media rows (pure Python — reusable by the
    DuckDB oracle without a SparkSession). Payload bytes are printable
    ASCII so an independent SQL engine can recompute sha256/length over
    the same content as VARCHAR (DuckDB 1.0 hashes VARCHAR only)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(
            0x20, 0x7F, size=64 + (i % 5) * 32, dtype=np.uint8
        )
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                64 if kind != "audio" else None,
                None if kind == "image" else 1000 + i,
                payload.tobytes(),
            )
        )
    return rows


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    # Row tuples, not pd.DataFrame: pandas promotes None-bearing int columns
    # (width/height/duration_ms) to float64, which IntegerType rejects.
    return spark.createDataFrame(
        synthesize_media_rows(n, seed), MEDIA_SCHEMA
    )
