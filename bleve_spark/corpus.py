"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Schema per the north-rule input hint:
  (repo:string, path:string, commit:string, lang:string, content:string)

Zipf-distributed identifier vocabulary (hot-term skew), license-header
boilerplate on ~30% of files (extreme hot terms), and a per-file unique
letters-only token for exact-hit tests. Deterministic per doc index
(seed + i), so generation is chunk-parallel and order-independent;
content sha256 is recorded at synthesis for the per-row ingest invariant.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

_LANGS = ["go", "py", "java", "js", "rs", "md"]
_EXT = {"go": "go", "py": "py", "java": "java", "js": "js", "rs": "rs", "md": "md"}

_VOCAB_ROOTS = [
    "get", "set", "parse", "build", "merge", "index", "search", "token",
    "query", "score", "batch", "stream", "shard", "block", "cache", "hash",
    "sort", "scan", "join", "split", "read", "write", "open", "close",
    "flush", "commit", "delete", "insert", "update", "encode", "decode",
    "pack", "unpack", "map", "reduce", "filter", "count", "sum", "norm",
    "term", "field", "doc", "seg", "post", "list", "dict", "stat", "meta",
    "conf", "util", "node", "tree", "heap", "queue", "stack", "buf", "io",
]

_LICENSE = (
    "Licensed under the Apache License Version 2 you may not use this file "
    "except in compliance with the License"
)


def _vocab(n: int) -> list:
    out = []
    i = 0
    while len(out) < n:
        a = _VOCAB_ROOTS[i % len(_VOCAB_ROOTS)]
        b = _VOCAB_ROOTS[(i * 7 + i // len(_VOCAB_ROOTS)) % len(_VOCAB_ROOTS)]
        out.append(f"{a}{b.capitalize()}")  # camelCase identifiers
        if len(out) < n:
            out.append(f"{a}_{b}")  # snake_case identifiers
        i += 1
    return out[:n]


def uniq_token(i: int) -> str:
    """Letters-only unique token for doc i (survives the camelCase filter)."""
    return "uniq" + "".join("abcdefghij"[int(c)] for c in str(i))


def generate_rows(start: int, end: int, seed: int = 42, vocab_size: int = 2000) -> pd.DataFrame:
    """Docs [start, end): each doc derived only from (seed, i) — chunk
    order and chunk boundaries don't affect content."""
    vocab = np.array(_vocab(vocab_size))
    zipf_p = 1.0 / np.arange(1, vocab_size + 1) ** 1.1
    zipf_p /= zipf_p.sum()
    n = end - start
    # one bulk RNG for sizes, per-chunk reproducible via per-doc seeding
    rows = []
    for i in range(start, end):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        lang = _LANGS[i % len(_LANGS)]
        n_tokens = int(rng.integers(40, 200))
        idents = vocab[rng.choice(vocab_size, size=n_tokens, p=zipf_p)]
        body_parts = []
        if i % 10 < 3:  # ~30% license boilerplate
            body_parts.append(_LICENSE)
        for j in range(0, n_tokens, 8):
            chunk = idents[j : j + 8]
            body_parts.append(
                f"func {chunk[0]}({', '.join(chunk[1:4])}) {{ return "
                f"{' + '.join(chunk[4:])} }}"
            )
        body_parts.append(uniq_token(i))
        content = "\n".join(body_parts)
        rows.append(
            {
                "repo": f"org{i % 7}/repo{i % 23}",
                "path": f"src/pkg{i % 11}/file_{i}.{_EXT[lang]}",
                "commit": hashlib.sha1(f"commit-{i}".encode()).hexdigest(),
                "lang": lang,
                "content": content,
                "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
            }
        )
    return pd.DataFrame(rows)


def generate_corpus(n_files: int, seed: int = 42, vocab_size: int = 2000) -> pd.DataFrame:
    return generate_rows(0, n_files, seed, vocab_size)


def _write_shard(args):
    path, start, end, seed, i = args
    generate_rows(start, end, seed).to_parquet(
        os.path.join(path, f"part-{i:05d}.parquet"), index=False
    )


def write_corpus_parquet(
    path: str, n_files: int, seed: int = 42, shards: int = 32, workers: int = 8
):
    """Write the corpus as a DIRECTORY of `shards` parquet files (enough
    input splits for Spark), generating shards in parallel processes."""
    from concurrent.futures import ProcessPoolExecutor

    os.makedirs(path, exist_ok=True)
    step = (n_files + shards - 1) // shards
    jobs = [
        (path, i * step, min((i + 1) * step, n_files), seed, i)
        for i in range(shards)
        if i * step < n_files
    ]
    with ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(_write_shard, jobs))
    return path
