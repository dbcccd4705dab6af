"""SearchIndex: read-side handle over the built index tables.

The reference's IndexSnapshot/TermFieldReader analogue
(/root/reference/index/scorch/snapshot_index.go:81): a set of co-versioned
parquet tables plus tiny driver-side caches (doc count, per-field stats,
per-term df lookups — the same two lookups bleve does per term at searcher
construction, /root/reference/search/searcher/search_term.go:57-70).
"""

from __future__ import annotations

import os
from functools import cached_property
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from . import codec
from .mapping import IndexMapping

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("docid", T.LongType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("length", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


def _decode_blocks_iter(batches, need_positions: bool):
    for pdf in batches:
        cols = {k: [] for k in ("field", "term", "docid", "tf", "length")}
        pos_out: List = []
        for row in pdf.itertuples(index=False):
            docids = codec.delta_decode(row.docids_enc).astype(np.int64)
            tfs = codec.varint_decode(row.tfs_enc).astype(np.int32)
            lens = codec.varint_decode(row.lens_enc).astype(np.int32)
            n = len(docids)
            cols["field"].append(np.repeat(row.field, n))
            cols["term"].append(np.repeat(row.term, n))
            cols["docid"].append(docids)
            cols["tf"].append(tfs)
            cols["length"].append(lens)
            if need_positions:
                pos_out.extend(codec.decode_positions(row.pos_enc, n))
        if not cols["docid"]:
            continue
        out = pd.DataFrame(
            {
                "field": np.concatenate(cols["field"]),
                "term": np.concatenate(cols["term"]),
                "docid": np.concatenate(cols["docid"]),
                "tf": np.concatenate(cols["tf"]),
                "length": np.concatenate(cols["length"]),
            }
        )
        out["positions"] = (
            pd.Series(pos_out, dtype=object) if need_positions else None
        )
        yield out


class SearchIndex:
    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        mapping: Optional[IndexMapping] = None,
    ):
        self.spark = spark
        self.index_path = index_path
        self.mapping = mapping

    def _table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_path, name))

    @cached_property
    def docs(self) -> DataFrame:
        return self._table("docs")

    @cached_property
    def postings(self) -> DataFrame:
        return self._table("postings")

    @cached_property
    def dictionary(self) -> DataFrame:
        return self._table("dictionary")

    @cached_property
    def norms(self) -> DataFrame:
        return self._table("norms")

    @cached_property
    def doc_count(self) -> int:
        """Global N (single-index semantics — the reference parity target,
        SURVEY.md §2.6 per-shard IDF caveat)."""
        return int(self._table("stats").collect()[0]["doc_count"])

    @cached_property
    def field_stats(self) -> Dict[str, dict]:
        return {
            r["field"]: {
                "doc_count": r["doc_count"],
                "total_len": r["total_len"],
                "avg_len": r["avg_len"],
            }
            for r in self._table("fieldstats").collect()
        }

    def avg_len(self, field: str) -> float:
        st = self.field_stats.get(field)
        return float(st["avg_len"]) if st else 1.0

    # -- dictionary lookups (driver-side, tiny) ---------------------------

    def term_stats(self, field: str, terms: Iterable[str]) -> Dict[str, Tuple[int, int]]:
        """term -> (df, cf). Equivalent of TermFieldReader.Count()
        (ref: search/searcher/search_term.go:57-64). Memoized per
        (field, term) — planner phases re-resolve the same terms and each
        lookup is a driver-side Spark job."""
        if not hasattr(self, "_term_stats_cache"):
            self._term_stats_cache: Dict[Tuple[str, str], Optional[Tuple[int, int]]] = {}
        terms = list(dict.fromkeys(terms))
        missing = [t for t in terms if (field, t) not in self._term_stats_cache]
        if missing:
            rows = (
                self.dictionary.where(
                    (F.col("field") == field) & F.col("term").isin(missing)
                )
                .select("term", "df", "cf")
                .collect()
            )
            found = {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}
            for t in missing:
                self._term_stats_cache[(field, t)] = found.get(t)
        return {
            t: self._term_stats_cache[(field, t)]
            for t in terms
            if self._term_stats_cache[(field, t)] is not None
        }

    def expand_terms(self, field: str, predicate) -> List[Tuple[str, int]]:
        """Dictionary enumeration for prefix/regexp/fuzzy/range queries
        (ref: index.go:230-232, snapshot_index_dict.go): returns
        [(term, df)] matching a Column predicate over `term`."""
        rows = (
            self.dictionary.where((F.col("field") == field) & predicate)
            .select("term", "df")
            .orderBy("term")
            .collect()
        )
        return [(r["term"], int(r["df"])) for r in rows]

    # -- postings ---------------------------------------------------------

    def blocks(self, field: str, terms: Iterable[str]) -> DataFrame:
        """Compressed posting blocks for (field, term in terms); parquet
        scan prunes on the pushed-down field/term filters."""
        terms = list(dict.fromkeys(terms))
        return self.postings.where(
            (F.col("field") == field) & F.col("term").isin(terms)
        )

    def decoded(
        self,
        field: str,
        terms: Iterable[str],
        need_positions: bool = False,
        blocks: Optional[DataFrame] = None,
    ) -> DataFrame:
        """Decode posting blocks into (field, term, docid, tf, length,
        positions) rows via an Arrow-batched mapInPandas. Callers doing
        block-max pruning pass a pre-filtered `blocks`."""
        src = blocks if blocks is not None else self.blocks(field, terms)
        # project away unused payloads BEFORE the pandas decode: scoring
        # without positions must not read pos_enc (roughly half the
        # postings bytes) — mapInPandas alone defeats column pruning
        cols = ["field", "term", "docids_enc", "tfs_enc", "lens_enc"]
        if need_positions:
            cols.append("pos_enc")
        src = src.select(*cols)

        def gen(batches):
            yield from _decode_blocks_iter(batches, need_positions)

        return src.mapInPandas(gen, DECODED_SCHEMA)
