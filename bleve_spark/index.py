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
        # int64: array-field positions are offset by element_index *
        # ARRAY_POSITION_STRIDE (2^20), so ~2048+ elements overflow int32
        T.StructField("positions", T.ArrayType(T.LongType())),
    ]
)


_U64_ZERO = np.uint64(0)


def _decode_batch_scoring(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Decode a whole batch of posting blocks with three varint passes
    total, no per-block Python dispatch.

    LEB128 streams are self-delimiting, so the concatenation of every
    block's stream decodes to the concatenation of their values; block
    boundaries are recovered by counting terminator bytes (high bit
    clear) up to each block's byte offset. Docid gaps then need a
    *segmented* cumsum, done as one global cumsum minus each block's
    starting base — exact even if the global uint64 sum wraps, because
    the wrap cancels in the subtraction (mod-2^64 arithmetic) and every
    true within-block docid fits in 63 bits.

    This matters because expansion queries (prefix/wildcard/fuzzy over a
    code corpus) touch hundreds of thousands of near-singleton blocks;
    per-block numpy dispatch (~25us) was ~6 s of the 1-char-prefix
    benchmark, vs ~0.1 s batched.
    """
    d_bufs = pdf["docids_enc"].tolist()
    B = len(d_bufs)
    d_cat = b"".join(d_bufs)
    stream = np.frombuffer(d_cat, dtype=np.uint8)
    ends_cum = np.cumsum((stream & 0x80) == 0)
    ofs_end = np.cumsum(
        np.fromiter((len(x) for x in d_bufs), dtype=np.int64, count=B)
    )
    # values-per-block; np.maximum guards zero-length buffers (an empty
    # block contributes 0 via the np.where, never indexes at -1)
    boundary = np.where(
        ofs_end > 0, ends_cum[np.maximum(ofs_end - 1, 0)], 0
    )
    counts = np.diff(np.concatenate(([0], boundary)))
    gaps = codec.varint_decode(d_cat)
    cs = np.cumsum(gaps, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    if cs.size:
        base = np.where(
            starts > 0, cs[np.maximum(starts - 1, 0)], _U64_ZERO
        )
    else:
        base = np.zeros(B, dtype=np.uint64)
    block_of = np.repeat(np.arange(B), counts)
    docids = (cs - base[block_of]).astype(np.int64)
    tfs = codec.varint_decode(b"".join(pdf["tfs_enc"].tolist()))
    lens = codec.varint_decode(b"".join(pdf["lens_enc"].tolist()))
    if not (len(tfs) == len(docids) == len(lens)):
        raise ValueError(
            "corrupt posting batch: stream lengths disagree "
            f"({len(docids)} docids, {len(tfs)} tfs, {len(lens)} lens)"
        )
    out = pd.DataFrame(
        {
            "field": np.repeat(pdf["field"].to_numpy(), counts),
            "term": np.repeat(pdf["term"].to_numpy(), counts),
            "docid": docids,
            "tf": tfs.astype(np.int32),
            "length": lens.astype(np.int32),
        }
    )
    out["positions"] = None
    return out


def _decode_blocks_iter(batches, need_positions: bool):
    if not need_positions:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch_scoring(pdf)
        return
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
        out["positions"] = pd.Series(pos_out, dtype=object)
        yield out


class SearchIndex:
    """Read-side snapshot handle. Works over both layouts: the flat
    single-build table set, and the segmented layout written by
    IndexWriter (segments/seg-*/ + tombstones/) — in which case tables
    are unioned across segments and tombstoned docs are masked, the
    IndexSnapshot + deleted-bitmap analogue
    (ref: index/scorch/snapshot_index.go:81, README.md:108-133). A new
    SearchIndex instance = a new MVCC snapshot."""

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        mapping: Optional[IndexMapping] = None,
        at_seq: Optional[int] = None,
    ):
        """`at_seq` opens a historical snapshot of a segmented index:
        only segments and tombstones with seq <= at_seq are visible —
        the rollback/time-travel analogue
        (ref: index/scorch/rollback.go; Iceberg time travel in
        production). Append-only segments make this a pure filter."""
        self.spark = spark
        self.index_path = index_path
        self.mapping = mapping
        self.at_seq = at_seq

    @cached_property
    def _seg_metas(self) -> list:
        from .writer import segment_metas

        metas = segment_metas(self.index_path)
        if self.at_seq is not None:
            metas = [m for m in metas if m["seq"] <= self.at_seq]
        return metas

    def _table(self, name: str) -> DataFrame:
        if self._seg_metas:
            paths = [os.path.join(m["dir"], name) for m in self._seg_metas]
            if name == "postings" and len(paths) > 1:
                # each segment's postings dir is its own partitionBy
                # (tbucket) root: a single multi-path read would try to
                # discover ONE partition scheme across conflicting roots
                # (CONFLICTING_DIRECTORY_STRUCTURES). Per-root scans
                # unioned keep per-scan partition pruning; tiered merging
                # bounds the segment count, so the union stays small.
                from functools import reduce

                dfs = [self.spark.read.parquet(p) for p in paths]
                return reduce(
                    lambda a, b: a.unionByName(b, allowMissingColumns=True),
                    dfs,
                )
            return self.spark.read.parquet(*paths)
        return self.spark.read.parquet(os.path.join(self.index_path, name))

    @cached_property
    def _tombstones(self) -> Optional[DataFrame]:
        d = os.path.join(self.index_path, "tombstones")
        if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)
        ):
            return None
        t = self.spark.read.parquet(d)
        if self.at_seq is not None:
            t = t.where(F.col("seq") <= self.at_seq)
        return t

    def _doc_seq_col(self):
        """docid -> owning segment seq (ranges from segment metas)."""
        expr = F.lit(-1)
        for m in self._seg_metas:
            expr = F.when(
                (F.col("docid") >= m["docid_start"])
                & (F.col("docid") < m["docid_end"]),
                F.lit(m["seq"]),
            ).otherwise(expr)
        return expr

    @cached_property
    def deleted_docids(self) -> Optional[DataFrame]:
        """Docids masked by tombstones: doc is dead iff a tombstone with
        seq > the doc's segment seq names its _id (upsert + delete)."""
        if self._tombstones is None:
            return None
        raw = self._table("docs").select(
            "docid", "_id", self._doc_seq_col().alias("__seq")
        )
        dead = (
            raw.join(
                self._tombstones.groupBy("_id").agg(
                    F.max("seq").alias("__tomb_seq")
                ),
                "_id",
            )
            .where(F.col("__tomb_seq") > F.col("__seq"))
            .select("docid")
        )
        return dead

    @cached_property
    def docs(self) -> DataFrame:
        d = self._table("docs")
        if self.deleted_docids is not None:
            d = d.join(self.deleted_docids, "docid", "left_anti")
        return d

    @cached_property
    def postings(self) -> DataFrame:
        return self._table("postings")

    @cached_property
    def tbuckets(self) -> Optional[int]:
        """Directory-pruning fanout, if EVERY postings dir was written
        partitionBy(tbucket) with the SAME n (build.py stage 4). Any
        missing/odd marker disables the pruned path — correctness never
        depends on the layout."""
        import json as _json

        dirs = (
            [os.path.join(m["dir"], "postings") for m in self._seg_metas]
            if self._seg_metas
            else [os.path.join(self.index_path, "postings")]
        )
        from .build import TBUCKETS_MARKER

        ns = set()
        for d in dirs:
            try:
                with open(os.path.join(d, TBUCKETS_MARKER)) as f:
                    ns.add(int(_json.load(f)["n_tbuckets"]))
            except (OSError, ValueError, KeyError):
                return None
        return ns.pop() if len(ns) == 1 else None

    @cached_property
    def dictionary(self) -> DataFrame:
        d = self._table("dictionary")
        if len(self._seg_metas) > 1:
            # per-segment dictionaries merge by summation. Like scorch,
            # df/cf still count tombstoned docs until compaction
            # (deleted bitmaps do not rewrite dictionaries).
            d = d.groupBy("field", "term").agg(
                F.sum("df").alias("df"), F.sum("cf").alias("cf")
            )
        return d

    @cached_property
    def norms(self) -> DataFrame:
        return self._table("norms")

    @cached_property
    def doc_count(self) -> int:
        """Global N, live docs only (single-index semantics — the
        reference parity target, SURVEY.md §2.6 per-shard IDF caveat)."""
        if self._seg_metas:
            if self._tombstones is not None:
                return self.docs.count()
            return max(m["docid_end"] for m in self._seg_metas)
        return int(self._table("stats").collect()[0]["doc_count"])

    @cached_property
    def field_stats(self) -> Dict[str, dict]:
        rows = self._table("fieldstats")
        if len(self._seg_metas) > 1:
            rows = rows.groupBy("field").agg(
                F.sum("doc_count").alias("doc_count"),
                F.sum("total_len").alias("total_len"),
                (F.sum("total_len") / F.sum("doc_count")).alias("avg_len"),
            )
        return {
            r["field"]: {
                "doc_count": r["doc_count"],
                "total_len": r["total_len"],
                "avg_len": r["avg_len"],
            }
            for r in rows.collect()
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

    def expansion(self, field: str, predicate) -> DataFrame:
        """Lazy dictionary slice (term, df) matching a Column predicate
        over `term` — the FieldDict automaton analogue (ref:
        index.go:230-232, snapshot_index_dict.go). Stays a DataFrame so
        multi-term queries never materialize the term list on the
        driver; the planner joins it to the postings scan."""
        return self.dictionary.where(
            (F.col("field") == field) & predicate
        ).select("term", "df")

    def expand_terms(
        self, field: str, predicate, limit: int = 1024
    ) -> List[Tuple[str, int]]:
        """Driver-side [(term, df)] enumeration, hard-capped at `limit`
        rows. Only for inherently driver-bounded consumers (highlight
        term sets over the k-row page); query planning uses the
        DataFrame-native expansion() instead."""
        rows = (
            self.expansion(field, predicate)
            .orderBy(F.desc("df"), "term")
            .limit(limit)
            .collect()
        )
        return [(r["term"], int(r["df"])) for r in rows]

    # -- postings ---------------------------------------------------------

    def blocks(self, field: str, terms: Iterable[str]) -> DataFrame:
        """Compressed posting blocks for (field, term in terms). With a
        tbucket layout the literal terms' buckets are derived driver-side
        (zlib.crc32, no Spark job) and become a PartitionFilter — the
        scan lists ~len(buckets)/n of the files instead of opening every
        footer; field/term predicates still push down for row-group
        skipping within the listed files."""
        terms = list(dict.fromkeys(terms))
        cond = (F.col("field") == field) & F.col("term").isin(terms)
        n = self.tbuckets
        if n and terms:
            from .build import tbucket_of

            bks = sorted({tbucket_of(field, t, n) for t in terms})
            cond = F.col("tbucket").isin(bks) & cond
        return self.postings.where(cond)

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

        out = src.mapInPandas(gen, DECODED_SCHEMA)
        if self.deleted_docids is not None:
            # mask tombstoned docs at the postings level — the
            # deleted-roaring-bitmap analogue (scorch README:213-218)
            out = out.join(self.deleted_docids, "docid", "left_anti")
        return out
