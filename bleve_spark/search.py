"""Search planner + executor.

Driver-side "searcher construction" (the reference's planning phase,
/root/reference/index_impl.go:438-507) becomes: resolve terms against the
dictionary (df) and stats (N) — two tiny lookups — then compose a
DataFrame expression tree; Catalyst picks the physical strategy. Execution
(the reference's collector pull loop, search/collector/topn.go:159-280)
becomes a distributed scan of the pruned posting blocks + score columns +
global top-k via ORDER BY ... LIMIT (TakeOrderedAndProject = per-partition
top-k then driver merge, the exact analogue of bleve's collector +
MultiSearch merge, index_alias_impl.go:506-525).

Iterator -> DataFrame mapping (SURVEY.md §2.4):
  conjunction zipper   -> inner join on docid, score sum
  disjunction heap     -> unionByName + groupBy(docid), coord factor
  boolean must/not     -> left-semi/left-anti joins
  phrase positions     -> slot-union + groupBy(docid) + position-chain check
  dictionary automaton -> predicates on the dictionary table
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from . import query as Q
from . import scoring
from . import wand
from .analysis import get_analyzer
from .highlight import HighlightRequest, highlight_value
from .index import SearchIndex


# Maximum clauses a multi-term expansion / disjunction may produce;
# 0 = unlimited, matching the reference default
# (ref: search/searcher/search_disjunction.go:25-28).
DisjunctionMaxClauseCount = 0

# ref: search/searcher/search_fuzzy.go:25 (var MaxFuzziness = 2) — the
# reference caps the Levenshtein automaton at distance 2 and rejects
# negative fuzziness; error strings match NewFuzzySearcher's.
MaxFuzziness = 2


def _check_fuzziness(fuzziness: int) -> None:
    if fuzziness > MaxFuzziness:
        raise ValueError(f"fuzziness exceeds max ({MaxFuzziness})")
    if fuzziness < 0:
        raise ValueError("invalid fuzziness, negative")


class TooManyClausesError(Exception):
    """ref: search/searcher/search_disjunction.go:112-115."""

    def __init__(self, field: str, count: int, limit: int):
        super().__init__(
            f"TooManyClauses over field: `{field}` [{count} > "
            f"maxClauseCount, which is set to {limit}]"
        )
        self.field = field
        self.count = count
        self.limit = limit


@dataclass
class FacetRequest:
    """ref: search/facets_builder.go + facet/facet_builder_*.go."""

    field: str
    size: int = 10
    numeric_ranges: Optional[List[dict]] = None  # [{"name","min","max"}]
    date_ranges: Optional[List[dict]] = None  # [{"name","start","end"}]


@dataclass
class KNNRequest:
    """ref: search_knn.go:42-49 (KNNRequest: field/vector/k/boost).
    Scored over the stored vector column by the field mapping's
    similarity metric: "l2_norm" (reference default — score is the
    inverted squared distance, scorer_knn.go:71-75), "dot_product"
    (raw inner product), or the engine-extension "cosine". Unmapped
    ad-hoc vector columns score normalized cosine."""

    field: str
    vector: Sequence[float]
    k: int = 10
    boost: float = 1.0


@dataclass
class SearchRequest:
    """ref: search_no_knn.go:48-85 (SearchRequest)."""

    query: Q.Query
    size: int = 10
    from_: int = 0
    sort: Sequence[str] = ("-_score", "_id")
    fields: Sequence[str] = ()
    facets: Dict[str, FacetRequest] = dc_field(default_factory=dict)
    similarity: str = scoring.TFIDF
    search_after: Optional[Sequence] = None
    search_before: Optional[Sequence] = None
    highlight: Optional[HighlightRequest] = None
    # compute the exact matched-doc count (SearchResult.total). Disables
    # WAND pruning — a pruned scan cannot count what it skipped.
    with_total: bool = False
    # attach per-hit term locations (ref: SearchRequest.IncludeLocations,
    # search/search.go DocumentMatch.Locations)
    include_locations: bool = False
    # vector searches disjunction-merged with the main query
    # (ref: search_knn.go:165)
    knn: Sequence["KNNRequest"] = ()


@dataclass
class SearchResult:
    hits: DataFrame  # ordered: docid, _id, score, requested fields
    facets: Dict[str, DataFrame] = dc_field(default_factory=dict)
    total: Optional[int] = None  # ref: search/search.go:146-176 Total


def _phrase_path_exists(pos_by_slot, deltas, nslots, slop) -> bool:
    """Position-chain check shared by the phrase scorer UDF and
    explain(). ref findPhrasePaths (search_phrase.go:381-440): exact
    chains intersect shifted position sets; sloppy chains DFS with
    |prevPos+1 - pos| charged to the budget, out-of-order allowed,
    no location reuse."""
    if len(pos_by_slot) < nslots:
        return False
    if slop == 0:
        cur = set(pos_by_slot[0])
        for i, d in enumerate(deltas, 1):
            cur = {p + d for p in cur} & pos_by_slot[i]
            if not cur:
                return False
        return True

    def dfs(slot_i, prev_pos, budget, used):
        if slot_i == nslots:
            return True
        want = prev_pos + deltas[slot_i - 1]
        for p in pos_by_slot[slot_i]:
            if p in used:
                continue
            dev = abs(p - want)
            if dev <= budget and dfs(slot_i + 1, p, budget - dev, used | {p}):
                return True
        return False

    return any(dfs(1, p0, slop, frozenset((p0,))) for p0 in pos_by_slot[0])


class _Plan:
    """A planned sub-searcher: carries the leaf-weight sum (for queryNorm)
    and a builder closure df(query_norm) -> DataFrame(docid, score)."""

    def __init__(self, weight: float, build, n_leaves: int = 1):
        self.weight = weight
        self._build = build
        self.n_leaves = n_leaves

    def df(self, query_norm: Optional[float]) -> DataFrame:
        return self._build(query_norm)


class Searcher:
    def __init__(
        self,
        index: SearchIndex,
        similarity: str = scoring.TFIDF,
        wand_min_postings: int = 50_000_000,
        knn_lsh_min_docs: int = 1_000_000,
        knn_lsh_planes: int = 16,
        knn_lsh_probe: int = 2,
        knn_lsh_tables: int = 4,
    ):
        self.index = index
        self.similarity = similarity
        # SearchRequest.knn scans the corpus exhaustively below
        # knn_lsh_min_docs (one vectorized pass; exact) and switches to
        # multi-table multi-probe hyperplane-LSH candidate buckets
        # above it — per table scanning
        # ~(sum_{i<=probe} C(planes,i))/2^planes of the data, with
        # recall 1-(1-p_table)^tables. Defaults (16 planes x 4 tables,
        # probe 2) score ~0.8% of the corpus; measured recall@10 at
        # 10^6 vectors in BASELINE.md. knn_lsh_tables=1 with
        # probe == planes gives exact recall (full scan).
        self.knn_lsh_min_docs = knn_lsh_min_docs
        self.knn_lsh_planes = knn_lsh_planes
        self.knn_lsh_probe = knn_lsh_probe
        self.knn_lsh_tables = knn_lsh_tables
        # block-max WAND engages only when the query's summed df clears
        # this floor. Cost model (measured, BASELINE.md): the pruning
        # adds ~2 extra driver jobs (metadata agg + phase-1 theta) worth
        # seconds of fixed latency, while the vectorized decode it avoids
        # runs at tens of millions of postings/sec — break-even lands
        # near 10^8 postings. Below that (every sandbox-scale corpus)
        # exhaustive scoring is faster; at 100 TB hot terms clear it.
        self.wand_min_postings = wand_min_postings

    # ------------------------------------------------------------------
    def default_field(self) -> str:
        m = self.index.mapping
        if m is not None and m.compose_all:
            return m.default_field  # "_all" (ref: mapping/index.go:34)
        if m is not None and m.text_fields():
            return m.text_fields()[0].name
        return "content"

    def _analyzer_for(self, field: str, override: Optional[str]) -> str:
        if override:
            return override
        m = self.index.mapping
        return m.analyzer_for(field) if m else "standard"

    def _empty(self) -> DataFrame:
        return self.index.docs.select(
            F.col("docid"), F.lit(0.0).alias("score")
        ).limit(0)

    # -- leaf planners --------------------------------------------------

    def _restricted_blocks(self, fld, terms, block_filter):
        """Posting blocks for (fld, terms), optionally cut down to a WAND
        survivor set — a literal id list (tiny phase-1 sets) or a
        broadcast-joined DataFrame(block) (phase-2 survivors)."""
        if block_filter is None:
            return None
        src = self.index.blocks(fld, terms)
        if isinstance(block_filter, list):
            return src.where(F.col("block").isin(block_filter))
        return src.join(F.broadcast(block_filter), "block")

    def _plan_term(
        self, fld: str, term: str, boost: float, block_filter=None
    ) -> _Plan:
        stats = self.index.term_stats(fld, [term])
        if term not in stats:
            return _Plan(0.0, lambda qn: self._empty())
        df_count, _cf = stats[term]
        idf = scoring.idf(self.similarity, self.index.doc_count, df_count)
        weight = scoring.term_weight(self.similarity, boost, idf)
        avg_len = self.index.avg_len(fld)

        def build(qn):
            decoded = self.index.decoded(
                fld,
                [term],
                blocks=self._restricted_blocks(fld, [term], block_filter),
            )
            return decoded.select(
                "docid",
                scoring.term_score_col(
                    self.similarity,
                    F.col("tf"),
                    F.col("length"),
                    idf,
                    boost,
                    qn,
                    avg_len,
                ).alias("score"),
            )

        return _Plan(weight, build)

    def _idf_col(self, df_col: Column) -> Column:
        """Per-term idf as a column over the dictionary `df` column —
        the vectorized form of scoring.idf for DataFrame-native
        multi-term expansions."""
        n = float(self.index.doc_count)
        dfd = df_col.cast("double")
        if self.similarity == scoring.TFIDF:
            # ref: scorer_term.go:71
            return F.lit(1.0) + F.log(F.lit(n) / (dfd + F.lit(1.0)))
        return F.log(
            F.lit(1.0) + (F.lit(n) - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
        )

    def _plan_multi_term(
        self,
        fld: str,
        predicate: Column,
        boost: float,
        block_filter=None,
    ) -> _Plan:
        """Dictionary-expansion queries (prefix/wildcard/regexp/fuzzy/
        term_range) -> disjunction of term searchers (ref:
        searcher/search_multi_term.go).

        DataFrame-native: the matching dictionary slice never reaches the
        driver. One small agg job yields (clause count, queryNorm weight);
        at execution the same predicate filters the postings scan
        (prefix predicates push down to parquet) and the slice joins in
        per-term df, from which idf is computed as a column. A 1-char
        prefix over millions of dictionary terms therefore costs one
        scalar agg on the driver, not a million-entry literal plan.

        Clause guard parity (ref: search_multi_term.go:96-98,
        search_disjunction.go:105-115): when DisjunctionMaxClauseCount
        is nonzero and the expansion exceeds it, raises
        TooManyClausesError exactly like the reference (whose default is
        also 0 = unlimited, search_disjunction.go:28)."""
        slice_df = self.index.expansion(fld, predicate)
        idf_c = self._idf_col(F.col("df"))
        if self.similarity == scoring.TFIDF:
            w = F.lit(boost) * idf_c
            weight_col = w * w
        else:
            weight_col = F.lit(0.0)
        row = slice_df.agg(
            F.count("*").alias("n"), F.sum(weight_col).alias("w")
        ).collect()[0]
        n_terms = int(row["n"])
        if DisjunctionMaxClauseCount and n_terms > DisjunctionMaxClauseCount:
            raise TooManyClausesError(fld, n_terms, DisjunctionMaxClauseCount)
        if n_terms == 0:
            return _Plan(0.0, lambda qn: self._empty())
        weight = float(row["w"]) if row["w"] is not None else 0.0
        avg_len = self.index.avg_len(fld)
        total = n_terms

        def build(qn):
            blocks = self.index.postings.where(
                (F.col("field") == fld) & predicate
            )
            if block_filter is not None:
                if isinstance(block_filter, list):
                    blocks = blocks.where(F.col("block").isin(block_filter))
                else:
                    blocks = blocks.join(F.broadcast(block_filter), "block")
            decoded = self.index.decoded(fld, [], blocks=blocks)
            # known expansion cardinality picks the join strategy: small
            # slices broadcast; huge ones shuffle (AQE re-plans at runtime)
            exp = (
                F.broadcast(slice_df) if n_terms <= 65536 else slice_df
            )
            per_term = decoded.join(exp, "term").select(
                "docid",
                self._score_col_dynamic_idf(
                    F.col("tf"),
                    F.col("length"),
                    self._idf_col(F.col("df")),
                    boost,
                    qn,
                    avg_len,
                ).alias("score"),
            )
            agg = per_term.groupBy("docid").agg(
                F.sum("score").alias("sum_score"),
                F.count("*").alias("nmatch"),
            )
            score = F.col("sum_score")
            if self.similarity == scoring.TFIDF:
                # disjunction coord (ref: scorer/scorer_disjunction.go:65-66)
                score = score * F.col("nmatch") / F.lit(total)
            return agg.select("docid", score.alias("score"))

        return _Plan(weight, build, n_leaves=n_terms)

    def _score_col_dynamic_idf(
        self, tf_col, len_col, idf_col: Column, boost, qn, avg_len
    ) -> Column:
        """term_score_col variant where idf is a per-row column (multi-term
        expansions score each expanded term with its own idf)."""
        if self.similarity == scoring.TFIDF:
            norm = (
                (F.lit(1.0) / F.sqrt(F.greatest(len_col, F.lit(1))))
                .cast("float")
                .cast("double")
            )
            score = F.sqrt(tf_col.cast("double")) * norm * idf_col
            if qn is not None:
                score = score * F.lit(boost) * idf_col * F.lit(qn)
            return score
        tf_d = tf_col.cast("double")
        denom = tf_d + F.lit(scoring.BM25_K1) * (
            F.lit(1.0 - scoring.BM25_B)
            + F.lit(scoring.BM25_B)
            * len_col.cast("double")
            / F.lit(max(avg_len, 1e-9))
        )
        return (
            F.lit(boost) * idf_col * tf_d * F.lit(scoring.BM25_K1 + 1.0) / denom
        )

    def _plan_const(self, docids_df: DataFrame, boost: float) -> _Plan:
        """Constant scorer (ref: scorer/scorer_constant.go)."""

        def build(qn):
            score = float(boost) * (qn if qn is not None else 1.0)
            return docids_df.select("docid", F.lit(score).alias("score"))

        # constant scorer weight = boost^2 (ref: scorer_constant.go)
        w = boost * boost if self.similarity == scoring.TFIDF else 0.0
        return _Plan(w, build)

    # -- composite planners ---------------------------------------------

    def _plan_conjunction(self, children: List[_Plan]) -> _Plan:
        children = [c for c in children]
        weight = sum(c.weight for c in children)

        def build(qn):
            dfs = [c.df(qn) for c in children]
            out = dfs[0].select("docid", F.col("score").alias("s0"))
            for i, d in enumerate(dfs[1:], 1):
                out = out.join(
                    d.select("docid", F.col("score").alias(f"s{i}")), "docid"
                )
            total = sum(F.col(f"s{i}") for i in range(len(dfs)))
            return out.select("docid", total.alias("score"))

        return _Plan(weight, build, sum(c.n_leaves for c in children))

    def _plan_disjunction(self, children: List[_Plan], min_match: int) -> _Plan:
        weight = sum(c.weight for c in children)
        total = len(children)
        min_match = max(min_match, 1)

        def build(qn):
            parts = [c.df(qn) for c in children]
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            agg = u.groupBy("docid").agg(
                F.sum("score").alias("sum_score"), F.count("*").alias("nmatch")
            )
            score = F.col("sum_score")
            if self.similarity == scoring.TFIDF:
                score = score * F.col("nmatch") / F.lit(total)
            out = agg
            if min_match > 1:
                out = out.where(F.col("nmatch") >= min_match)
            return out.select("docid", score.alias("score"))

        return _Plan(weight, build, sum(c.n_leaves for c in children))

    def _plan_boolean(
        self,
        must: List[_Plan],
        should: List[_Plan],
        must_not: List[_Plan],
        min_should: int,
    ) -> _Plan:
        """ref: searcher/search_boolean.go:37-330."""
        weight = sum(c.weight for c in must) + sum(c.weight for c in should)

        def build(qn):
            base = None
            if must:
                base = self._plan_conjunction(must).df(qn)
            should_df = None
            if should:
                should_df = self._plan_disjunction(should, min_should).df(qn)
            if base is None:
                base = should_df
                should_df = None
            if base is None:
                if must_not:
                    # must_not-only boolean = match_all minus exclusions
                    # (ref bug #193 fix, searcher/search_boolean.go: nil
                    # must/should -> match-all base searcher)
                    base = self.index.docs.select(
                        "docid", F.lit(1.0).alias("score")
                    )
                else:
                    return self._empty()
            if should_df is not None:
                # min_should == 0: should is an optional score bonus
                # (left join). min_should > 0: should becomes REQUIRED —
                # the reference only lets a must-only doc through "when
                # shouldSearcher.Min() == 0" (search_boolean.go:282-290),
                # so a doc failing the min-disjunction is excluded even
                # if every must clause matches.
                how = "inner" if min_should > 0 else "left"
                base = (
                    base.join(
                        should_df.select(
                            "docid", F.col("score").alias("_should_score")
                        ),
                        "docid",
                        how,
                    )
                    .withColumn(
                        "score",
                        F.col("score")
                        + F.coalesce(F.col("_should_score"), F.lit(0.0)),
                    )
                    .drop("_should_score")
                )
            for mn in must_not:
                base = base.join(
                    mn.df(None).select("docid"), "docid", "left_anti"
                )
            return base

        return _Plan(
            weight,
            build,
            sum(c.n_leaves for c in must) + sum(c.n_leaves for c in should),
        )

    def _plan_phrase(
        self,
        fld: str,
        slot_terms: List[Tuple[Tuple[str, ...], int]],
        boost: float,
        slop: int,
    ) -> _Plan:
        """(Multi-)phrase = conjunction of per-slot searchers (a slot with
        alternatives is a disjunction, ref: searcher/search_phrase.go:
        80-140 NewMultiPhraseSearcher) + position-chain check (ref:
        findPhrasePaths, search_phrase.go:356-440). slot_terms is
        [(alternative terms, analyzed_position)] — stop-filter position
        gaps carry through as larger deltas; array-element position
        strides keep chains from spanning elements (the ArrayPositions
        equality stand-in, search_phrase.go:414)."""
        slots = [
            (tuple(dict.fromkeys(alts)), pos) for alts, pos in slot_terms
        ]
        all_terms = list(
            dict.fromkeys(t for alts, _ in slots for t in alts)
        )
        stats = self.index.term_stats(fld, all_terms)
        # conjunction: every slot needs at least one indexed alternative
        if any(
            not any(t in stats for t in alts) for alts, _ in slots
        ):
            return _Plan(0.0, lambda qn: self._empty())
        present = [t for t in all_terms if t in stats]
        n = self.index.doc_count
        avg_len = self.index.avg_len(fld)
        term_idf = {
            t: scoring.idf(self.similarity, n, stats[t][0]) for t in present
        }
        weight = sum(
            scoring.term_weight(self.similarity, boost, i)
            for i in term_idf.values()
        )
        deltas = [
            slots[i][1] - slots[i - 1][1] for i in range(1, len(slots))
        ]
        nslots = len(slots)

        def build(qn):
            # block-intersection prefilter — the conjunction-bitmap
            # analogue (ref: index/scorch/optimize.go:25-92
            # OptimizeTFRConjunction): posting blocks are docid-range
            # aligned, so every phrase candidate doc lives in a block
            # where EVERY slot has postings. Intersecting the slots'
            # block-id sets is a metadata-only scan (no decode, no
            # pos_enc read) that prunes the expensive positions decode
            # to co-occurring ranges — at 100 TB a rare slot shrinks a
            # hot slot's decode to its own neighborhoods.
            # cost gate: the prefilter's metadata scan only pays when a
            # selective slot can actually prune a hot one (df ratio)
            slot_dfs = [
                sum(stats[t][0] for t in alts if t in stats)
                for alts, _p in slots
            ]
            selective = min(slot_dfs) * 4 < max(slot_dfs)
            blocks_src = self.index.blocks(fld, present)
            if nslots > 1 and selective:
                common = None
                for alts, _p in slots:
                    ts = [t for t in alts if t in stats]
                    bi = (
                        self.index.blocks(fld, ts)
                        .select("block")
                        .distinct()
                    )
                    common = bi if common is None else common.join(bi, "block")
                blocks_src = blocks_src.join(common, "block")
            decoded = self.index.decoded(
                fld, present, need_positions=True, blocks=blocks_src
            )
            # fan decoded term rows out to their phrase slots (a term may
            # serve several slots; the join duplicates it per slot)
            slot_entries = [
                (t, i, len(alts))
                for i, (alts, _p) in enumerate(slots)
                for t in alts
                if t in stats
            ]
            slot_df = self.index.spark.createDataFrame(
                pd.DataFrame(
                    slot_entries, columns=["term", "slot", "nalts"]
                )
            )
            # score each (doc, slot, term) row JVM-side, then ONE
            # aggregation + ONE Arrow UDF evaluates the position chain
            # and the per-slot score fold together (score NULL = no
            # phrase path) — no second shuffle, no re-join
            idf_map = F.create_map(
                *[x for t, i in term_idf.items() for x in (F.lit(t), F.lit(i))]
            )
            parts = decoded.join(F.broadcast(slot_df), "term").select(
                "docid",
                "slot",
                "nalts",
                "positions",
                self._score_col_dynamic_idf(
                    F.col("tf"),
                    F.col("length"),
                    idf_map[F.col("term")],
                    boost,
                    qn,
                    avg_len,
                ).alias("s"),
            )
            # exact single-alternative phrases (the hot path: slop=0,
            # one term per slot) evaluate the position chain entirely
            # JVM-side: conditional aggregation pivots each slot's
            # positions/score into columns, then a
            # transform+array_intersect chain replaces the Arrow UDF —
            # whole-stage codegen end to end, no Python, no
            # struct-collect shuffle payload. Hot+hot phrases
            # ("apache license"-class) are dominated by this stage.
            if slop == 0 and all(len(alts) == 1 for alts, _p in slots):
                aggs = []
                for i in range(nslots):
                    aggs.append(
                        F.first(
                            F.when(F.col("slot") == i, F.col("positions")),
                            ignorenulls=True,
                        ).alias(f"p{i}")
                    )
                    aggs.append(
                        F.sum(
                            F.when(F.col("slot") == i, F.col("s"))
                        ).alias(f"s{i}")
                    )
                g = parts.groupBy("docid").agg(*aggs)
                present_pred = None
                for i in range(nslots):
                    c = F.col(f"p{i}").isNotNull()
                    present_pred = c if present_pred is None else (
                        present_pred & c
                    )
                g = g.where(present_pred)
                def _shift(col, d):
                    # NB: a 2-parameter lambda would be treated as the
                    # (element, index) form by F.transform
                    return F.transform(col, lambda x: x + F.lit(d))

                reach = F.col("p0")
                for i in range(1, nslots):
                    reach = F.array_intersect(
                        _shift(reach, deltas[i - 1]), F.col(f"p{i}")
                    )
                score = None
                for i in range(nslots):
                    score = F.col(f"s{i}") if score is None else (
                        score + F.col(f"s{i}")
                    )
                return (
                    g.where(F.size(reach) > 0)
                    .select("docid", score.alias("score"))
                )
            g = parts.groupBy("docid").agg(
                F.collect_list(
                    F.struct("slot", "nalts", "positions", "s")
                ).alias("rows"),
                F.count_distinct(F.col("slot")).alias("nslots_present"),
            ).where(F.col("nslots_present") >= nslots)

            tfidf_mode = self.similarity == scoring.TFIDF

            @F.pandas_udf(T.DoubleType())
            def phrase_score(rows_col: pd.Series) -> pd.Series:
                def eval_doc(rows):
                    pos_by_slot: dict = {}
                    slot_sum: dict = {}
                    slot_cnt: dict = {}
                    slot_nalts: dict = {}
                    for r in rows:
                        sl = r["slot"]
                        pos_by_slot.setdefault(sl, set()).update(
                            r["positions"]
                        )
                        # rows are distinct terms per (doc, slot):
                        # decoded is unique per (doc, term)
                        slot_sum[sl] = slot_sum.get(sl, 0.0) + r["s"]
                        slot_cnt[sl] = slot_cnt.get(sl, 0) + 1
                        slot_nalts[sl] = r["nalts"]
                    if not _phrase_path_exists(
                        pos_by_slot, deltas, nslots, slop
                    ):
                        return None
                    # conjunction of per-slot scores; a multi-alternative
                    # slot scores like a disjunction (sum x matched/total
                    # coord in tfidf mode, ref: scorer_disjunction.go:65)
                    if tfidf_mode:
                        return sum(
                            slot_sum[sl] * slot_cnt[sl] / slot_nalts[sl]
                            for sl in slot_sum
                        )
                    return sum(slot_sum.values())

                return rows_col.map(eval_doc)

            return (
                g.select(
                    "docid", phrase_score(F.col("rows")).alias("score")
                )
                .where(F.col("score").isNotNull())
            )

        return _Plan(weight, build, n_leaves=len(present))

    # -- query dispatch --------------------------------------------------

    def plan(self, q: Q.Query) -> _Plan:
        fld = q.field or self.default_field()
        b = q.boost
        if isinstance(q, Q.TermQuery):
            return self._plan_term(fld, q.term, b)
        if isinstance(q, Q.MatchQuery):
            analyzer = get_analyzer(self._analyzer_for(fld, q.analyzer))
            tokens = analyzer.analyze(q.text)
            if not tokens:
                return _Plan(0.0, lambda qn: self._empty())
            # one dictionary lookup for all terms; per-term planners then
            # hit the memo instead of issuing N sequential driver jobs
            self.index.term_stats(fld, [t[0] for t in tokens])
            if q.fuzziness > 0:
                children = [
                    self._plan_fuzzy(fld, t[0], q.fuzziness, q.prefix_length, b)
                    for t in tokens
                ]
            else:
                children = [self._plan_term(fld, t[0], b) for t in tokens]
            if len(children) == 1:
                return children[0]
            if q.operator == "and":
                return self._plan_conjunction(children)
            return self._plan_disjunction(children, 1)
        if isinstance(q, Q.MatchPhraseQuery):
            analyzer = get_analyzer(self._analyzer_for(fld, q.analyzer))
            tokens = analyzer.analyze(q.text)
            if not tokens:
                return _Plan(0.0, lambda qn: self._empty())
            slot_terms = [((t[0],), t[1]) for t in tokens]
            return self._plan_phrase(fld, slot_terms, b, q.slop)
        if isinstance(q, Q.PhraseQuery):
            # terms entries are strings (phrase) or lists of alternatives
            # per slot (multi_phrase, ref: query/multi_phrase.go)
            slot_terms = [
                (
                    tuple(t) if isinstance(t, (list, tuple)) else (t,),
                    i + 1,
                )
                for i, t in enumerate(q.terms)
            ]
            return self._plan_phrase(fld, slot_terms, b, q.slop)
        if isinstance(
            q,
            (
                Q.PrefixQuery,
                Q.WildcardQuery,
                Q.RegexpQuery,
                Q.TermRangeQuery,
            ),
        ):
            return self._plan_multi_term(
                fld, self._expansion_predicate(q), b
            )
        if isinstance(q, Q.FuzzyQuery):
            return self._plan_fuzzy(fld, q.term, q.fuzziness, q.prefix_length, b)
        if isinstance(q, Q.NumericRangeQuery):
            col = F.col(fld).cast("double")
            pred = F.lit(True)
            if q.min is not None:
                pred = pred & (col >= q.min if q.inclusive_min else col > q.min)
            if q.max is not None:
                pred = pred & (col <= q.max if q.inclusive_max else col < q.max)
            return self._plan_const(
                self.index.docs.where(pred).select("docid"), b
            )
        if isinstance(q, Q.DateRangeQuery):
            # endpoints resolve driver-side through the named datetime
            # parser registry (ref: query/date_range_string.go +
            # analysis/datetime/*); the default is dateTimeOptional
            from datetime import datetime as _dt, timezone as _tz

            from .analysis.datetimes import datetime_parser_named

            parser = datetime_parser_named(
                q.datetime_parser or "dateTimeOptional"
            )

            def _endpoint(v):
                if v is None:
                    return None
                if isinstance(v, str):
                    v = parser.parse(v)
                if isinstance(v, _dt) and v.tzinfo is not None:
                    # compare in naive UTC like the stored docvalues
                    v = v.astimezone(_tz.utc).replace(tzinfo=None)
                return v

            col = F.col(fld).cast("timestamp")
            pred = F.lit(True)
            start, end = _endpoint(q.start), _endpoint(q.end)
            if start is not None:
                s = F.lit(start)
                pred = pred & (col >= s if q.inclusive_start else col > s)
            if end is not None:
                e = F.lit(end)
                pred = pred & (col <= e if q.inclusive_end else col < e)
            return self._plan_const(
                self.index.docs.where(pred).select("docid"), b
            )
        if isinstance(q, Q.BoolFieldQuery):
            return self._plan_const(
                self.index.docs.where(
                    F.col(fld).cast("boolean") == q.value
                ).select("docid"),
                b,
            )
        if isinstance(q, Q.DocIDQuery):
            return self._plan_const(
                self.index.docs.where(F.col("_id").isin(list(q.ids))).select(
                    "docid"
                ),
                b,
            )
        if isinstance(q, Q.FilterQuery):
            # FilteringSearcher analogue (ref: searcher/search_filter.go)
            # — the declarative form: semi-join the child's hits with
            # the predicate-filtered doc set
            child = self.plan(q.child)

            def build_filtered(qn, _child=child, _pred=q.predicate):
                keep = self.index.docs.where(F.expr(_pred)).select("docid")
                return _child.df(qn).join(keep, "docid", "left_semi")

            return _Plan(child.weight, build_filtered, child.n_leaves)
        if isinstance(q, Q.IPRangeQuery):
            # CIDR containment over the 16-byte packed form of the
            # stored address — the columnar replacement for the
            # reference's 16-byte IP terms (query/ip_range.go +
            # searcher/search_ip_range.go). IPv4 is handled natively
            # (dotted-quad -> int range predicate, whole-stage codegen);
            # IPv6 packs via an Arrow-batched UDF and compares as
            # binary (unsigned lexicographic), v4-mapped like the
            # reference. A bare address means /32 (v4) or /128 (v6).
            import ipaddress

            is_v6 = ":" in q.cidr
            cidr = (
                q.cidr
                if "/" in q.cidr
                else q.cidr + ("/128" if is_v6 else "/32")
            )
            net = ipaddress.ip_network(cidr, strict=False)
            if not is_v6:
                parts = F.split(F.col(fld), "\\.")
                packed = (
                    parts.getItem(0).cast("long") * 16777216
                    + parts.getItem(1).cast("long") * 65536
                    + parts.getItem(2).cast("long") * 256
                    + parts.getItem(3).cast("long")
                )
                pred = (packed >= int(net.network_address)) & (
                    packed <= int(net.broadcast_address)
                )
            else:
                @F.pandas_udf(T.BinaryType())
                def pack16(vals: pd.Series) -> pd.Series:
                    def pk(v):
                        try:
                            a = ipaddress.ip_address(v)
                        except (ValueError, TypeError):
                            return None
                        if a.version == 4:
                            a = ipaddress.IPv6Address(
                                "::ffff:" + str(a)
                            )
                        return a.packed

                    return vals.map(pk)

                lo = net.network_address.packed
                hi = net.broadcast_address.packed
                col16 = pack16(F.col(fld))
                pred = (col16 >= F.lit(lo)) & (col16 <= F.lit(hi))
            return self._plan_const(
                self.index.docs.where(pred).select("docid"), b
            )
        if isinstance(q, Q.GeoShapeQuery):
            from . import geoshape as GS

            qshape = GS.parse_shape(q.shape)
            relation = q.relation
            docs = self.index.docs
            bbox_col = f"{fld}__bbox"
            if bbox_col in docs.columns:
                # native prefilter (the s2 covering-token analogue):
                # every relation implies bbox intersection, so this
                # prunes in whole-stage codegen before any geometry UDF
                x1, y1, x2, y2 = qshape.bbox()
                bb = F.col(bbox_col)
                docs = docs.where(
                    (bb["minx"] <= x2)
                    & (bb["maxx"] >= x1)
                    & (bb["miny"] <= y2)
                    & (bb["maxy"] >= y1)
                )
            col = F.col(fld)
            try:
                if isinstance(docs.schema[fld].dataType, T.StructType):
                    col = F.to_json(col)
            except Exception:
                pass

            @F.pandas_udf(T.BooleanType())
            def rel_udf(vals: pd.Series) -> pd.Series:
                def ok(v):
                    s = GS.shape_from_value(v)
                    return s is not None and GS.relate(s, qshape, relation)

                return vals.map(ok)

            return self._plan_const(
                docs.where(rel_udf(col)).select("docid"), b
            )
        if isinstance(
            q, (Q.GeoDistanceQuery, Q.GeoBoundingBoxQuery, Q.GeoPolygonQuery)
        ):
            from . import geo

            lat_col = F.col(f"{fld}.lat")
            lon_col = F.col(f"{fld}.lon")
            if isinstance(q, Q.GeoDistanceQuery):
                lat, lon = geo.parse_point(q.location)
                pred = geo.haversine_m(
                    lat_col, lon_col, lat, lon
                ) <= geo.parse_distance(q.distance)
            elif isinstance(q, Q.GeoBoundingBoxQuery):
                tl_lat, tl_lon = geo.parse_point(q.top_left)
                br_lat, br_lon = geo.parse_point(q.bottom_right)
                pred = (
                    (lat_col <= tl_lat)
                    & (lat_col >= br_lat)
                    & (lon_col >= tl_lon)
                    & (lon_col <= br_lon)
                )
            else:
                verts = [geo.parse_point(p) for p in q.polygon_points]
                pred = geo.in_polygon(lat_col, lon_col, verts)
            return self._plan_const(
                self.index.docs.where(pred).select("docid"), b
            )
        if isinstance(q, Q.MatchAllQuery):
            return self._plan_const(self.index.docs.select("docid"), b)
        if isinstance(q, Q.MatchNoneQuery):
            return _Plan(0.0, lambda qn: self._empty())
        if isinstance(q, Q.ConjunctionQuery):
            self._prefetch_term_stats(q.conjuncts)
            return self._plan_conjunction([self.plan(c) for c in q.conjuncts])
        if isinstance(q, Q.DisjunctionQuery):
            self._prefetch_term_stats(q.disjuncts)
            return self._plan_disjunction(
                [self.plan(c) for c in q.disjuncts], q.min
            )
        if isinstance(q, Q.BooleanQuery):
            self._prefetch_term_stats(q.must + q.should + q.must_not)
            return self._plan_boolean(
                [self.plan(c) for c in q.must],
                [self.plan(c) for c in q.should],
                [self.plan(c) for c in q.must_not],
                q.min_should,
            )
        raise NotImplementedError(type(q).__name__)

    def _prefetch_term_stats(self, children):
        """Warm the (field, term) stats memo with ONE dictionary lookup
        per field for all sibling term leaves."""
        by_field: Dict[str, List[str]] = {}
        for c in children:
            if isinstance(c, Q.TermQuery):
                by_field.setdefault(
                    c.field or self.default_field(), []
                ).append(c.term)
        for f, ts in by_field.items():
            self.index.term_stats(f, ts)

    def _plan_fuzzy(
        self, fld: str, term: str, fuzziness: int, prefix_len: int, boost: float
    ) -> _Plan:
        """Dictionary scan with bounded edit distance
        (ref: searcher/search_fuzzy.go:25-140); F.levenshtein is the
        built-in DP."""
        _check_fuzziness(fuzziness)
        pred = F.levenshtein(F.col("term"), F.lit(term)) <= fuzziness
        if prefix_len > 0:
            pred = pred & F.col("term").startswith(term[:prefix_len])
        return self._plan_multi_term(fld, pred, boost)

    def _expansion_predicate(self, q: Q.Query):
        """Dictionary-slice predicate for an expansion query — shared by
        the planner and explain() so both see the identical term set."""
        if isinstance(q, Q.PrefixQuery):
            return F.col("term").startswith(q.prefix)
        if isinstance(q, Q.WildcardQuery):
            return F.col("term").rlike(_wildcard_to_regex(q.wildcard))
        if isinstance(q, Q.RegexpQuery):
            return F.col("term").rlike(f"^(?:{q.regexp})$")
        if isinstance(q, Q.FuzzyQuery):
            _check_fuzziness(q.fuzziness)
            pred = (
                F.levenshtein(F.col("term"), F.lit(q.term)) <= q.fuzziness
            )
            if q.prefix_length > 0:
                pred = pred & F.col("term").startswith(
                    q.term[: q.prefix_length]
                )
            return pred
        if isinstance(q, Q.TermRangeQuery):
            pred = F.lit(True)
            if q.min is not None:
                pred = pred & (
                    F.col("term") >= q.min
                    if q.inclusive_min
                    else F.col("term") > q.min
                )
            if q.max is not None:
                pred = pred & (
                    F.col("term") <= q.max
                    if q.inclusive_max
                    else F.col("term") < q.max
                )
            return pred
        raise NotImplementedError(type(q).__name__)

    # -- execution -------------------------------------------------------

    def matches(self, q: Q.Query) -> DataFrame:
        """DataFrame(docid, score) for a query. Composites push queryNorm
        to leaves (ref: search_conjunction.go:108-120); a bare TERM leaf
        scores without queryNorm, exactly like the reference — but
        multi-term EXPANSIONS (prefix/wildcard/regexp/fuzzy/term_range)
        compile to a disjunction whose constructor computes its own
        queryNorm (search_disjunction_slice.go:75,104-116), so they norm
        even at the top level (reference regexp table: "co.*" scores
        0.33875..., which includes 1/sqrt(sum of idf^2))."""
        plan = self.plan(q)
        qn = None
        if (
            self.similarity == scoring.TFIDF
            and isinstance(
                q,
                (
                    Q.ConjunctionQuery,
                    Q.DisjunctionQuery,
                    Q.BooleanQuery,
                    Q.MatchQuery,
                    Q.MatchPhraseQuery,
                    Q.PhraseQuery,
                    Q.PrefixQuery,
                    Q.WildcardQuery,
                    Q.RegexpQuery,
                    Q.FuzzyQuery,
                    Q.TermRangeQuery,
                ),
            )
            and plan.weight > 0
        ):
            qn = 1.0 / math.sqrt(plan.weight)
        return plan.df(qn)

    # -- block-max WAND top-k (north rule; bleve_spark/wand.py) ----------

    def _wand_candidate(self, q: Q.Query):
        """(field, [(term, boost)], conjunctive, apply_qn) when q is a
        pure term-leaf query WAND can accelerate, else None. Duplicate
        terms bail out so the restricted plan stays shape-identical to
        the plain one."""
        if isinstance(q, Q.TermQuery):
            fld = q.field or self.default_field()
            return fld, [(q.term, q.boost)], False, False
        if isinstance(q, Q.MatchQuery) and q.fuzziness == 0:
            fld = q.field or self.default_field()
            analyzer = get_analyzer(self._analyzer_for(fld, q.analyzer))
            tokens = analyzer.analyze(q.text)
            terms = [t[0] for t in tokens]
            if not terms or len(set(terms)) != len(terms):
                return None
            return (
                fld,
                [(t, q.boost) for t in terms],
                q.operator == "and",
                True,
            )
        if isinstance(q, (Q.ConjunctionQuery, Q.DisjunctionQuery)):
            children = (
                q.conjuncts
                if isinstance(q, Q.ConjunctionQuery)
                else q.disjuncts
            )
            if isinstance(q, Q.DisjunctionQuery) and q.min > 1:
                return None
            if not children or not all(
                isinstance(c, Q.TermQuery) for c in children
            ):
                return None
            flds = {c.field or self.default_field() for c in children}
            terms = [c.term for c in children]
            if len(flds) != 1 or len(set(terms)) != len(terms):
                return None
            return (
                flds.pop(),
                [(c.term, c.boost) for c in children],
                isinstance(q, Q.ConjunctionQuery),
                True,
            )
        return None

    def _wand_scored(self, q: Q.Query, k: int) -> Optional[DataFrame]:
        """Exact top-k scoring over WAND-surviving posting blocks, or
        None to fall back to the plain path. The restricted plan reuses
        the exact same planner builders, so scores are identical by
        construction — only blocks provably below the kth score are
        skipped."""
        cand = self._wand_candidate(q)
        if cand is None or k <= 0:
            return None
        fld, term_boosts, conjunctive, apply_qn = cand
        stats = self.index.term_stats(fld, [t for t, _ in term_boosts])
        present = [(t, b) for t, b in term_boosts if t in stats]
        if not present or (conjunctive and len(present) < len(term_boosts)):
            return None  # plain path is already trivial/empty here
        if sum(stats[t][0] for t, _ in present) < self.wand_min_postings:
            return None
        n = self.index.doc_count
        term_idf = {
            t: scoring.idf(self.similarity, n, stats[t][0])
            for t, _ in present
        }
        weight = sum(
            scoring.term_weight(self.similarity, b, term_idf[t])
            for t, b in present
        )
        qn = None
        if apply_qn and self.similarity == scoring.TFIDF and weight > 0:
            qn = 1.0 / math.sqrt(weight)
        if self.similarity == scoring.TFIDF:
            term_mult = {
                t: (b * term_idf[t] * qn if qn is not None else 1.0)
                for t, b in present
            }
        else:
            term_mult = {t: b * term_idf[t] for t, b in present}

        pot = wand.block_potentials(
            self.index, self.similarity, fld, term_idf, term_mult, conjunctive
        )
        p1 = wand.phase1_blocks(pot, k)
        if not p1:
            return None

        def build_plan(block_filter):
            # full term_boosts (not just present): the disjunction coord
            # divides by the total clause count including zero-match
            # clauses, exactly like the plain path
            children = [
                self._plan_term(fld, t, b, block_filter=block_filter)
                for t, b in term_boosts
            ]
            if len(children) == 1:
                return children[0]
            if conjunctive:
                return self._plan_conjunction(children)
            return self._plan_disjunction(children, 1)

        rows = (
            build_plan(p1)
            .df(qn)
            .orderBy(F.desc("score"))
            .limit(k)
            .collect()
        )
        if len(rows) < k:
            return None  # too few candidates to bound theta — no pruning
        theta = min(r["score"] for r in rows)
        if not (theta > 0):
            return None
        survivors = wand.survivor_blocks(pot, theta)
        return build_plan(survivors).df(qn)

    # -- highlighting -----------------------------------------------------

    def _query_terms(self, q: Q.Query, fld: str) -> set:
        """Analyzed terms the query contributes on `fld` — the reference
        derives these from term vectors; we re-derive from the query tree
        (dictionary-expanded for prefix/wildcard/regexp/fuzzy)."""
        out: set = set()

        def expand(pred):
            out.update(t for t, _ in self.index.expand_terms(fld, pred))

        def walk(node):
            qf = getattr(node, "field", None) or self.default_field()
            if isinstance(node, Q.TermQuery):
                if qf == fld:
                    out.add(node.term)
            elif isinstance(node, (Q.MatchQuery, Q.MatchPhraseQuery)):
                if qf == fld:
                    analyzer = get_analyzer(
                        self._analyzer_for(fld, node.analyzer)
                    )
                    out.update(t[0] for t in analyzer.analyze(node.text))
            elif isinstance(node, Q.PhraseQuery):
                if qf == fld:
                    for t in node.terms:
                        if isinstance(t, (list, tuple)):
                            out.update(t)
                        else:
                            out.add(t)
            elif isinstance(node, Q.PrefixQuery) and qf == fld:
                expand(F.col("term").startswith(node.prefix))
            elif isinstance(node, Q.WildcardQuery) and qf == fld:
                expand(F.col("term").rlike(_wildcard_to_regex(node.wildcard)))
            elif isinstance(node, Q.RegexpQuery) and qf == fld:
                expand(F.col("term").rlike(f"^(?:{node.regexp})$"))
            elif isinstance(node, Q.FuzzyQuery) and qf == fld:
                pred = (
                    F.levenshtein(F.col("term"), F.lit(node.term))
                    <= node.fuzziness
                )
                if node.prefix_length > 0:
                    pred = pred & F.col("term").startswith(
                        node.term[: node.prefix_length]
                    )
                expand(pred)
            elif isinstance(node, Q.ConjunctionQuery):
                for c in node.conjuncts:
                    walk(c)
            elif isinstance(node, Q.DisjunctionQuery):
                for c in node.disjuncts:
                    walk(c)
            elif isinstance(node, Q.BooleanQuery):
                # must_not terms are excluded — they never match a hit
                for c in list(node.must) + list(node.should):
                    walk(c)

        walk(q)
        return out

    def _query_fields(self, q: Q.Query) -> List[str]:
        """Fields the query explicitly targets, in first-seen order —
        the default highlight field set when the request names none
        (the reference highlights fields with match locations)."""
        out: List[str] = []

        def walk(node):
            f = getattr(node, "field", None)
            if f and f not in out:
                out.append(f)
            for attr in ("conjuncts", "disjuncts", "must", "should"):
                for c in getattr(node, attr, []) or []:
                    walk(c)

        walk(q)
        return out

    def _apply_highlight(self, page: DataFrame, req: SearchRequest):
        """Add <field>_fragments array columns to the (tiny) page — the
        LoadAndHighlightFields analogue (ref: index_impl.go:659-714)."""
        hl = req.highlight
        if hl is None:
            return page, []
        fields = (
            list(hl.fields)
            or self._query_fields(req.query)
            or [self.default_field()]
        )
        fields = [f for f in fields if f in page.columns]
        pre, post = hl.tags()
        escape = hl.escape_content()

        def make_udf(analyzer, terms):
            @F.pandas_udf(T.ArrayType(T.StringType()))
            def hl_udf(content: pd.Series) -> pd.Series:
                return content.map(
                    lambda c: highlight_value(
                        c,
                        analyzer,
                        terms,
                        hl.fragment_size,
                        hl.max_fragments,
                        pre,
                        post,
                        escape,
                    )
                )

            return hl_udf

        extra = []
        for fld in fields:
            terms = self._query_terms(req.query, fld)
            analyzer = get_analyzer(self._analyzer_for(fld, None))
            col = f"{fld}_fragments"
            page = page.withColumn(
                col, make_udf(analyzer, terms)(F.col(fld))
            )
            extra.append(col)
        return page, extra

    def _sort_key_col(self, spec: dict, df: DataFrame) -> Column:
        """Sort-spec -> key column (ref: search/sort.go SortField/
        SortScore/SortDocID). Multi-valued (array) fields pick their
        min/max element per `mode` (sort.go SortFieldMode)."""
        if spec["by"] == "score":
            return F.col("score")
        if spec["by"] == "id":
            return F.col("_id")
        if spec["by"] == "geo_distance":  # ref: search/sort.go SortGeoDistance
            from . import geo

            lat, lon = geo.parse_point(spec["location"])
            name = spec["field"]
            return geo.haversine_m(
                F.col(f"{name}.lat"), F.col(f"{name}.lon"), lat, lon
            )
        name = spec["field"]
        col = F.col(name)
        try:
            dt = df.schema[name].dataType
        except Exception:
            dt = None
        if isinstance(dt, T.ArrayType):
            col = (
                F.array_max(col)
                if spec.get("mode") == "max"
                else F.array_min(col)
            )
        return col

    LOCATIONS_TYPE = T.MapType(
        T.StringType(),
        T.MapType(
            T.StringType(),
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pos", T.IntegerType()),
                        T.StructField("start", T.IntegerType()),
                        T.StructField("end", T.IntegerType()),
                        T.StructField(
                            "array_positions", T.ArrayType(T.LongType())
                        ),
                    ]
                )
            ),
        ),
    )

    def _apply_locations(self, page: DataFrame, req: SearchRequest):
        """Add a `locations` column: field -> term -> [{pos, start, end,
        array_positions}] (ref: search/search.go:146-176 Locations,
        employee suite expectations). Like the reference, offsets are
        BYTE offsets into the field value; positions restart per array
        element with array_positions identifying the element. Re-derived
        by analyzing only the k page rows (term vectors stay columnar)."""
        fields = [
            f for f in self._query_fields(req.query) or [self.default_field()]
            if f in page.columns
        ]
        if not fields:
            return page, []
        terms_by_field = {
            f: self._query_terms(req.query, f) for f in fields
        }
        analyzers = {
            f: get_analyzer(self._analyzer_for(f, None)) for f in fields
        }

        def locate_value(analyzer, terms, value):
            def one(text, apos):
                out = {}
                if not isinstance(text, str):
                    return out
                # char->byte offset map only where needed
                for t in analyzer.analyze(text):
                    if t[0] in terms:
                        start_b = len(text[: t[2]].encode("utf-8"))
                        end_b = start_b + len(
                            text[t[2] : t[3]].encode("utf-8")
                        )
                        out.setdefault(t[0], []).append(
                            {
                                "pos": t[1],
                                "start": start_b,
                                "end": end_b,
                                "array_positions": apos,
                            }
                        )
                return out

            merged: dict = {}
            if isinstance(value, str):
                merged = one(value, None)
            elif value is not None:
                for i, el in enumerate(value):
                    for term, locs in one(el, [i]).items():
                        merged.setdefault(term, []).extend(locs)
            return merged or None

        @F.pandas_udf(self.LOCATIONS_TYPE)
        def locations_udf(*cols: pd.Series) -> pd.Series:
            out = []
            for row in zip(*cols):
                by_field = {}
                for f, v in zip(fields, row):
                    got = locate_value(analyzers[f], terms_by_field[f], v)
                    if got:
                        by_field[f] = got
                out.append(by_field or None)
            return pd.Series(out)

        page = page.withColumn(
            "locations", locations_udf(*[F.col(f"`{f}`") for f in fields])
        )
        return page, ["locations"]

    def _term_expl(self, E, fld, t, doc_id, tf, length, idf, df, n, b, qn):
        if self.similarity == scoring.TFIDF:
            return E.term_explanation(
                fld, t, str(doc_id), tf, length, idf, df, n, b, qn
            )
        return E.bm25_term_explanation(
            fld, t, str(doc_id), tf, length, idf, df, n, b,
            self.index.avg_len(fld),
        )

    # query types scored by the constant scorer — explained like the
    # reference's ConstantScorer (scorer_constant.go:74-126)
    _CONSTANT_EXPLAIN_TYPES = (
        Q.NumericRangeQuery,
        Q.DateRangeQuery,
        Q.BoolFieldQuery,
        Q.DocIDQuery,
        Q.IPRangeQuery,
        Q.GeoShapeQuery,
        Q.GeoDistanceQuery,
        Q.GeoBoundingBoxQuery,
        Q.GeoPolygonQuery,
        Q.MatchAllQuery,
    )

    def explain(self, q: Q.Query, doc_id: str) -> Optional[dict]:
        """Per-hit score explanation tree (ref: SearchRequest.Explain ->
        DocumentMatch.Expl, scorer_term.go:117-170,
        scorer_constant.go:74-126). Covers term-leaf queries (term /
        match / conjunction / disjunction of terms) in TF-IDF and BM25
        modes, (match_)phrase / multi_phrase, dictionary-expansion
        queries (prefix / wildcard / regexp / fuzzy / term_range), and
        every constant-scored type (numeric/date range, bool_field,
        docid, ip_range, geo, geoshape, match_all) — the same universal
        coverage as the reference's scorers. Driver-side: one tiny
        posting fetch for one doc, like the reference's
        per-DocumentMatch computation."""
        from . import explain as E

        if isinstance(q, (Q.MatchPhraseQuery, Q.PhraseQuery)):
            return self._explain_phrase(q, doc_id)
        if isinstance(
            q,
            (
                Q.PrefixQuery,
                Q.WildcardQuery,
                Q.RegexpQuery,
                Q.FuzzyQuery,
                Q.TermRangeQuery,
            ),
        ):
            return self._explain_multi_term(q, doc_id)
        if isinstance(q, Q.FilterQuery):
            # doc must pass the filter predicate; the score (and thus
            # the explanation) is entirely the child's
            # (ref: searcher/search_filter.go — filter never scores)
            keep = (
                self.index.docs.where(F.expr(q.predicate))
                .where(F.col("_id") == str(doc_id))
                .select("docid")
                .collect()
            )
            if not keep:
                return None
            return self.explain(q.child, doc_id)
        if isinstance(q, self._CONSTANT_EXPLAIN_TYPES):
            return self._explain_constant(q, doc_id)
        cand = self._wand_candidate(q)
        if cand is None:
            raise NotImplementedError(
                f"explain not supported for {type(q).__name__}"
            )
        fld, term_boosts, conjunctive, apply_qn = cand
        doc = (
            self.index.docs.where(F.col("_id") == str(doc_id))
            .select("docid")
            .collect()
        )
        if not doc:
            return None
        docid = doc[0]["docid"]
        stats = self.index.term_stats(fld, [t for t, _ in term_boosts])
        present = [(t, b) for t, b in term_boosts if t in stats]
        if not present:
            return None
        n = self.index.doc_count
        term_idf = {
            t: scoring.idf(self.similarity, n, stats[t][0])
            for t, _ in present
        }
        weight = sum(
            scoring.term_weight(self.similarity, b, term_idf[t])
            for t, b in present
        )
        qn = None
        if (
            apply_qn
            and self.similarity == scoring.TFIDF
            and weight > 0
        ):
            qn = 1.0 / math.sqrt(weight)
        rows = (
            self.index.decoded(fld, [t for t, _ in present])
            .where(F.col("docid") == docid)
            .select("term", "tf", "length")
            .collect()
        )
        by_term = {r["term"]: (int(r["tf"]), int(r["length"])) for r in rows}
        children = []
        for t, b in present:
            if t not in by_term:
                continue
            tf, length = by_term[t]
            children.append(
                self._term_expl(
                    E, fld, t, doc_id, tf, length, term_idf[t],
                    stats[t][0], n, b, qn,
                )
            )
        if not children or (conjunctive and len(children) < len(term_boosts)):
            return None  # doc does not match the (conjunctive) query
        if len(term_boosts) == 1 and isinstance(q, Q.TermQuery):
            return children[0]
        if conjunctive:
            return E.sum_explanation(str(doc_id), children)
        if self.similarity != scoring.TFIDF:
            return E.sum_explanation(str(doc_id), children)  # bm25: no coord
        return E.coord_explanation(
            str(doc_id), children, len(children), len(term_boosts)
        )

    def _explain_phrase(self, q, doc_id: str) -> Optional[dict]:
        """Phrase explanation: the conjunction-of-slots score tree,
        emitted only when a position path exists (shares
        _phrase_path_exists with the scorer, so explain == score)."""
        from . import explain as E

        fld = q.field or self.default_field()
        b = q.boost
        if isinstance(q, Q.MatchPhraseQuery):
            analyzer = get_analyzer(self._analyzer_for(fld, q.analyzer))
            tokens = analyzer.analyze(q.text)
            slots = [((t[0],), t[1]) for t in tokens]
        else:
            slots = [
                (
                    tuple(t) if isinstance(t, (list, tuple)) else (t,),
                    i + 1,
                )
                for i, t in enumerate(q.terms)
            ]
        if not slots:
            return None
        slots = [(tuple(dict.fromkeys(a)), p) for a, p in slots]
        all_terms = list(dict.fromkeys(t for a, _ in slots for t in a))
        stats = self.index.term_stats(fld, all_terms)
        if any(not any(t in stats for t in a) for a, _ in slots):
            return None
        present = [t for t in all_terms if t in stats]
        n = self.index.doc_count
        term_idf = {
            t: scoring.idf(self.similarity, n, stats[t][0]) for t in present
        }
        weight = sum(
            scoring.term_weight(self.similarity, b, i)
            for i in term_idf.values()
        )
        qn = None
        if self.similarity == scoring.TFIDF and weight > 0:
            qn = 1.0 / math.sqrt(weight)
        doc = (
            self.index.docs.where(F.col("_id") == str(doc_id))
            .select("docid")
            .collect()
        )
        if not doc:
            return None
        docid = doc[0]["docid"]
        rows = (
            self.index.decoded(fld, present, need_positions=True)
            .where(F.col("docid") == docid)
            .select("term", "tf", "length", "positions")
            .collect()
        )
        by_term = {
            r["term"]: (int(r["tf"]), int(r["length"]), list(r["positions"]))
            for r in rows
        }
        deltas = [slots[i][1] - slots[i - 1][1] for i in range(1, len(slots))]
        pos_by_slot = {}
        for i, (alts, _p) in enumerate(slots):
            s = set()
            for t in alts:
                if t in by_term:
                    s.update(by_term[t][2])
            if not s:
                return None
            pos_by_slot[i] = s
        if not _phrase_path_exists(
            pos_by_slot, deltas, len(slots), q.slop
        ):
            return None
        slot_children = []
        for alts, _p in slots:
            alt_children = [
                self._term_expl(
                    E, fld, t, doc_id, by_term[t][0], by_term[t][1],
                    term_idf[t], stats[t][0], n, b, qn,
                )
                for t in alts
                if t in by_term
            ]
            if len(alts) == 1:
                slot_children.append(alt_children[0])
            elif self.similarity == scoring.TFIDF:
                slot_children.append(
                    E.coord_explanation(
                        str(doc_id), alt_children,
                        len(alt_children), len(alts),
                    )
                )
            else:
                slot_children.append(
                    E.sum_explanation(str(doc_id), alt_children)
                )
        if len(slot_children) == 1:
            return slot_children[0]
        return E.sum_explanation(str(doc_id), slot_children)

    def _explain_multi_term(self, q, doc_id: str) -> Optional[dict]:
        """Expansion-query explanation (prefix / wildcard / regexp /
        fuzzy / term_range): one full term explanation per expanded term
        present in the doc, combined exactly like _plan_multi_term
        scores — TF-IDF applies the disjunction coord over the FULL
        expansion size (scorer_disjunction.go:65-66), BM25 sums. Shares
        _expansion_predicate with the planner, so explanation == score
        by construction."""
        from . import explain as E

        fld = q.field or self.default_field()
        pred = self._expansion_predicate(q)
        slice_df = self.index.expansion(fld, pred)
        n_terms = int(slice_df.count())
        if n_terms == 0:
            return None
        doc = (
            self.index.docs.where(F.col("_id") == str(doc_id))
            .select("docid")
            .collect()
        )
        if not doc:
            return None
        docid = doc[0]["docid"]
        blocks = self.index.postings.where(
            (F.col("field") == fld) & pred
        )
        rows = (
            self.index.decoded(fld, [], blocks=blocks)
            .where(F.col("docid") == docid)
            .join(F.broadcast(slice_df), "term")
            .select("term", "tf", "length", "df")
            .collect()
        )
        if not rows:
            return None
        n = self.index.doc_count
        # the expansion disjunction computes its own queryNorm over the
        # FULL term slice (search_disjunction_slice.go:104-116) — must
        # mirror matches()/_plan_multi_term so explanation == score
        qn = None
        if self.similarity == scoring.TFIDF:
            wc = F.lit(q.boost) * self._idf_col(F.col("df"))
            w = slice_df.agg(F.sum(wc * wc).alias("w")).collect()[0]["w"]
            if w and w > 0:
                qn = 1.0 / math.sqrt(float(w))
        children = []
        for r in sorted(rows, key=lambda r: r["term"]):
            idf = scoring.idf(self.similarity, n, int(r["df"]))
            children.append(
                self._term_expl(
                    E, fld, r["term"], doc_id, int(r["tf"]),
                    int(r["length"]), idf, int(r["df"]), n, q.boost,
                    qn,
                )
            )
        if self.similarity == scoring.TFIDF:
            return E.coord_explanation(
                str(doc_id), children, len(children), n_terms
            )
        return E.sum_explanation(str(doc_id), children)

    def _explain_constant(self, q, doc_id: str) -> Optional[dict]:
        """Constant-scorer explanation (ref: scorer_constant.go:74-126):
        the reference explains constant = 1.0 times the query weight
        (boost x queryNorm; 1 for a bare leaf). Matching runs the real
        plan restricted to this doc, so presence/absence agrees with
        search() for every constant-scored type (ranges, docid,
        ip_range, geo, geoshape, match_all)."""
        from . import explain as E

        doc = (
            self.index.docs.where(F.col("_id") == str(doc_id))
            .select("docid")
            .collect()
        )
        if not doc:
            return None
        docid = doc[0]["docid"]
        hit = (
            self.matches(q)
            .where(F.col("docid") == docid)
            .select("score")
            .collect()
        )
        if not hit:
            return None
        return E.constant_explanation(float(hit[0]["score"]), q.boost)

    def search(self, req: SearchRequest) -> SearchResult:
        if req.similarity != self.similarity:
            # never mutate shared planner state — two concurrent requests
            # with different similarities must not race; plan through a
            # per-request clone instead
            return Searcher(
                self.index,
                req.similarity,
                self.wand_min_postings,
                self.knn_lsh_min_docs,
                self.knn_lsh_planes,
                self.knn_lsh_probe,
                self.knn_lsh_tables,
            ).search(req)
        scored = None
        score_first_sort = (
            len(req.sort) > 0
            and req.sort[0] == "-_score"
            and all(s in ("-_score", "_id", "+_id") for s in req.sort)
        )
        if (
            not req.facets
            and not req.with_total
            and not req.knn
            and req.search_after is None
            and score_first_sort
        ):
            scored = self._wand_scored(req.query, req.from_ + req.size)
        if scored is None:
            scored = self.matches(req.query)
        for kr in req.knn:
            # top-k by the field's similarity metric over the stored
            # vector column, then disjunction-merge with the query hits
            # (score sum — ref: search_knn.go:165 knn hits merged as a
            # disjunction). Metric comes from the vector FieldMapping
            # (ref: mapping/field.go:74-79, default l2_norm per
            # util/knn.go:31); an unmapped ad-hoc vector column keeps
            # the engine's historical normalized-cosine scoring.
            # Above knn_lsh_min_docs, candidates come from the
            # multi-probe LSH buckets instead of a full corpus scan
            # (the wand_min_postings cost-model pattern: the bucket
            # UDF pass only pays off once the corpus dwarfs it).
            # The hyperplane-LSH prefilter is an ANGULAR family, so it
            # applies to cosine always, and to dot_product only when
            # the FieldMapping declares unit_norm=True (dot == cosine
            # there); non-unit dot_product and l2_norm take the exact
            # scan. At cluster scale, unit-normalize the embeddings and
            # set unit_norm to get the bucket route.
            from .mapping import (
                COSINE,
                COSINE_SIMILARITY,
                EUCLIDEAN_DISTANCE,
                validate_vector_field,
            )
            from .ops.similarity import (
                LSH_N_PLANES,
                LSH_N_TABLES,
                cosine_to_query,
                dot_to_query,
                l2sq_to_query,
                lsh_candidates,
                lsh_candidates_tables,
            )

            metric = COSINE
            unit_norm = False
            fm = (
                self.index.mapping.fields.get(kr.field)
                if self.index.mapping is not None
                else None
            )
            if fm is not None and fm.type == "vector":
                metric = validate_vector_field(fm).similarity
                unit_norm = bool(fm.unit_norm)

            # LSH is angular: sound for cosine always, for dot_product
            # only when the field is declared unit-norm (then dot ==
            # cosine). Non-unit dot_product (MIPS) and l2_norm take the
            # exact scan — a never-probed bucket can hold the true
            # max-inner-product / nearest-l2 neighbor.
            lsh_safe = metric == COSINE or (
                metric == COSINE_SIMILARITY and unit_norm
            )
            cand = self.index.docs
            if lsh_safe and self.index.doc_count >= self.knn_lsh_min_docs:
                if self.knn_lsh_tables > 1:
                    pre = f"{kr.field}__buckets"
                    src = cand
                    if (
                        pre in cand.columns
                        and self.knn_lsh_tables == LSH_N_TABLES
                        and self.knn_lsh_planes == LSH_N_PLANES
                    ):
                        # vector-mapped field: buckets were persisted
                        # at build time — candidate selection is a
                        # pure-JVM bitcount filter, no per-query
                        # matmul over the corpus. (Drop any unrelated
                        # user column named "buckets" first; the
                        # reserved <field>__buckets wins.)
                        if "buckets" in cand.columns:
                            src = cand.drop("buckets")
                        src = src.withColumnRenamed(pre, "buckets")
                    cand = lsh_candidates_tables(
                        src,
                        kr.vector,
                        n_tables=self.knn_lsh_tables,
                        n_planes=self.knn_lsh_planes,
                        probe_hamming=self.knn_lsh_probe,
                        vec_col=kr.field,
                    )
                else:
                    cand = lsh_candidates(
                        cand,
                        kr.vector,
                        n_planes=self.knn_lsh_planes,
                        probe_hamming=self.knn_lsh_probe,
                        vec_col=kr.field,
                    )
            if metric == EUCLIDEAN_DISTANCE:
                # FAISS L2 reports squared distance; the reference KNN
                # scorer inverts it into a similarity score
                # (scorer_knn.go:71-75: score = 1/distance, +Inf on an
                # exact match like Go float division)
                sim_col = F.when(
                    F.col("l2sq") == 0.0, F.lit(float("inf"))
                ).otherwise(F.lit(1.0) / F.col("l2sq"))
                knn_scored = l2sq_to_query(cand, kr.vector, kr.field)
            elif metric == COSINE_SIMILARITY:
                sim_col = F.col("dot")
                knn_scored = dot_to_query(cand, kr.vector, kr.field)
            else:
                sim_col = F.col("cos")
                knn_scored = cosine_to_query(cand, kr.vector, kr.field)
            knn_scored = (
                knn_scored.select(
                    "docid",
                    (sim_col * F.lit(kr.boost)).alias("score"),
                )
                .orderBy(F.desc("score"), "docid")
                .limit(kr.k)
            )
            scored = (
                scored.unionByName(knn_scored)
                .groupBy("docid")
                .agg(F.sum("score").alias("score"))
            )
        total = scored.count() if req.with_total else None
        hits = scored.join(self.index.docs, "docid")
        if req.facets:
            # the page job and each facet job all consume the matched
            # set — cache it instead of recomputing per job
            hits = hits.persist()

        specs = _parse_sort_specs(req.sort)
        key_cols = [self._sort_key_col(sp, hits) for sp in specs]
        sort_cols = [
            _order_col(c, sp["desc"], sp["missing"])
            for c, sp in zip(key_cols, specs)
        ]

        out_cols = ["docid", "_id", F.col("score").alias("score")] + [
            c for c in req.fields
        ]
        if req.search_after is not None or req.search_before is not None:
            # keyset paging (ref: collector/topn.go:88-109): keep rows
            # strictly after/before the tuple in sort order —
            # lexicographic (c1 > a1) OR (c1 = a1 AND c2 > a2) OR ...,
            # with > flipped per-column for descending sorts. Unlike
            # offset paging this is a pushed-down predicate: deep pages
            # stay O(k). search_after/before imply from=0
            # (ref: search_no_knn.go:48-85, index_impl.go:448-461).
            if req.search_before is not None:
                # reverse-execute then restore order, like the reference
                pred = _keyset_pred(
                    specs, key_cols, req.search_before, flip=True
                )
                flipped = [
                    _order_col(
                        c,
                        not sp["desc"],
                        "first" if sp["missing"] == "last" else "last",
                    )
                    for c, sp in zip(key_cols, specs)
                ]
                page = hits.where(pred).orderBy(*flipped).limit(req.size)
                page = page.orderBy(*sort_cols)
            else:
                pred = _keyset_pred(specs, key_cols, req.search_after)
                page = hits.where(pred).orderBy(*sort_cols).limit(req.size)
            page, hl_cols = self._apply_highlight(page, req)
            if req.include_locations:
                page, loc_cols = self._apply_locations(page, req)
                hl_cols = hl_cols + loc_cols
            page = page.select(*out_cols, *hl_cols)
            page, facets = self._finish_faceted(hits, page, req)
            return SearchResult(hits=page, facets=facets, total=total)
        # global top-k: TakeOrderedAndProject (per-partition top-k + driver
        # merge — the collector/MultiSearch-merge analogue)
        page = hits.orderBy(*sort_cols).limit(req.from_ + req.size)
        if req.from_ > 0:
            # offset paging over the tiny top-(from+size) set
            from pyspark.sql import Window

            page = (
                page.withColumn(
                    "_rn", F.row_number().over(Window.orderBy(*sort_cols))
                )
                .where(F.col("_rn") > req.from_)
                .drop("_rn")
            )
        page, hl_cols = self._apply_highlight(page, req)
        if req.include_locations:
            page, loc_cols = self._apply_locations(page, req)
            hl_cols = hl_cols + loc_cols
        page = page.select(*out_cols, *hl_cols)

        page, facets = self._finish_faceted(hits, page, req)
        return SearchResult(hits=page, facets=facets, total=total)

    def _finish_faceted(self, hits, page, req):
        """Run the facet jobs (if any) and release the persisted match
        set. The faceted path persist()s `hits` so the page job and each
        facet job reuse one materialization; both outputs are small and
        bounded (top-k page, size-limited facets), so they are collected
        eagerly here and `hits` unpersisted in a finally — otherwise
        every faceted search leaks a cached dataset for the lifetime of
        the SparkSession."""
        if not req.facets:
            return page, {}
        facets = {}
        try:
            for name, freq in req.facets.items():
                facets[name] = _eager(self._facet(hits, freq))
            page = _eager(page)
        finally:
            hits.unpersist()
        return page, facets

    def _facet(self, hits: DataFrame, freq: FacetRequest) -> DataFrame:
        """Terms / numeric-range / date-range facets
        (ref: facet/facet_builder_{terms,numeric,datetime}.go).

        A doc increments EVERY matching range, not just the first — the
        reference's UpdateVisitor loops all ranges
        (facet_builder_numeric.go:41-49); overlapping ranges therefore
        multi-count. Implemented as an array of matching range names +
        explode (one shuffle, no per-range job). Array-typed terms-facet
        fields count each element (docvalues are per-term)."""
        if freq.numeric_ranges or freq.date_ranges:
            if freq.numeric_ranges:
                col = F.col(freq.field).cast("double")
                conds = []
                for r in freq.numeric_ranges:
                    cond = F.lit(True)
                    if r.get("min") is not None:
                        cond = cond & (col >= r["min"])
                    if r.get("max") is not None:
                        cond = cond & (col < r["max"])
                    conds.append((cond, r["name"]))
            else:
                col = F.col(freq.field).cast("timestamp")
                conds = []
                for r in freq.date_ranges:
                    cond = F.lit(True)
                    if r.get("start") is not None:
                        cond = cond & (
                            col >= F.lit(r["start"]).cast("timestamp")
                        )
                    if r.get("end") is not None:
                        cond = cond & (col < F.lit(r["end"]).cast("timestamp"))
                    conds.append((cond, r["name"]))
            matched = F.array(
                *[F.when(c, F.lit(name)) for c, name in conds]
            )
            return (
                hits.select(
                    F.explode(
                        F.filter(matched, lambda x: x.isNotNull())
                    ).alias("range")
                )
                .groupBy("range")
                .agg(F.count("*").alias("count"))
                .orderBy(F.desc("count"), "range")
            )
        term_col = F.col(freq.field)
        try:
            is_array = isinstance(
                hits.schema[freq.field].dataType, T.ArrayType
            )
        except Exception:
            is_array = False
        if is_array:
            src = hits.select(F.explode(term_col).alias("term"))
        else:
            src = hits.select(term_col.alias("term"))
        return (
            src.groupBy("term")
            .agg(F.count("*").alias("count"))
            .orderBy(F.desc("count"), "term")
            .limit(freq.size)
        )


def _eager(df: DataFrame) -> DataFrame:
    """Materialize a small bounded DataFrame on the driver and rewrap
    it, so upstream cached inputs can be unpersisted without the result
    silently recomputing later."""
    return df.sparkSession.createDataFrame(df.collect(), df.schema)


def _parse_sort_specs(sort: Sequence) -> List[dict]:
    """Normalize sort entries — strings ("-name", "_score") or dicts
    ({"by": "field", "field": ..., "desc": ..., "missing": "first",
    "mode": "min"}) — into one spec shape (ref: search/sort.go:
    ParseSearchSortObj/ParseSearchSortString, sort.go:129-131,310-343)."""
    specs = []
    for s in sort:
        if isinstance(s, str):
            desc = s.startswith("-")
            name = s.lstrip("+-")
            by = (
                "score"
                if name == "_score"
                else "id"
                if name == "_id"
                else "field"
            )
            specs.append(
                {
                    "by": by,
                    "field": name,
                    "desc": desc,
                    "missing": "last",
                    "mode": "min",
                }
            )
        else:
            d = dict(s)
            spec = {
                "by": d.get("by", "field"),
                "field": d.get("field"),
                "desc": bool(d.get("desc", False)),
                "missing": d.get("missing", "last"),
                "mode": d.get("mode", "min"),
            }
            if d.get("by") == "geo_distance":  # ref: search/sort.go:636
                spec["location"] = d.get("location")
                spec["unit"] = d.get("unit", "m")
            specs.append(spec)
    return specs


def _order_col(col: Column, desc: bool, missing: str) -> Column:
    """Direction + missing-value placement (ref: sort.go missing
    first/last semantics — default last in either direction)."""
    if desc:
        return (
            col.desc_nulls_first() if missing == "first" else col.desc_nulls_last()
        )
    return col.asc_nulls_first() if missing == "first" else col.asc_nulls_last()


def _keyset_pred(specs, key_cols, values, flip: bool = False) -> Column:
    """Lexicographic strictly-after predicate over the sort tuple; with
    flip=True, strictly-before (reverse execution for SearchBefore,
    ref: index_impl.go:448-461). NULL sort keys participate per their
    missing-first/last placement: a missing-last row comes after every
    non-null anchor, so `after` must keep it."""
    pred = None
    eq_prefix = None
    for spec, col, v in zip(specs, key_cols, values):
        if spec["by"] == "score" and isinstance(v, str):
            v = float(v)  # the wire format carries sort keys as strings
        lit = F.lit(v)
        desc = spec["desc"] != flip
        nxt = (col < lit) if desc else (col > lit)
        # nulls land after the anchor when they sort to the end of the
        # effective iteration order (flip reverses that order)
        nulls_after = (spec["missing"] == "last") != flip
        if nulls_after:
            nxt = nxt | col.isNull()
        clause = nxt if eq_prefix is None else eq_prefix & nxt
        pred = clause if pred is None else pred | clause
        eq_here = col == lit
        eq_prefix = eq_here if eq_prefix is None else eq_prefix & eq_here
    return pred


def _wildcard_to_regex(w: str) -> str:
    """ref: query/wildcard.go:24-44."""
    out = []
    for ch in w:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch in ".+()[]{}^$|\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + "$"
