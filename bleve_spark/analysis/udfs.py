"""Arrow-batched pandas UDF wrappers for the analysis chains.

The build path uses ``termfreq_udf`` which does per-doc term-frequency
aggregation *inside* the UDF — the Spark-side analogue of the reference's
``TokenFrequency`` map-side step (/root/reference/analysis/freq.go:21-70,
document/field_text.go:77-101). That keeps the (doc, term) explosion
map-local: the only shuffle in the build is the postings groupBy.
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import get_analyzer

# position offset between array-field elements; any realistic slop is
# smaller, so cross-element phrase chains can never close
ARRAY_POSITION_STRIDE = 1 << 20

TOKEN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("position", T.IntegerType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)

TERMFREQ_TYPE = T.StructType(
    [
        T.StructField("length", T.IntegerType()),
        T.StructField(
            "freqs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType()),
                        T.StructField("tf", T.IntegerType()),
                        T.StructField("positions", T.ArrayType(T.IntegerType())),
                    ]
                )
            ),
        ),
    ]
)


def tokens_udf(analyzer_name: str):
    """Column function: content -> array<struct<term,position,start,end>>."""

    def analyze_batch(s: pd.Series) -> pd.Series:
        analyzer = get_analyzer(analyzer_name)
        return s.map(
            lambda text: [
                {"term": t[0], "position": t[1], "start": t[2], "end": t[3]}
                for t in analyzer.analyze(text)
            ]
        )

    return F.pandas_udf(analyze_batch, TOKEN_TYPE)


def term_frequencies(tokens: List) -> List[dict]:
    """tokens -> sorted [(term, tf, positions)] (ref: analysis/freq.go:21-70)."""
    freqs: dict = {}
    for t in tokens:
        entry = freqs.get(t[0])
        if entry is None:
            freqs[t[0]] = [t[1]]
        else:
            entry.append(t[1])
    return [
        {"term": term, "tf": len(positions), "positions": positions}
        for term, positions in sorted(freqs.items())
    ]


ANALYZED_ROW_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.LongType()),
        T.StructField("field", T.StringType()),
        T.StructField("length", T.IntegerType()),
        T.StructField("term", T.StringType()),  # NULL marks the norms row
        T.StructField("tf", T.IntegerType()),
        T.StructField("pos_enc", T.BinaryType()),
    ]
)


def make_analyzed_rows_fn(field_analyzers: list, compose_all_fields=None):
    """mapInPandas function: docs batches -> FLAT analyzed rows for all
    text fields in one pass.

    Output is all-scalar (string/int/bytes) — no nested Arrow structs —
    with positions delta+varint encoded per (doc, term) at the source.
    Posting-block assembly later just concatenates these byte streams.
    One extra row per (doc, field) with term=NULL carries the analyzed
    length for the norms table (no extra scan, no shuffle).

    field_analyzers: [(column_name, analyzer_name)] or
    [(column_name, analyzer_name, emitted_field_name)] — the 3-tuple form
    lets dotted-path fields ride through mapInPandas under shielded
    column names while postings keep the user-facing dotted field name.
    compose_all_fields: if set, also emit a `_all` composite field that
    merges those fields' term freqs per doc (tf summed, positions merged
    sorted, length summed — ref: document/field_composite.go:103-131).
    """
    import numpy as np

    from .. import codec

    def run(batches):
        from . import get_analyzer

        analyzers = [
            (fa[0], get_analyzer(fa[1]), fa[2] if len(fa) > 2 else fa[0])
            for fa in field_analyzers
        ]
        for pdf in batches:
            docids_in = pdf["docid"].to_numpy()
            out_docid = []
            out_field = []
            out_length = []
            out_term = []
            out_tf = []
            flat_vals = []  # [npos, p0, gaps...] per group, concatenated
            group_counts = []  # values per group (0 for marker rows)
            def emit_field(docid, fname, length, freqs):
                for term in sorted(freqs):
                    positions = freqs[term]
                    out_docid.append(docid)
                    out_field.append(fname)
                    out_length.append(length)
                    out_term.append(term)
                    out_tf.append(len(positions))
                    flat_vals.append(len(positions))
                    prev = 0
                    for p in positions:
                        flat_vals.append(p - prev)
                        prev = p
                    group_counts.append(len(positions) + 1)
                # norms marker row
                out_docid.append(docid)
                out_field.append(fname)
                out_length.append(length)
                out_term.append(None)
                out_tf.append(0)
                group_counts.append(0)

            all_accum = (
                {int(d): ({}, 0) for d in docids_in}
                if compose_all_fields
                else None
            )
            def analyze_value(analyzer, text):
                if isinstance(text, str):
                    return analyzer.termfreq(text)
                if text is None:
                    return analyzer.termfreq("")
                if isinstance(text, (list, tuple, np.ndarray)):
                    # array field: each element is its own Field instance
                    # sharing the name; token freqs merge, lengths sum.
                    # Element k's positions are offset by k*STRIDE — the
                    # stand-in for the reference's ArrayPositions equality
                    # check (search_phrase.go:414): position deltas across
                    # elements exceed any phrase slop, so phrases never
                    # span elements (ref: document/field.go:26-30,
                    # field_composite.go:118-123)
                    total_len, merged = 0, {}
                    for k, el in enumerate(text):
                        l, fr = analyzer.termfreq(
                            el
                            if isinstance(el, str)
                            else ("" if el is None else str(el))
                        )
                        total_len += l
                        off = k * ARRAY_POSITION_STRIDE
                        for t, ps in fr.items():
                            merged.setdefault(t, []).extend(
                                p + off for p in ps
                            )
                    return total_len, {
                        t: sorted(ps) for t, ps in merged.items()
                    }
                return analyzer.termfreq(str(text))

            for cname, analyzer, fname in analyzers:
                col = pdf[cname]
                in_all = compose_all_fields and fname in compose_all_fields
                for docid, text in zip(docids_in, col):
                    length, freqs = analyze_value(analyzer, text)
                    emit_field(docid, fname, length, freqs)
                    if in_all:
                        acc, alen = all_accum[int(docid)]
                        for term, positions in freqs.items():
                            acc.setdefault(term, []).extend(positions)
                        all_accum[int(docid)] = (acc, alen + length)
            if compose_all_fields:
                for docid in docids_in:
                    acc, alen = all_accum[int(docid)]
                    emit_field(
                        int(docid),
                        "_all",
                        alen,
                        {t: sorted(p) for t, p in acc.items()},
                    )
            buf, nbytes = codec.varint_encode_with_sizes(
                np.asarray(flat_vals, dtype=np.uint64)
            )
            byte_off = np.zeros(len(nbytes) + 1, dtype=np.int64)
            np.cumsum(nbytes, out=byte_off[1:])
            group_ends = np.cumsum(
                np.asarray(group_counts, dtype=np.int64)
            )
            group_starts = group_ends - np.asarray(group_counts, dtype=np.int64)
            pos_enc = [
                buf[byte_off[s] : byte_off[e]] if e > s else b""
                for s, e in zip(group_starts, group_ends)
            ]
            yield pd.DataFrame(
                {
                    "docid": np.asarray(out_docid, dtype=np.int64),
                    "field": out_field,
                    "length": np.asarray(out_length, dtype=np.int32),
                    "term": out_term,
                    "tf": np.asarray(out_tf, dtype=np.int32),
                    "pos_enc": pos_enc,
                }
            )

    return run


def termfreq_udf(analyzer_name: str):
    """Column function: content -> struct<length, freqs> (map-side agg)."""

    def analyze_freq_batch(s: pd.Series) -> pd.DataFrame:
        analyzer = get_analyzer(analyzer_name)
        lengths = []
        freqs = []
        for text in s:
            tokens = analyzer.analyze(text)
            lengths.append(len(tokens))
            freqs.append(term_frequencies(tokens))
        return pd.DataFrame({"length": lengths, "freqs": freqs})

    return F.pandas_udf(analyze_freq_batch, TERMFREQ_TYPE)
