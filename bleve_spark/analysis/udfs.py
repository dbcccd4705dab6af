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
