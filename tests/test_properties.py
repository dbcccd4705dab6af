"""Property-based tests (hypothesis) — the analogue of the reference's
smat fuzz harness (/root/reference/analysis/lang/pl/stempel/fuzz.go) for
the pieces most exposed to adversarial input: the varint/delta codecs and
the analysis chains."""

import numpy as np
from hypothesis import given, settings, strategies as st

from bleve_spark import codec
from bleve_spark.analysis import get_analyzer
from bleve_spark.analysis.tokenizers import (
    letter_tokenize,
    unicode_tokenize,
    whitespace_tokenize,
)

u64s = st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200)
sorted_u64s = u64s.map(sorted)
texts = st.text(max_size=400)


@settings(max_examples=200, deadline=None)
@given(u64s)
def test_varint_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert list(codec.varint_decode(codec.varint_encode(arr))) == vals


@settings(max_examples=200, deadline=None)
@given(sorted_u64s)
def test_delta_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    got = [int(x) for x in codec.delta_decode(codec.delta_encode(arr))]
    assert got == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=1, max_value=2**31), max_size=20
        ).map(sorted),
        max_size=20,
    )
)
def test_positions_roundtrip(pos_lists):
    buf = codec.encode_positions(pos_lists)
    got = codec.decode_positions(buf, len(pos_lists))
    assert [list(map(int, g)) for g in got] == pos_lists


@settings(max_examples=150, deadline=None)
@given(texts)
def test_tokenizer_invariants(text):
    for tok in (unicode_tokenize, letter_tokenize, whitespace_tokenize):
        tokens = tok(text)
        prev_pos, prev_end = 0, 0
        for term, pos, start, end in tokens:
            assert pos == prev_pos + 1  # 1-based, dense
            assert 0 <= start < end <= len(text)
            assert start >= prev_end  # non-overlapping, ordered
            assert text[start:end] == term
            prev_pos, prev_end = pos, end


def test_docid_assignment_parallelism_independent(spark):
    """docid must be a pure function of the data — identical across
    partition counts (the north rule's rank-identity requirement)."""
    from bleve_spark.build import assign_docids
    from pyspark.sql import functions as F

    rows = [(f"id{i:04d}", f"text {i}") for i in range(500)]
    maps = []
    for parts in (2, 7, 32):
        df = spark.createDataFrame(rows, ["_id", "body"]).repartition(parts)
        got = assign_docids(df, F.col("_id"), n_partitions=parts)
        maps.append(
            {r["_id"]: r["docid"] for r in got.select("_id", "docid").collect()}
        )
    assert maps[0] == maps[1] == maps[2]
    # dense: 0..n-1
    assert sorted(maps[0].values()) == list(range(500))


@settings(max_examples=150, deadline=None)
@given(texts)
def test_analyzer_termfreq_consistency(text):
    """The fused fast paths must agree with the generic chain — the
    invariant the build relies on (analysis/__init__.py)."""
    for name in ("standard", "simple", "code", "whitespace_lower", "keyword"):
        a = get_analyzer(name)
        fast = a.fast_termfreq
        try:
            a.fast_termfreq = None
            generic = a.termfreq(text)
        finally:
            a.fast_termfreq = fast
        assert a.termfreq(text) == generic, name


@settings(max_examples=100, deadline=None)
@given(texts)
def test_analyzer_positions_match_length(text):
    a = get_analyzer("standard")
    length, freqs = a.termfreq(text)
    npos = sum(len(p) for p in freqs.values())
    assert npos == length  # stop-filtered tokens drop entirely
    for positions in freqs.values():
        assert positions == sorted(positions)
        assert all(p >= 1 for p in positions)
