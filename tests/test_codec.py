import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bleve_spark import codec


def test_varint_roundtrip_basic():
    for arr in (
        [0],
        [1, 5, 127, 128, 300, 2**31, 2**40, 2**63 - 1],
        list(range(0, 5000, 7)),
    ):
        a = np.array(arr, dtype=np.uint64)
        assert (codec.varint_decode(codec.varint_encode(a)) == a).all()


def test_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert len(codec.varint_decode(b"")) == 0
    assert codec.encode_positions([]) == b""


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_roundtrip_prop(vals):
    a = np.array(vals, dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(a)) == a).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300
    )
)
def test_delta_roundtrip_prop(vals):
    a = np.unique(np.array(vals, dtype=np.uint64))
    assert (codec.delta_decode(codec.delta_encode(a)) == a).all()


def test_positions_roundtrip():
    pls = [[1, 5, 9], [2], [], [3, 4, 5, 6, 1000]]
    dec = codec.decode_positions(codec.encode_positions(pls), len(pls))
    assert [list(map(int, x)) for x in dec] == pls
