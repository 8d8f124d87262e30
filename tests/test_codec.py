"""Delta+varbyte codec tests — byte-exact golden vectors from the reference
(``positional/Team3CompressorTest.java``) plus roundtrip properties."""

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from searchengine_spark.codec import decode, decode_raw, encode, encode_raw


class TestGoldenVectors:
    def test_ones(self):
        # Team3CompressorTest.java:25-29
        assert encode([1, 2, 3, 4, 5, 6]) == bytes([1, 1, 1, 1, 1, 1])

    def test_multi_byte_gaps(self):
        # Team3CompressorTest.java:33-38
        assert encode([128, 384, 896, 1920, 3968]) == bytes.fromhex(
            "8100820084008800" + "9000"
        )

    def test_int_max(self):
        # Team3CompressorTest.java:41-45
        assert encode([2147483647]) == bytes.fromhex("87ffffff7f")

    def test_empty(self):
        assert encode([]) == b""
        assert decode(b"").tolist() == []

    def test_partial_decode(self):
        # Team3CompressorTest.java:83-91: bytes 01*6, offset 4 len 2 -> [1,2]
        data = encode([1, 2, 3, 4, 5, 6])
        assert decode(data, 4, 2).tolist() == [1, 2]

    def test_unsorted_raises(self):
        with pytest.raises(ValueError):
            encode([5, 3])

    def test_zero_first(self):
        assert encode([0, 0, 0]) == bytes([0, 0, 0])
        assert decode(bytes([0, 0, 0])).tolist() == [0, 0, 0]


@given(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=300).map(sorted)
)
def test_roundtrip(values):
    assert decode(encode(values)).tolist() == values


@given(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=64).map(sorted)
)
def test_raw_roundtrip(values):
    assert decode_raw(encode_raw(values)).tolist() == values


def test_compression_ratio_floor():
    # BASELINE.md: naive bytes > 1.5x compressed bytes on dense posting lists
    ids = np.cumsum(np.random.default_rng(42).integers(1, 30, size=10_000))
    assert len(encode_raw(ids)) > 1.5 * len(encode(ids))
