"""Codec byte-golds ported verbatim from the reference tests
(pkg/compression/deltavarint/deltavarint_test.go:17-35,
pkg/compression/unary/unary_test.go:17-26,180-229) + roundtrip fuzz."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pulse_spark.compression.codecs import (
    delta_varint_decode,
    delta_varint_encode,
    unary_decode,
    unary_encode,
)


def test_delta_varint_golds():
    cases = [
        ([5], bytes([5])),
        ([1, 2, 3], bytes([1, 1, 1])),
        ([100, 102, 103], bytes([100, 2, 1])),
        ([300, 500, 590], bytes([0b10101100, 0b00000010, 0b11001000, 0b00000001, 0b01011010])),
        ([], b""),
    ]
    for values, exp in cases:
        assert delta_varint_encode(values) == exp, values
        assert delta_varint_decode(exp).tolist() == values


def test_unary_golds_min0():
    cases = [
        ([5], bytes([0b11111011])),
        ([1, 2, 3], bytes([0b10110111, 0b01111111])),
        ([9], bytes([0b11111111, 0b10111111])),
        ([], b""),
        ([12], bytes([0b11111111, 0b11110111])),  # TestDifferenSize gold
    ]
    for values, exp in cases:
        assert unary_encode(values, 0) == exp, values
        assert unary_decode(exp, 0).tolist() == values


def test_unary_gold_min1():
    # unary_test.go TestMiniumum: 9 with min=1 -> 8 ones + 0 + pad
    assert unary_encode([9], 1) == bytes([0b11111111, 0b01111111])
    assert unary_decode(bytes([0b11111111, 0b01111111]), 1).tolist() == [9]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=200))
def test_delta_varint_roundtrip(deltas):
    values = np.cumsum(np.array(deltas, dtype=np.uint64)).tolist()
    assert delta_varint_decode(delta_varint_encode(values)).tolist() == values


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=300), min_size=0, max_size=100))
def test_unary_roundtrip_min1(values):
    assert unary_decode(unary_encode(values, 1), 1).tolist() == values
