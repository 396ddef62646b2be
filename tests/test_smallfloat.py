"""byte4 norm quantization: property tests vs the algorithm contract
(reference util/SmallFloat.java:103-157)."""

import numpy as np
from hypothesis import given, strategies as st

from lucene_spark.util.smallfloat import (
    LENGTH_TABLE_INT,
    byte4_to_int,
    encode_lengths,
    int_to_byte4,
)


def test_small_values_identity():
    # values below the free-value threshold are stored verbatim
    for i in range(0, 24):
        assert byte4_to_int(int_to_byte4(i)) == i


def test_table_strictly_increasing_and_full_range():
    assert LENGTH_TABLE_INT[0] == 0
    assert all(
        LENGTH_TABLE_INT[i] < LENGTH_TABLE_INT[i + 1] for i in range(255)
    )
    assert int_to_byte4(2**31 - 1) == 255


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_roundtrip_is_bucket_floor(i):
    b = int_to_byte4(i)
    decoded = byte4_to_int(b)
    assert 0 <= b <= 255
    assert decoded <= i  # rounds down
    if b < 255:
        assert i < LENGTH_TABLE_INT[b + 1]  # ...to the nearest bucket floor


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_order_preserving(i):
    j = min(i + 1 + i // 7, 2**31 - 1)
    assert int_to_byte4(i) <= int_to_byte4(j)


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [np.arange(0, 300), rng.integers(0, 2**31 - 1, size=2000)]
    )
    enc = encode_lengths(vals)
    for v, e in zip(vals.tolist(), enc.tolist()):
        assert e == int_to_byte4(v)
