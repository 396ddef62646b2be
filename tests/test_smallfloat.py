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


# ---------------- HalfFloatPoint (sandbox/document/HalfFloatPoint.java) -----


def test_half_float_reference_vectors():
    """TestHalfFloatPoint.testHalfFloatConversion vectors, bit-for-bit."""
    from lucene_spark.util import halffloat as hf

    assert hf.half_float_to_short_bits(0.0) == 0
    assert hf.half_float_to_short_bits(-0.0) & 0xFFFF == 1 << 15
    # Float.MIN_VALUE (smallest denormal float) rounds to zero
    assert hf.half_float_to_short_bits(1.4e-45) == 0

    vectors = [
        ("0011110000000000", 1.0),
        ("0011110000000001", 1.0009765625),
        ("1100000000000000", -2.0),
        ("0111101111111111", 65504.0),
        ("0000010000000000", 2.0 ** -14),
        ("0000001111111111", 2.0 ** -14 - 2.0 ** -24),
        ("0000000000000001", 2.0 ** -24),
        ("0000000000000000", 0.0),
        ("1000000000000000", -0.0),
        ("0111110000000000", float("inf")),
        ("1111110000000000", float("-inf")),
        ("0011010101010101", 0.333251953125),
    ]
    for sbits, value in vectors:
        bits = int(sbits, 2)
        bits_s = bits - 0x10000 if bits >= 0x8000 else bits
        conv = hf.short_bits_to_half_float(bits_s)
        if value == 0.0:
            import math
            assert conv == 0.0 and math.copysign(1, conv) == math.copysign(1, value)
        else:
            assert conv == value, (sbits, conv, value)
        assert hf.half_float_to_short_bits(conv) == bits_s
    import math
    assert math.isnan(hf.short_bits_to_half_float(int("0111111000000000", 2)))


def test_half_float_round_shift():
    """TestHalfFloatPoint.testRoundShift: ties round to even."""
    from lucene_spark.util.halffloat import _round_shift

    expected = [0, 0, 0, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4]
    assert [_round_shift(i, 2) for i in range(17)] == expected


def test_half_float_sortable_order_and_next():
    from lucene_spark.util import halffloat as hf

    vals = [-65504.0, -2.0, -0.0, 0.0, 2.0 ** -24, 1.0, 1.0009765625, 65504.0]
    enc = [hf.half_float_to_sortable_short(v) for v in vals]
    assert enc == sorted(enc)
    for v in (1.0, -2.0):
        assert hf.next_up(v) > v and hf.next_down(v) < v
        assert hf.sortable_short_to_half_float(hf.half_float_to_sortable_short(v)) == v
    # around zero the ladder follows SORTABLE order: -0.0 sits one step
    # below +0.0 (like the reference's nextDown(0f) == -0f)
    import math
    assert hf.next_up(0.0) == 2.0 ** -24
    assert math.copysign(1, hf.next_down(0.0)) == -1.0 and hf.next_down(0.0) == 0.0
    assert hf.next_down(-0.0) == -(2.0 ** -24)
    # numpy float16 agrees with the reference rounding on a sweep
    import numpy as np
    rng = np.random.RandomState(7)
    xs = rng.uniform(-70000, 70000, 500).astype(np.float32)
    with np.errstate(over="ignore"):  # |x| > float16 max overflows to inf by design
        for x in xs:
            ref = hf.short_bits_to_half_float(hf.half_float_to_short_bits(float(x)))
            npv = float(np.float16(x))
            assert ref == npv or (np.isinf(ref) and np.isinf(npv)), (x, ref, npv)
