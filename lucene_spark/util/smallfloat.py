"""Lucene-compatible 4-significant-bit length-norm quantization ("byte4").

Behavioral parity target: ``util/SmallFloat.java:103-157`` in the reference
(clean-room reimplementation in numpy-friendly Python).  A field length
(token count) is quantized to one byte such that ordering is preserved and
small lengths keep full precision: values below ``NUM_FREE_VALUES`` are
stored verbatim, larger values keep the 4 most significant bits plus an
exponent, offset so that every byte value 0..255 is used.

The 256-entry decode table (``LENGTH_TABLE``) is what BM25 consumes: the
scorer precomputes ``1/(k1*((1-b)+b*len/avgdl))`` per byte value, exactly
like ``BM25Similarity.java:217-222``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "int_to_byte4",
    "byte4_to_int",
    "LENGTH_TABLE",
    "encode_lengths",
]


def _long_to_int4(value: int) -> int:
    """Order-preserving 4-significant-bit encoding of a non-negative int."""
    if value < 0:
        raise ValueError(f"only non-negative values supported, got {value}")
    num_bits = value.bit_length()
    if num_bits < 4:
        return value  # subnormal: stored as-is, exponent field 0
    shift = num_bits - 4
    mantissa = (value >> shift) & 0x07  # implicit leading 1 dropped
    return mantissa | ((shift + 1) << 3)


def _int4_to_long(encoded: int) -> int:
    mantissa = encoded & 0x07
    exponent = (encoded >> 3) - 1
    if exponent == -1:
        return mantissa
    return (mantissa | 0x08) << exponent


_MAX_INT4 = _long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4


def int_to_byte4(value: int) -> int:
    """Quantize a non-negative int (field length) to an unsigned byte 0..255."""
    if value < 0:
        raise ValueError(f"only non-negative values supported, got {value}")
    if value < NUM_FREE_VALUES:
        return value
    return NUM_FREE_VALUES + _long_to_int4(value - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte 0..255 back to the bucket-floor length."""
    b &= 0xFF
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


#: LENGTH_TABLE[b] == decoded length for norm byte b (float32, like Lucene's
#: per-byte cache input).  Used by the BM25 norm-inverse cache.
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.float32)

#: Integer variant of the decode table (for SQL oracles / invariant checks).
LENGTH_TABLE_INT = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)

# Encoding a length == finding the greatest bucket floor <= length, because
# byte4 always rounds DOWN to the bucket floor and the table is sorted.
_SORTED_FLOORS = LENGTH_TABLE_INT  # already ascending


def encode_lengths(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array -> uint8 array."""
    lengths = np.asarray(lengths, dtype=np.int64)
    if (lengths < 0).any():
        raise ValueError("negative field length")
    idx = np.searchsorted(_SORTED_FLOORS, lengths, side="right") - 1
    return idx.astype(np.uint8)
