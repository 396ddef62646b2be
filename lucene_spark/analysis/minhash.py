"""MinHash token filter — ``analysis/common/src/java/.../minhash/
MinHashFilter.java:49`` (the analysis-side LSH fingerprinting that the
pipeline module's dataset-level MinHash mirrors at scale).

Clean-room pieces, all pinned by the reference's own test vectors in
``tests/test_minhash_filter.py``:

- ``murmur3_x64_128`` — Austin Appleby's public-domain MurmurHash3
  (x64, 128-bit variant), byte-identical to the reference's inlined copy
  (``testIntHash`` / ``testStringHash`` 64-bit pairs replay exactly).
- 128-bit min-hash bookkeeping: per hash-position rehash via
  ``combineOrdered`` (h*37 + intHash(i)), bucketing by the TOP 32 bits of
  val2 over ``ceil(2^32 / bucketCount)``-sized ranges, fixed-size
  ascending sets with unsigned (val2, val1) ordering, the
  single-hash-per-bucket rotation fix-up, and the exact char-encoded
  token emission (4 chars of val2, then 2 or 4 chars of val1, with the
  hash-position prefix when hashCount > 1).

Input is the token-term sequence (the reference sits downstream of a
5-word ShingleFilter; compose with ``FilteredAnalyzer(shingle_size=5)``
or feed shingles directly)."""

from __future__ import annotations

__all__ = ["murmur3_x64_128", "min_hash_tokens", "MIN_HASH_TYPE"]

MIN_HASH_TYPE = "MIN_HASH"

_M = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """-> (val1, val2) as SIGNED 64-bit ints (the reference's LongPair)."""
    length = len(data)
    h1 = h2 = seed & _M
    n_blocks = length // 16
    for b in range(n_blocks):
        o = b * 16
        k1 = int.from_bytes(data[o : o + 8], "little")
        k2 = int.from_bytes(data[o + 8 : o + 16], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M
    tail = data[n_blocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    # tail handling (the spec's fall-through switch, bytes high-to-low)
    if t > 8:
        for i in range(t - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        t = 8
    if t > 0:
        for i in range(t - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return _signed(h1), _signed(h2)


def _u(x: int) -> int:
    return x & _M


def _combine_ordered(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    """combineOrdered over two LongPairs, starting from (0, 0):
    result = ((a1*37 + b1) mod 2^64, (a2*37 + b2) mod 2^64)."""
    return (
        _signed((_u(a[0]) * 37 + _u(b[0])) & _M),
        _signed((_u(a[1]) * 37 + _u(b[1])) & _M),
    )


def _int_hash(i: int) -> tuple[int, int]:
    return murmur3_x64_128(i.to_bytes(4, "big"))


def _sort_key(pair: tuple[int, int]):
    return (_u(pair[1]), _u(pair[0]))  # unsigned val2, then val1


def _chars_of(x: int, n: int) -> list[str]:
    ux = _u(x)
    return [chr((ux >> s) & 0xFFFF) for s in (48, 32, 16, 0)][:n]


def min_hash_tokens(
    terms,
    hash_count: int = 1,
    bucket_count: int = 512,
    hash_set_size: int = 1,
    with_rotation: bool | None = None,
) -> list[str]:
    """The filter's end-of-stream emission: char-encoded min hashes in
    (hash position, bucket, ascending hash) order. Defaults match the
    MinHashFilterFactory's (512 buckets, 1 hash, rotation on)."""
    if hash_count <= 0 or bucket_count <= 0 or hash_set_size <= 0:
        raise ValueError("hashCount/bucketCount/hashSetSize must be > 0")
    if with_rotation is None:
        with_rotation = bucket_count > 1
    bucket_size = (1 << 32) // bucket_count
    if (1 << 32) % bucket_count != 0:
        bucket_size += 1
    # minhash sets: [hash_position][bucket] -> ascending capped list
    sets: list[list[list[tuple[int, int]]]] = [
        [[] for _ in range(bucket_count)] for _ in range(hash_count)
    ]
    for term in terms:
        raw = murmur3_x64_128(term.encode("utf-16-le"))
        for i in range(hash_count):
            rehashed = _combine_ordered(raw, _int_hash(i))
            bucket = (_u(rehashed[1]) >> 32) // bucket_size
            s = sets[i][int(bucket)]
            if rehashed in s:
                continue
            s.append(rehashed)
            s.sort(key=_sort_key)
            if len(s) > hash_set_size:
                s.pop()
    if with_rotation and hash_set_size == 1:
        for i in range(hash_count):
            row = sets[i]
            for b in range(bucket_count):
                if not row[b]:
                    for off in range(1, bucket_count):
                        src = row[(b + off) % bucket_count]
                        if src:
                            row[b] = [src[0]]
                            break
    out: list[str] = []
    for i in range(hash_count):
        for b in range(bucket_count):
            for pair in sets[i][b]:
                chars: list[str] = []
                if hash_count > 1:
                    chars.append(chr((i >> 16) & 0xFFFF))
                    chars.append(chr(i & 0xFFFF))
                chars.extend(_chars_of(pair[1], 4))
                chars.extend(_chars_of(pair[0], 4 if hash_count == 1 else 2))
                out.append("".join(chars))
    return out
