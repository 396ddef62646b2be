"""Bloom-filtered term lookups — the BloomFilteringPostingsFormat role
(``codecs/bloom/BloomFilteringPostingsFormat.java:66``): per-segment
"fuzzy sets" over a field's term dictionary that can definitively say a
term is NOT in a segment, so point lookups on low-df fields (primary
keys, URLs, content hashes) skip whole segments without touching their
postings.

Faithful pieces (``codecs/bloom/FuzzySet.java``):

- bitset sizes are all-ones numbers ``2^k - 1`` so the modulo is a single
  AND (``usableBitSetSizes``, :68-75);
- ``createOptimalSet(n, fpp)`` sizing + ``optimalK`` hash count (:100-107);
- hash = ``murmurhash3_x64_128(term_bytes, seed=104729)``
  (``StringHelper.java:360``), probe positions
  ``((int)(lsb + i*msb)) & bloomSize`` (:126-129);
- the default factory targets fpp 0.1023 sized to the segment's maxDoc
  (``DefaultBloomFilterFactory.java:36``).

Spark-first shape: the per-segment bitsets are built with ONE
aggregation — distinct ``(seg_id, term)`` from the postings table,
grouped by segment, each group folded into its bitset in a single Arrow
batch (a segment's term dictionary is shuffle-bounded by
``docs_per_segment``, the same skew bound the build relies on). The
resulting metadata is tiny (the reference's own default budget is <=8 MB
per segment, held on-heap by every SegmentReader — our driver-side dict
mirrors that cost profile; a real cluster would broadcast it). At query
time the searcher turns NO-segments into a postings-scan predicate, so
parquet partition/row-group pruning drops them before any I/O — the
100 TB win: a primary-key lookup touches only the one segment that MAYBE
holds the key instead of scanning every segment's term range.

Scope fence: ``downsize``/``FuzzySet.serialize`` VInt file format are
storage-level details of the .blm file; persistence here is a plain
parquet side table (``blooms_to_rows``/``rows_to_blooms``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, functions as F

from lucene_spark.analysis.minhash import murmur3_x64_128

__all__ = ["FuzzySet", "build_bloom_filters", "attach_blooms"]

#: FuzzySet.usableBitSetSizes (:68-75) — (2^(i+6)) - 1 for i in 0..25
_USABLE_SIZES = [(1 << (i + 6)) - 1 for i in range(26)]

#: DefaultBloomFilterFactory.java:36 — target max false-positive rate
DEFAULT_FPP = 0.1023

_SEED = 104729  # StringHelper.java:361 — the BytesRef overload's seed


def _nearest_set_size(max_bits: int) -> int:
    """FuzzySet.getNearestSetSize (:81-89): round DOWN to the nearest
    all-ones number."""
    result = _USABLE_SIZES[0]
    for s in _USABLE_SIZES:
        if s <= max_bits:
            result = s
    return result


@dataclass
class FuzzySet:
    """A lossy term-membership set: ``contains`` returns MAYBE (True) or
    definitively NO (False) — FuzzySet.java:117-134."""

    bloom_size: int
    hash_count: int
    bits: np.ndarray  # uint64 words, (bloom_size + 1) bits

    @classmethod
    def create_optimal_set(
        cls, max_unique_values: int, fpp: float = DEFAULT_FPP
    ) -> "FuzzySet":
        """FuzzySet.createOptimalSet (:100-107), bit-for-bit the same
        sizing arithmetic."""
        n = max(1, int(max_unique_values))
        set_size = int(
            math.ceil((n * math.log(fpp)) / math.log(1.0 / math.pow(2.0, math.log(2.0))))
        )
        set_size = _nearest_set_size(2 * set_size)
        optimal_k = int(round((set_size / n) * math.log(2.0)))
        words = (set_size + 1 + 63) // 64
        return cls(set_size, max(1, optimal_k), np.zeros(words, dtype=np.uint64))

    def _positions(self, value: bytes) -> list[int]:
        msb, lsb = murmur3_x64_128(value, seed=_SEED)
        # ((int)(lsb + i*msb)) & bloomSize — the Java int cast keeps the
        # low 32 bits; bloomSize is all-ones so the sign never survives
        return [
            ((lsb + i * msb) & 0xFFFFFFFF) & self.bloom_size
            for i in range(self.hash_count)
        ]

    def add_value(self, value: bytes) -> None:
        for pos in self._positions(value):
            self.bits[pos >> 6] |= np.uint64(1 << (pos & 63))

    def contains(self, value: bytes) -> bool:
        """True = MAYBE, False = definitively NO (ContainsResult, :50-53)."""
        for pos in self._positions(value):
            if not (int(self.bits[pos >> 6]) >> (pos & 63)) & 1:
                return False
        return True


def build_bloom_filters(
    index, field: str | None = None, fpp: float = DEFAULT_FPP
) -> dict[int, FuzzySet]:
    """One distributed pass: distinct (seg_id, term) -> per-segment
    bitset, sized to the segment's doc count like the default factory
    sizes to maxDoc (DefaultBloomFilterFactory.java:33-36)."""
    fld = field or index.config.field_name
    dps = index.config.docs_per_segment
    seg_counts = (
        index.docs.select(F.expr(f"doc_id DIV {dps}").alias("seg_id"))
        .groupBy("seg_id")
        .agg(F.count("*").alias("n_docs"))
    )
    terms = (
        index.postings.filter(F.col("field") == fld)
        .select("seg_id", "term")
        .distinct()
        .join(F.broadcast(seg_counts), "seg_id")
    )

    import pandas as pd

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg_id"].iloc[0])
        fz = FuzzySet.create_optimal_set(int(pdf["n_docs"].iloc[0]), fpp)
        for t in pdf["term"]:
            fz.add_value(str(t).encode("utf-8"))
        return pd.DataFrame(
            {
                "seg_id": [seg],
                "bloom_size": [fz.bloom_size],
                "hash_count": [fz.hash_count],
                "bits": [fz.bits.tobytes()],
            }
        )

    rows = (
        terms.groupBy("seg_id")
        .applyInPandas(
            _pack,
            schema="seg_id long, bloom_size int, hash_count int, bits binary",
        )
        .collect()
    )
    return {
        int(r["seg_id"]): FuzzySet(
            int(r["bloom_size"]),
            int(r["hash_count"]),
            np.frombuffer(r["bits"], dtype=np.uint64).copy(),
        )
        for r in rows
    }


def attach_blooms(index, field: str | None = None, fpp: float = DEFAULT_FPP) -> None:
    """Attach per-segment blooms for `field` to the index (the
    PostingsFormat wrapping step: FieldsConsumer decoration,
    BloomFilteringPostingsFormat.java:128-141). The searcher consults
    ``index.blooms`` on exact-term paths."""
    fld = field or index.config.field_name
    if not hasattr(index, "blooms") or index.blooms is None:
        index.blooms = {}
    index.blooms[fld] = build_bloom_filters(index, fld, fpp)
