"""BM25 scoring with Lucene's exact float32 operation order.

Parity targets (reference ``search/similarities/BM25Similarity.java``):

- defaults ``k1=1.2, b=0.75, discountOverlaps=true``        (:121-123)
- ``idf = ln(1 + (docCount - df + 0.5)/(df + 0.5))`` computed in float64,
  cast to float32                                            (:138-141)
- ``avgdl = float32(sumTotalTermFreq / float64(docCount))`` per field (:143-146)
- 256-entry norm-inverse cache over the byte4 length table:
  ``cache[i] = 1/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl))`` in float32 (:217-222)
- ``score = weight - weight/(1 + freq*invNorm)``, ``weight = boost*idf``,
  all float32                                                (:257-274)

Everything here is numpy float32 so the Spark engine, the SQL oracle (which
casts each intermediate to FLOAT), and the pure-Python test oracle agree
bit-for-bit (float64->float32 double rounding is exact for single +,-,*,/
ops because float64 carries >2x float32's precision).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lucene_spark.util.smallfloat import LENGTH_TABLE

__all__ = ["BM25Similarity", "FieldStats", "TermStats"]

F32 = np.float32


@dataclass(frozen=True)
class FieldStats:
    """Searcher-wide field statistics (reference ``search/FieldStats.java:69``).

    Invariants (FieldStats javadoc :22-45):
    ``docCount <= maxDoc``, ``docCount <= sumDocFreq <= sumTotalTermFreq``.
    """

    max_doc: int
    doc_count: int
    sum_total_term_freq: int
    sum_doc_freq: int


@dataclass(frozen=True)
class TermStats:
    """Per-term statistics (reference ``search/TermStats.java:64``)."""

    term: str
    doc_freq: int
    total_term_freq: int


@dataclass(frozen=True)
class BM25Similarity:
    k1: float = 1.2
    b: float = 0.75

    def idf(self, doc_freq: int, doc_count: int) -> np.float32:
        """float32(ln(1 + (docCount - df + 0.5)/(df + 0.5))), float64 inside."""
        return F32(np.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))

    def avgdl(self, sum_total_term_freq: int, doc_count: int) -> np.float32:
        return F32(sum_total_term_freq / float(doc_count))

    def norm_inv_cache(self, avgdl: np.float32) -> np.ndarray:
        """cache[b] = 1/(k1*((1-b) + b*len(b)/avgdl)) in float32, len from byte4."""
        k1 = F32(self.k1)
        b = F32(self.b)
        one = F32(1.0)
        return (one / (k1 * ((one - b) + b * LENGTH_TABLE / F32(avgdl)))).astype(
            np.float32
        )

    def weight(self, boost: float, idf: np.float32) -> np.float32:
        return F32(F32(boost) * idf)

    def score(
        self, freq: np.ndarray, norm_inv: np.ndarray, weight: np.float32
    ) -> np.ndarray:
        """Vectorized ``weight - weight/(1 + freq*invNorm)`` in float32."""
        freq = np.asarray(freq, dtype=np.float32)
        norm_inv = np.asarray(norm_inv, dtype=np.float32)
        one = F32(1.0)
        return (weight - weight / (one + freq * norm_inv)).astype(np.float32)

    def score_max(
        self, max_freq: int, min_len_norm_byte: int, avgdl: np.float32, weight: np.float32
    ) -> np.float32:
        """Block upper bound: score at (max block freq, min block length).

        Valid because BM25 is monotone increasing in freq and decreasing in
        field length (reference impact machinery:
        ``search/MaxScoreCache.java:59-140``).
        """
        cache = self.norm_inv_cache(avgdl)
        return self.score(
            np.array([max_freq], dtype=np.float32),
            cache[np.array([min_len_norm_byte])],
            weight,
        )[0]
