"""Scalar-quantized (int8) vector search — the Lucene99 quantized-vectors
role (``codecs/lucene99/Lucene99ScalarQuantizedVectorsFormat.java``,
``util/quantization/ScalarQuantizer.java``) plus the plain byte-vector
similarities of ``index/VectorSimilarityFunction.java`` (KnnByteVectorQuery's
scoring surface).

Fidelity notes (all float32 op order matches the reference exactly):

- quantiles: ``ScalarQuantizer.getUpperAndLowerQuantile`` (:556-575) —
  drop ``selectorIndex = int(n*(1-ci)/2 + 0.5)`` values from each tail of
  the flattened sample, min/max of the rest.
- quantizer: divisor = (1<<bits)-1; min==max widens by ±divisor;
  ``scale = divisor/(max-min)``, ``alpha = (max-min)/divisor`` (float32,
  ScalarQuantizer.java:100-112); constant multiplier = ``alpha*alpha``.
- per-component quantize + corrective offset
  (``DefaultVectorUtilSupport.quantizeFloat``:392-414): dx = v-minQ,
  dxc = clamp(v)-minQ, rounded = Math.round(scale*dxc) (= floor(x+0.5f)),
  dxq = rounded*alpha, correction += minQ*(v - minQ/2) + (dx-dxq)*dxq —
  the correction accumulates SEQUENTIALLY in float32 (``float correction``),
  reproduced here with a float32 cumsum.
- quantized dot-product score
  (``ScalarQuantizedVectorSimilarity.DotProduct.score``:84-92):
  ``max((1 + dot*constMult + queryOffset + vectorOffset)/2, 0)`` in float32;
  Euclidean ignores offsets (``Euclidean.score``:66-72).
- byte similarities (VectorSimilarityFunction byte overloads):
  dot = ``0.5f + dot/(float)(dim * 2^15)`` (VectorUtil.dotProductScore:384),
  euclidean = ``1/(1f + squareDistance)``, cosine = ``(1 + cos)/2``,
  mip = ``scaleMaxInnerProductScore`` (:394-399).

Scale shape: quantization is one Arrow-batched pandas stage (vectorized
numpy, no per-row Python); the quantizer's parameters come from a bounded
driver-side sample (the reference samples <= 25k vectors too,
SCALAR_QUANTIZATION_SAMPLE_SIZE); search is the same broadcast-queries
JVM integer-dot plan as the float ANN path, with the int8 arrays 4x
smaller to shuffle/scan than float32.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

F32 = np.float32

SAMPLE_SIZE = 25_000  # ScalarQuantizer.SCALAR_QUANTIZATION_SAMPLE_SIZE


def default_confidence_interval(dim: int) -> float:
    """``Lucene99ScalarQuantizedVectorsFormat.calculateDefaultConfidenceInterval``
    (:123-125): ``max(0.9f, 1f - 1f/(dim + 1))`` in float32."""
    return float(max(F32(0.9), F32(F32(1.0) - F32(F32(1.0) / F32(dim + 1)))))


def get_upper_and_lower_quantile(
    arr: np.ndarray, confidence_interval: float
) -> tuple[float, float]:
    """``ScalarQuantizer.getUpperAndLowerQuantile`` (:556-575)."""
    arr = np.asarray(arr, dtype=np.float32).ravel()
    n = arr.size
    if n == 0:
        return 0.0, 0.0
    if n <= 2:
        s = np.sort(arr)
        return float(s[0]), float(s[-1])
    # (int) (len * (1f - ci) / 2f + 0.5f) — every step float32
    selector = int(
        F32(
            F32(F32(n) * F32(F32(1.0) - F32(confidence_interval)) / F32(2.0))
            + F32(0.5)
        )
    )
    s = np.sort(arr)
    mid = s[selector : n - selector] if selector > 0 else s
    return float(mid.min()), float(mid.max())


@dataclass(frozen=True)
class ScalarQuantizer:
    """``util/quantization/ScalarQuantizer.java:91-112`` (float32 fields)."""

    min_quantile: float
    max_quantile: float
    bits: int = 7

    def __post_init__(self):
        if not (0 < self.bits <= 8):
            raise ValueError("bits must be in (0, 8]")

    @property
    def _params(self) -> tuple[np.float32, np.float32, np.float32, np.float32]:
        divisor = F32((1 << self.bits) - 1)
        mn, mx = F32(self.min_quantile), F32(self.max_quantile)
        if mn == mx:
            mn, mx = F32(mn - divisor), F32(mx + divisor)
        scale = F32(divisor / F32(mx - mn))
        alpha = F32(F32(mx - mn) / divisor)
        return mn, mx, scale, alpha

    @property
    def constant_multiplier(self) -> np.float32:
        """``alpha * alpha`` (ScalarQuantizer.java:181)."""
        _, _, _, alpha = self._params
        return F32(alpha * alpha)

    @classmethod
    def from_vectors(
        cls, vectors: np.ndarray, confidence_interval: float, bits: int = 7
    ) -> "ScalarQuantizer":
        lo, hi = get_upper_and_lower_quantile(vectors, confidence_interval)
        return cls(lo, hi, bits)

    def quantize(self, vec: np.ndarray) -> tuple[np.ndarray, np.float32]:
        """One vector -> (uint8 codes, corrective offset). Vectorized float32
        with a float32 cumsum standing in for the reference's sequential
        ``correction +=`` loop (bit-identical: cumsum accumulates in order)."""
        mn, mx, scale, alpha = self._params
        v = np.asarray(vec, dtype=np.float32)
        dx = (v - mn).astype(np.float32)
        dxc = (np.clip(v, mn, mx) - mn).astype(np.float32)
        # Math.round(float) = floor(x + 0.5f), the addition in float32
        rounded = np.floor((scale * dxc + F32(0.5)).astype(np.float32)).astype(np.int64)
        dxq = (rounded.astype(np.float32) * alpha).astype(np.float32)
        terms = (
            (mn * (v - F32(mn / F32(2.0))).astype(np.float32)).astype(np.float32)
            + ((dx - dxq).astype(np.float32) * dxq).astype(np.float32)
        ).astype(np.float32)
        corr = np.cumsum(terms, dtype=np.float32)[-1] if terms.size else F32(0.0)
        return rounded.astype(np.int32), F32(corr)


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    confidence_interval: float = 0.9,
    bits: int = 7,
    quantizer: ScalarQuantizer | None = None,
) -> tuple[DataFrame, ScalarQuantizer]:
    """(id, qvec: array<int>, correction: float) + the fitted quantizer.
    Parameters come from a deterministic bounded sample (lowest ids first,
    the reference's bounded reservoir role); the per-vector quantize pass is
    one Arrow stage."""
    if quantizer is None:
        sample = (
            emb.select(id_col, vec_col).orderBy(id_col).limit(SAMPLE_SIZE).collect()
        )
        mat = np.array([r[vec_col] for r in sample], dtype=np.float32)
        quantizer = ScalarQuantizer.from_vectors(mat, confidence_interval, bits)
    q = quantizer

    def _quant(batches):
        for pdf in batches:
            out_codes = []
            out_corr = []
            for v in pdf[vec_col]:
                codes, corr = q.quantize(np.asarray(v, dtype=np.float32))
                out_codes.append(codes.tolist())
                out_corr.append(float(corr))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "qvec": out_codes,
                    "correction": pd.Series(out_corr, dtype="float32"),
                }
            )

    out = emb.select(id_col, vec_col).mapInPandas(
        _quant, schema=f"{id_col} long, qvec array<int>, correction float"
    )
    return out, quantizer


def _fcast(c: Column) -> Column:
    return c.cast("float")


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("long") * y.cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _int_sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("long") - y.cast("long")) * (x.cast("long") - y.cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_score_col(
    dot: Column, const_multiplier: float, query_offset: Column, vector_offset: Column
) -> Column:
    """``ScalarQuantizedVectorSimilarity.DotProduct.score`` float32 chain."""
    cm = F.lit(float(F32(const_multiplier))).cast("float")
    adj = _fcast(
        _fcast(_fcast(dot.cast("float") * cm) + query_offset.cast("float"))
        + vector_offset.cast("float")
    )
    half = _fcast(_fcast(F.lit(1.0).cast("float") + adj) / F.lit(2.0).cast("float"))
    return F.greatest(half, F.lit(0.0).cast("float"))


def quantized_topk(
    quantized: DataFrame,
    queries: DataFrame,
    quantizer: ScalarQuantizer,
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k over scalar-quantized vectors: (query_id, neighbor_id,
    score, rank). ``queries`` rows are quantized rows too (qvec,
    correction). Broadcast queries x one JVM integer-dot scan — the int8
    codes make this the 4x-lighter scan the Lucene99 format exists for."""
    cm = float(quantizer.constant_multiplier)
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("correction").alias("q_corr"),
    )
    scored = (
        quantized.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(qs), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            quantized_score_col(
                _int_dot(F.col("qvec"), F.col("q_qvec")),
                cm,
                F.col("q_corr"),
                F.col("correction"),
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def byte_vector_score_col(a: Column, b: Column, dim: int, similarity: str) -> Column:
    """``VectorSimilarityFunction`` byte overloads (:42, :61, :79, :96)."""
    if similarity == "dot_product":
        denom = F.lit(float(F32(dim * (1 << 15)))).cast("float")
        return _fcast(
            F.lit(0.5).cast("float") + _fcast(_int_dot(a, b).cast("float") / denom)
        )
    if similarity == "euclidean":
        return _fcast(
            F.lit(1.0).cast("float")
            / _fcast(F.lit(1.0).cast("float") + _int_sqdist(a, b).cast("float"))
        )
    if similarity == "cosine":
        cos = _fcast(
            _int_dot(a, b).cast("double")
            / (
                F.sqrt(_int_dot(a, a).cast("double"))
                * F.sqrt(_int_dot(b, b).cast("double"))
            )
        )
        return _fcast(
            _fcast(F.lit(1.0).cast("float") + cos) / F.lit(2.0).cast("float")
        )
    if similarity == "maximum_inner_product":
        d = _int_dot(a, b).cast("float")
        return F.when(
            d < 0,
            _fcast(
                F.lit(1.0).cast("float")
                / _fcast(F.lit(1.0).cast("float") + _fcast(-d))
            ),
        ).otherwise(_fcast(d + F.lit(1.0).cast("float")))
    raise ValueError(f"unknown byte similarity {similarity!r}")


def byte_vector_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "bvec",
    k: int = 10,
    similarity: str = "dot_product",
) -> DataFrame:
    """KnnByteVectorQuery's exact scoring surface
    (``search/KnnByteVectorQuery.java`` over the byte similarity overloads):
    (query_id, neighbor_id, score, rank), self excluded."""
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_bvec")
    )
    scored = (
        corpus.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(qs), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            byte_vector_score_col(
                F.col(vec_col), F.col("q_bvec"), dim, similarity
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
