"""Scalar quantization (pipeline/quantization.py) — fidelity and utility.

The driver pair ``ann_scalar_quantized_topk`` pins bit-exactness vs the
SQL re-derivation; these tests pin the reference semantics (quantile
selector, min==max widening, Math.round codes) and the point of the
feature: quantized scores track true float similarity closely enough that
top-k recall stays high.
"""

import numpy as np
import pytest

from lucene_spark.pipeline.quantization import (
    ScalarQuantizer,
    get_upper_and_lower_quantile,
    quantize_embeddings,
    quantized_topk,
)

F32 = np.float32


def test_quantile_selector_matches_reference_rule():
    # n=100, ci=0.9 -> selector = (int)(100*0.100000024/2 + 0.5) = 5:
    # drop 5 from each tail
    arr = np.arange(100, dtype=np.float32)
    lo, hi = get_upper_and_lower_quantile(arr, 0.9)
    assert (lo, hi) == (5.0, 94.0)
    # <=2 values: plain min/max
    assert get_upper_and_lower_quantile(np.array([3.0, -1.0]), 0.9) == (-1.0, 3.0)


def test_min_eq_max_widens_by_divisor():
    q = ScalarQuantizer(2.0, 2.0, bits=7)
    mn, mx, scale, alpha = q._params
    assert (mn, mx) == (F32(2.0 - 127), F32(2.0 + 127))
    assert alpha == F32(F32(mx - mn) / F32(127))


def test_codes_are_math_round_and_in_range():
    q = ScalarQuantizer(-1.0, 1.0, bits=7)
    v = np.linspace(-1.5, 1.5, 101, dtype=np.float32)
    codes, _ = q.quantize(v)
    assert codes.min() >= 0 and codes.max() <= 127
    # clamped tails hit the extremes
    assert codes[0] == 0 and codes[-1] == 127
    # Math.round semantics: floor(scale*dxc + 0.5f)
    mn, mx, scale, alpha = q._params
    dxc = (np.clip(v, mn, mx) - mn).astype(np.float32)
    exp = np.floor((scale * dxc + F32(0.5)).astype(np.float32))
    assert (codes == exp.astype(np.int32)).all()


def test_dequantize_error_bounded_by_alpha():
    rng = np.random.RandomState(3)
    vals = rng.uniform(-1, 1, size=(64,)).astype(np.float32)
    q = ScalarQuantizer.from_vectors(vals, 1.0)  # full range, no clipping
    codes, _ = q.quantize(vals)
    mn, mx, scale, alpha = q._params
    deq = codes.astype(np.float32) * alpha + mn
    assert np.abs(deq - vals).max() <= float(alpha) / 2 + 1e-6


def test_corrected_dot_tracks_float_dot():
    # the whole point of the corrective offsets: byte1*byte2*alpha^2 +
    # corr1 + corr2 ~= float dot product
    rng = np.random.RandomState(7)
    a = rng.uniform(-0.5, 0.5, size=(64,)).astype(np.float32)
    b = rng.uniform(-0.5, 0.5, size=(64,)).astype(np.float32)
    q = ScalarQuantizer.from_vectors(np.stack([a, b]), 0.99)
    ca, corr_a = q.quantize(a)
    cb, corr_b = q.quantize(b)
    approx = (
        float(int(ca @ cb)) * float(q.constant_multiplier)
        + float(corr_a)
        + float(corr_b)
    )
    true = float(np.dot(a.astype(np.float64), b.astype(np.float64)))
    # residual = sum_i (ea-eb)(dxqb-dxqa) + ea*eb, first-order in the
    # rounding error (alpha/2 ~ 0.004 here) — a few 1e-2 at dim 64
    assert abs(approx - true) < 0.05


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_quantized_topk_recall_vs_float_brute_force(spark, emb):
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.similarity import brute_force_topk

    from lucene_spark.pipeline.quantization import default_confidence_interval

    qdf, quant = quantize_embeddings(
        emb, confidence_interval=default_confidence_interval(64), bits=7
    )
    got = quantized_topk(
        qdf, qdf.filter(F.col("vec_id") < 16), quant, k=10
    ).collect()
    exact = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 16), id_col="vec_id", k=10
    ).collect()
    by_q_got: dict[int, set] = {}
    by_q_exact: dict[int, set] = {}
    for r in got:
        by_q_got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(by_q_got[q] & by_q_exact[q]) / len(by_q_exact[q]) for q in by_q_exact
    ]
    recall = sum(recalls) / len(recalls)
    # int7 quantization on 64-dim embeddings: near-lossless top-10
    assert recall >= 0.9, recall
