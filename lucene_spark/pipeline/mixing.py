"""Domain mixing — deterministic per-source sampling for training-data
mixture weights (the Pile/GPT-3-style "source X contributes fraction p,
possibly > 1 epoch" recipe every large pretraining corpus applies after
curation).

Spark-first shape, 100-TB-aware:

- **subsampling** (rate < 1): a per-row md5-derived uniform in [0, 1)
  compared against the source's rate — a pure map-side filter, no
  shuffle, reproducible across runs/partitionings because the randomness
  is a hash of (doc_id, salt), not an RNG;
- **oversampling** (rate >= 1): every row repeats floor(rate) times and
  one more with probability frac(rate), via a JVM-side
  ``explode(sequence(...))`` — again map-side; the emitted ``epoch``
  column keeps repeats distinguishable downstream (shuffling into
  training order is the caller's one shuffle, not ours);
- the rate table is a handful of rows — broadcast join against the
  corpus (or an inlined CASE; we broadcast to keep rates data-driven).

Everything is md5-closed-form, so a DuckDB oracle reproduces selections
bit-exactly (``h60(doc_id || ':' || salt) / 2^60`` is the uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.pipeline.dedup import h60

__all__ = ["mix_sources"]

#: the uniform's denominator: h60 yields 60 bits
_H60_RANGE = float(1 << 60)


def mix_sources(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """The mixed corpus: each source kept/repeated at its rate.

    ``rates``: source value -> sampling rate; < 1 subsamples, >= 1
    repeats (epochs).  Output = input columns + ``epoch`` (0-based
    repeat index; subsampled rows have epoch 0).  Deterministic: row
    (doc_id) selection depends only on md5(doc_id:salt).
    """
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("mixing rates must be >= 0")
    spark = docs.sparkSession
    rate_df = F.broadcast(
        spark.createDataFrame(
            [(k, float(v)) for k, v in sorted(rates.items())],
            f"{source_col} string, _rate double",
        )
    )
    u = h60(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))) / F.lit(
        _H60_RANGE
    )
    rate = F.coalesce(F.col("_rate"), F.lit(float(default_rate)))
    # repeats: floor(rate) full epochs + 1 extra when u < frac(rate);
    # for rate < 1 this degrades to the plain keep-if-u<rate filter
    n_rep = (
        F.floor(rate).cast("long")
        + F.when(u < (rate - F.floor(rate)), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        docs.join(rate_df, source_col, "left")
        .withColumn("_n_rep", n_rep)
        .filter(F.col("_n_rep") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n_rep") - 1)))
        .withColumn("epoch", F.col("epoch").cast("int"))
        .drop("_rate", "_n_rep")
    )
