"""Input-split spreading for map-heavy pipeline operators.

Parquet input splits follow the FILE layout (``spark.sql.files.
maxPartitionBytes``), not the cluster size: a small or single-file input
arrives as one split, so an operator whose map side multiplies rows
~1000x (shingle/permutation explodes, all-pairs joins, per-bit unrolls)
runs that entire explosion inside ONE task while every other core idles.

``spread`` round-robins such an input across the default parallelism
BEFORE the explosion — one tiny shuffle of the raw rows (cheap: the
multiplication hasn't happened yet) buys a fully parallel map side. It is
a guarded no-op when the input already has enough splits, which is the
normal case at scale (a 100 TB corpus reads as ~100k splits); only
benchmark- and test-sized inputs take the repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``factor * defaultParallelism`` iff it
    currently has fewer partitions than that."""
    par = df.sparkSession.sparkContext.defaultParallelism * max(1, factor)
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
