"""Dense global doc-ID assignment without a single-partition sort.

Lucene assigns docIDs sequentially per writer thread and rebases per segment
(``index/DocumentsWriterPerThread.java``, ``index/SegmentInfos.java``).  The
Spark-native equivalent: range-partition by a unique ordering key, sort
within partitions, then add per-partition base offsets (computed from one
tiny count aggregate).  The resulting ID is the global rank of the ordering
key, so it is deterministic regardless of where range boundaries land —
no ``Window.orderBy`` over a single partition, scales to any corpus size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["with_doc_ids"]


def with_doc_ids(
    df: DataFrame,
    order_by: Sequence[str] | None,
    doc_id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 0..N-1 ``doc_id``.

    order_by given: id = global rank of the (unique) ordering key
    (range-partition + in-partition sort + per-partition offsets).

    order_by None: zipWithIndex-style ARRIVAL order — ids follow the input
    partition layout with no shuffle at all (exactly Lucene's sequential
    per-writer assignment, ``index/DocumentsWriterPerThread.java``);
    deterministic for a fixed input file set.
    """
    if order_by:
        order_cols = [F.col(c) for c in order_by]
        parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        ranged = (
            df.repartitionByRange(parts, *order_cols)
            .sortWithinPartitions(*order_cols)
            .withColumn("_pid", F.spark_partition_id())
        )
    else:
        ranged = df.withColumn("_pid", F.spark_partition_id())
    ranged.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    bases: dict[int, int] = {}
    running = 0
    for pid in sorted(counts):
        bases[pid] = running
        running += counts[pid]

    # id = base[pid] + row-rank within the (cached, hence pinned) partition.
    # monotonically_increasing_id is (partitionId << 33) + rowNumber in row
    # order, and rows are already in the wanted order (sorted within range
    # partitions / arrival), so the rank is mid minus the partition's id
    # prefix — the whole assignment stays JVM-side: the previous
    # mapInPandas implementation pushed every corpus row (full text)
    # through an Arrow round-trip just to attach this column, which was
    # pure serialization overhead at build scale.
    spark = df.sparkSession
    base_df = spark.createDataFrame(
        [(int(pid), int(b)) for pid, b in bases.items()], "_pid int, _base long"
    )
    out = (
        ranged.withColumn("_mid", F.monotonically_increasing_id())
        .join(F.broadcast(base_df), "_pid")
        .withColumn(
            doc_id_col,
            (
                F.col("_base")
                + (F.col("_mid") - F.col("_pid").cast("long") * F.lit(1 << 33))
            ).cast("long"),
        )
        .drop("_pid", "_mid", "_base")
    )
    return out
