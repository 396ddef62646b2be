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

from typing import Iterator, Sequence

import pandas as pd
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

    schema_out = ranged.drop("_pid").schema.add(doc_id_col, "long", False)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offset = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if offset is None:
                offset = bases[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[doc_id_col] = range(offset, offset + len(pdf))
            offset += len(pdf)
            yield pdf

    out = ranged.mapInPandas(assign, schema=schema_out)
    return out
