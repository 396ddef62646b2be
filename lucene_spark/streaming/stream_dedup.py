"""Stateful streaming dedup: first-seen-wins over an unbounded stream.

The streaming counterpart of ``pipeline/dedup.exact_duplicate_groups``:
an ingest stream (the reference's IndexWriter.addDocuments feed, NRT
micro-segments in this engine) drops every document whose content hash
was already seen in ANY earlier micro-batch — the dedup a training-data
ingest runs continuously instead of as a batch sweep.

Spark-native shape: ``applyInPandasWithState`` keyed by the content
hash. The state store holds one tiny record per distinct hash, hash-
partitioned across executors — at 100 TB that's the same horizontal
layout as the batch groupBy, but incremental: each micro-batch touches
only its own keys, and no re-shuffle of history ever happens. Within a
single batch, duplicates collapse to the smallest doc id (the batch
groupBy's keep-min rule); across batches the state flag suppresses
re-emission entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["first_seen_stream"]


def first_seen_stream(
    stream_df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming (content_sha256, doc_id) of FIRST-SEEN documents: one
    output row per distinct content hash across the whole stream's
    lifetime, carrying the smallest doc id of its first batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream_df.select(
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("content_sha256"),
        F.col(id_col).cast("long").alias("doc_id"),
    )

    def keep_first(key, pdf_iter, state):
        if state.exists:
            return  # hash already emitted in an earlier batch
        best = None
        for pdf in pdf_iter:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        state.update((True,))
        yield pd.DataFrame({"content_sha256": [key[0]], "doc_id": [best]})

    return hashed.groupBy("content_sha256").applyInPandasWithState(
        keep_first,
        "content_sha256 string, doc_id long",
        "seen boolean",
        "update",
        GroupStateTimeout.NoTimeout,
    )
