"""Deletes / live docs / update-by-term.

Reference semantics being re-expressed:

- per-segment live-docs bitset (``codecs/lucene90/Lucene90LiveDocsFormat``):
  here a ``_deletes`` parquet table of doc_ids, anti-joined at query time
  (the Iceberg row-level-delete-file pattern);
- buffered deletes applied on flush (``index/DocumentsWriterDeleteQueue``):
  ``delete_by_query`` appends matched ids — queries see them immediately on
  reload; like Lucene, collection statistics (df, doc_count, avgdl) keep
  counting deleted docs until a merge reclaims them;
- ``IndexWriter.updateDocument(Term, doc)`` (``index/IndexWriter.java:113``):
  delete-by-term + NRT micro-segment add, atomic per call;
- merge reclaim (``index/TieredMergePolicy`` nonDelRatio): purge_merge
  rewrites segments without deleted rows and clears the reclaimed ids.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index.build import IndexConfig, InvertedIndex
from lucene_spark.search import query as Q

__all__ = [
    "read_deletes",
    "delete_by_query",
    "delete_by_term",
    "update_documents",
    "apply_deletes",
]


def _deletes_dir(index_dir: str) -> str:
    return f"{index_dir}/_deletes"


def read_deletes(spark: SparkSession, index_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(_deletes_dir(index_dir)).select("doc_id").distinct()
    except Exception:
        return None


def apply_deletes(df: DataFrame, deletes: DataFrame | None) -> DataFrame:
    """Anti-join live-docs filter for any (doc_id, ...) result frame."""
    if deletes is None:
        return df
    return df.join(F.broadcast(deletes), "doc_id", "left_anti")


def delete_by_query(
    spark: SparkSession, index_dir: str, index: InvertedIndex, query: Q.Query
) -> int:
    """Buffered delete: record every doc matching `query`; returns count."""
    from lucene_spark.search.searcher import IndexSearcher

    matched = IndexSearcher(index).matches(query).select("doc_id").distinct()
    matched.persist()
    n = matched.count()
    if n:
        matched.withColumn("ts", F.lit(time.time())).write.mode("append").parquet(
            _deletes_dir(index_dir)
        )
    matched.unpersist()
    return n


def delete_by_term(
    spark: SparkSession, index_dir: str, index: InvertedIndex, field: str, term: str
) -> int:
    return delete_by_query(spark, index_dir, index, Q.TermQuery(field, term))


def update_documents(
    spark: SparkSession,
    index_dir: str,
    index: InvertedIndex,
    cfg: IndexConfig,
    key_col: str,
    new_docs: DataFrame,
) -> int:
    """updateDocument(Term, doc): delete docs whose key_col appears in
    new_docs, then add new_docs as one NRT micro-segment (epoch = now)."""
    from lucene_spark.streaming.nrt import micro_segment_writer

    keys = [r[0] for r in new_docs.select(key_col).distinct().collect()]
    old = index.docs.filter(F.col(key_col).isin(keys)).select("doc_id").distinct()
    old.persist()
    n_deleted = old.count()
    if n_deleted:
        old.withColumn("ts", F.lit(time.time())).write.mode("append").parquet(
            _deletes_dir(index_dir)
        )
    old.unpersist()
    # monotonic un-modded epoch + distinct 'upd_' segment prefix: can never
    # collide with streaming epoch_ids (small ints) or an earlier update's
    # segment name / reserved doc-id range, even within one millisecond
    epoch = _next_update_epoch()
    micro_segment_writer(index_dir, cfg, name_prefix="upd")(new_docs, epoch)
    return n_deleted


_LAST_UPDATE_EPOCH = 0


def _next_update_epoch() -> int:
    global _LAST_UPDATE_EPOCH
    epoch = max(int(time.time() * 1000), _LAST_UPDATE_EPOCH + 1)
    _LAST_UPDATE_EPOCH = epoch
    return epoch


def purge_merge(
    spark: SparkSession, index_dir: str, cfg: IndexConfig
) -> list[str]:
    """Merge ALL live segments with deleted rows dropped (delete reclaim),
    then clear the reclaimed ids from the deletes table."""
    from lucene_spark.index.segments import list_segments, merge_segments

    deletes = read_deletes(spark, index_dir)
    if deletes is None:
        return []
    segs = list_segments(spark, index_dir)
    merged = merge_segments(
        spark, index_dir, cfg, candidates=segs, purge_deletes=deletes
    )
    # reclaimed: every recorded delete fell inside the merged segments
    spark.createDataFrame([], schema="doc_id long, ts double").write.mode(
        "overwrite"
    ).parquet(_deletes_dir(index_dir))
    return merged


# ---------------------------------------------------------------------------
# Numeric doc-values updates — IndexWriter.updateNumericDocValue(Term,
# field, value) (index/IndexWriter.java:1333): change a per-doc numeric
# column WITHOUT reindexing the document. Stored as an `_dv_updates`
# parquet log of (doc_id, field, value, epoch); the read side overlays
# last-epoch-wins values onto the docs table (the reference's
# per-segment DocValuesFieldUpdates files replayed at reader-open).
# ---------------------------------------------------------------------------


def _dv_updates_dir(index_dir: str) -> str:
    return f"{index_dir}/_dv_updates"


def update_numeric_doc_values(
    spark: SparkSession,
    index_dir: str,
    index: InvertedIndex,
    query: Q.Query,
    field: str,
    value: int,
) -> int:
    """Record field=value for every LIVE doc matching `query` (the
    reference's term-addressed variant is `query=Q.TermQuery(...)`).
    Returns the number of docs updated. Visible after `apply_dv_updates`
    on a (re)loaded index — the openIfChanged analog."""
    from lucene_spark.search.searcher import IndexSearcher

    matched = IndexSearcher(index).matches(query).select("doc_id").distinct()
    matched.persist()
    n = matched.count()
    if n:
        (
            matched.withColumn("field", F.lit(field))
            .withColumn("value", F.lit(int(value)).cast("long"))
            .withColumn("epoch", F.lit(_next_update_epoch()))
            .write.mode("append")
            .parquet(_dv_updates_dir(index_dir))
        )
    matched.unpersist()
    return n


def read_dv_updates(spark: SparkSession, index_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(_dv_updates_dir(index_dir))
    except Exception:
        return None


def apply_dv_updates(index: InvertedIndex, updates: DataFrame | None) -> InvertedIndex:
    """Overlay last-epoch-wins updated values onto the docs table: for
    each updated field, matched docs read the new value, everything else
    keeps the stored column. Returns a shallow index copy with the
    patched docs frame (postings/norms untouched — doc values are not
    scoring state here, exactly like the reference's separation)."""
    import copy

    if updates is None:
        return index
    fields = [r["field"] for r in updates.select("field").distinct().collect()]
    docs = index.docs
    for fld in fields:
        last = (
            updates.filter(F.col("field") == fld)
            .groupBy("doc_id")
            .agg(F.max(F.struct("epoch", "value")).alias("_u"))
            .select("doc_id", F.col("_u.value").alias("_new_" + fld))
        )
        docs = docs.join(F.broadcast(last), "doc_id", "left_outer").withColumn(
            fld,
            F.coalesce(F.col("_new_" + fld), F.col(fld).cast("long")),
        ).drop("_new_" + fld)
    patched = copy.copy(index)
    patched.docs = docs
    return patched
