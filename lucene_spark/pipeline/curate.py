"""End-to-end corpus curation: the composed training-data pipeline.

The flow a 100 TB pretraining corpus runs before tokenization — quality
gating, exact dedup, MinHash-LSH near-dup removal, language tagging —
expressed as ONE declarative DataFrame plan over the building blocks in
``pipeline/text.py`` and ``pipeline/dedup.py``. No new operators: this
module exists so the composition itself is a tested, benchmarked
artifact (the reference engine is one stage of such a pipeline; this is
the pipeline).

Keep rules (waterfall with corpus-global dedup decisions — each rule is
computed over the full corpus and intersected, so the result does not
depend on stage evaluation order):

1. quality_scores(doc) >= threshold              (heuristic gate)
2. doc_id == min(doc_id) of its exact-hash group (exact dedup)
3. doc_id == its near-dup cluster's min label, or unclustered
   (MinHash band -> LSH candidate pairs -> connected components)

Scale notes: every stage is shuffle-bounded by (doc_id) or the dedup
keys the underlying modules already use (map-side band sketches, capped
bucket joins); the final assembly is three semi/left joins on doc_id —
co-partitioned after the first shuffle, and the survivors frame feeds
parquet or an index build without re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.pipeline import dedup, text

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = 0.7,
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Return the surviving documents as (doc_id, pred_lang, quality),
    ordered by doc_id."""
    quality = text.quality_scores(docs, text_col=text_col).select(
        id_col, "quality"
    )
    exact_keep = dedup.exact_duplicate_groups(docs, text_col=text_col).select(
        F.col("min_doc_id").alias(id_col)
    )
    pairs = dedup.minhash_lsh_pairs(
        docs, text_col=text_col, num_perm=num_perm, bands=bands
    )
    clusters = dedup.duplicate_clusters(pairs)  # (doc_id, cluster_id=min label)
    lang = text.language_id(docs, text_col=text_col).select(id_col, "pred_lang")

    return (
        docs.select(id_col)
        .join(quality, id_col)
        .filter(F.col("quality") >= F.lit(quality_threshold))
        .join(exact_keep, id_col, "semi")
        .join(clusters, id_col, "left")
        .filter(
            F.col("cluster_id").isNull() | (F.col(id_col) == F.col("cluster_id"))
        )
        .join(lang, id_col)
        .select(id_col, "pred_lang", "quality")
        .orderBy(id_col)
    )
