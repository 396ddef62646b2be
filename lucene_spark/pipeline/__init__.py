"""Training-data pipeline operators: dedup, ANN similarity, text analysis,
multimodal plumbing — the curation layer a 100 TB corpus build needs on top
of the index/search engine."""

from lucene_spark.pipeline import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
