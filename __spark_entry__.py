"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship BM25 query on sf0.001;
``queries()`` / ``oracle_sql()`` pairs map SURVEY.md §2 operators to
engine DataFrame plans + DuckDB oracles (implementation and float32-parity
notes in ``lucene_spark/entry_impl.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lucene_spark import entry_impl


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for TermQuery('spark') over sf0.001 documents,
    joined back to the stored fields (doc retrieval)."""
    import pyspark.sql.functions as F

    from lucene_spark.search import query as Q

    sf_dir = "/root/testdata/sf0.001"
    idx, searcher = entry_impl.get_searcher(spark, sf_dir)
    top = searcher.search(Q.TermQuery("text", "spark"), k=10)
    return top.join(idx.docs.select("doc_id", "lang", "source"), "doc_id").select(
        "doc_id", "score", "lang", "source"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_impl.build_queries()


def oracle_sql() -> dict[str, str]:
    return entry_impl.build_oracles()
