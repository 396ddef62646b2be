"""Worked example: the round-4 analysis surface end-to-end.

Runs on the driver-generated testdata (default /root/testdata/sf0.001):

1. Snowball-stemmed BM25 search (query the stem, match every surface)
2. Rule-based transliteration as an index-time filter (misspelling-
   tolerant orthography field)
3. Cost-based CJK lattice segmentation over a fixture lexicon
4. Numeric collation sort keys (NATION_2 before NATION_10)

Usage: python examples/analysis_chains.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_spark.analysis.collation import collation_key_udf
    from lucene_spark.analysis.filters import FilteredAnalyzer
    from lucene_spark.analysis.segmenter import LatticeSegmenter
    from lucene_spark.analysis.translit import Transliterator
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import IndexSearcher

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def build(analyzer):
        return IndexSearcher(
            build_index(
                spark,
                docs,
                IndexConfig(
                    text_col="text",
                    field_name="text",
                    doc_id_col="doc_id",
                    docs_per_segment=1024,
                    analyzer=analyzer,
                ),
            )
        )

    # 1. Snowball Porter2: index stems, query stems
    s = build(FilteredAnalyzer(filters=("snowball_en",)))
    print("== snowball_en: top hits for stem 'tabl' (matches 'table') ==")
    s.search(Q.TermQuery("text", "tabl"), k=3).show(truncate=False)

    # 2. Transliteration: 'query' indexes as 'kwery'; the misspelled
    #    query 'qwery'... also normalizes through the same ruleset
    rules = "qu > kw ; ch > ch ; c } [ei] > s ; c > k ; ph > f ;"
    t = Transliterator(rules)
    s2 = build(FilteredAnalyzer(filters=(t,)))
    print("== transliterated field: searching", t("query"), "==")
    s2.search(Q.TermQuery("text", t("query")), k=3).show(truncate=False)

    # 3. Lattice segmentation: the compound trap decodes by cost
    lat = LatticeSegmenter(
        entries={"日本": (0, 1, 1), "人参": (0, 1, 1), "日本人": (100, 1, 1), "参": (100, 1, 1)}
    )
    ja = spark.createDataFrame(
        [(0, "日本人参のサラダ"), (1, "日本の話"), (2, "english only")],
        "doc_id long, content string",
    )
    s3 = IndexSearcher(
        build_index(
            spark, ja, IndexConfig(doc_id_col="doc_id", docs_per_segment=4, analyzer=lat)
        )
    )
    print("== lattice CJK: word-level query 人参 (only decodable by cost) ==")
    s3.search(Q.TermQuery("content", "人参"), k=3).show(truncate=False)

    # 4. Numeric collation: value order, not codepoint order
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    key = collation_key_udf(numeric=True)
    print("== numeric collation: first 6 nations by key ==")
    nat.select("n_name").orderBy(key(F.col("n_name"))).show(6, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
