"""End-to-end demo: index a source-code corpus, run queries, inspect scores.

The IndexFiles + SearchFiles pair from the reference demo
(``lucene/demo/src/java/org/apache/lucene/demo/``) re-expressed as one
spark-submit-able script:

    zip -qr lucene_spark.zip lucene_spark
    spark-submit --py-files lucene_spark.zip examples/index_and_search.py \
        [corpus_parquet_dir] [index_out_dir]

(``--py-files`` ships a .zip/.egg to every executor's PYTHONPATH — a bare
package directory is not accepted by spark-submit.)

With no args it generates a small deterministic synthetic corpus.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    spark = (
        SparkSession.builder.appName("lucene-spark-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from lucene_spark.index.build import IndexConfig, build_index, load_index
    from lucene_spark.search.explain import explain
    from lucene_spark.search.queryparser import QueryParser
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import IndexSearcher

    if len(sys.argv) > 1:
        corpus = spark.read.parquet(sys.argv[1])
    else:
        from lucene_spark.testing.corpus import generate_corpus

        corpus = spark.createDataFrame(generate_corpus(2000, seed=7))

    cfg = IndexConfig(text_col="content", field_name="content")
    index_dir = sys.argv[2] if len(sys.argv) > 2 else None
    idx = build_index(spark, corpus, cfg, index_dir=index_dir)
    print("fieldstats:", idx.fieldstats)

    searcher = IndexSearcher(idx)
    parser = QueryParser("content")
    for qs in [
        "indexwriter",
        "merge AND flush",
        '"if return"',
        "get*",
        "+term -hash",
    ]:
        q = parser.parse(qs)
        print(f"\n=== {qs!r} -> {q}")
        searcher.search(q, k=5).show(5, truncate=False)

    # the "never throws" human syntax (SimpleQueryParser): same engine,
    # error-tolerant input
    from lucene_spark.search.simple_queryparser import SimpleQueryParser

    sp = SimpleQueryParser(field="content")
    for qs in ['merge + (flush | commit) -deprecated', '"if return"~2 get*']:
        q = sp.parse(qs)
        print(f"\n=== simple {qs!r} -> {q}")
        searcher.search(q, k=5).show(5, truncate=False)

    hit = searcher.search(Q.TermQuery("content", "return"), k=1).collect()
    if hit:
        e = explain(searcher, Q.TermQuery("content", "return"), int(hit[0]["doc_id"]))
        print("explain:", {k: e[k] for k in ("score", "idf", "freq", "decoded_doc_len")})

    spark.stop()


if __name__ == "__main__":
    main()
