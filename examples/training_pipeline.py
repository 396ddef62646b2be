"""End-to-end training-data pipeline demo: dedup -> cluster -> keep-list,
plus quality filtering and ANN neighbors over embeddings.

The flow a 100 TB pretraining-corpus job runs, at toy scale:

    spark-submit --py-files lucene_spark.zip examples/training_pipeline.py \
        [documents_parquet] [embeddings_parquet]

With no args it reads the driver-generated testdata at sf0.001. Every
stage is a JVM-codegen DataFrame plan (see the module docstrings in
``lucene_spark/pipeline/`` for the scale design of each).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    spark = (
        SparkSession.builder.appName("lucene-spark-pipeline-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from lucene_spark.pipeline import dedup, graph_ann, text as textops

    docs_path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    emb_path = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001/embeddings.parquet"
    docs = spark.read.parquet(docs_path)
    n_in = docs.count()

    # 1. exact dedup: drop byte-identical copies, keep the smallest doc_id
    groups = dedup.exact_duplicate_groups(docs, text_col="text")
    keep_exact = groups.select(F.col("min_doc_id").alias("doc_id"))
    docs1 = docs.join(F.broadcast(keep_exact), "doc_id", "left_semi")

    # 2. near-dedup: MinHash LSH candidates -> connected components ->
    #    one representative per duplicate cluster
    pairs = dedup.minhash_lsh_pairs(docs1, text_col="text", num_perm=16, bands=4)
    clusters = dedup.duplicate_clusters(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs2 = docs1.join(F.broadcast(drop), "doc_id", "left_anti")

    # 3. quality gate: language-model-style heuristics, keep the top band
    scored = textops.quality_scores(docs2, text_col="text")
    kept = docs2.join(
        scored.filter(F.col("quality") >= 0.5).select("doc_id"), "doc_id", "left_semi"
    )
    n_kept = kept.count()
    print(f"docs: {n_in} -> exact-dedup {docs1.count()} -> near-dedup "
          f"{docs2.count()} -> quality-gate {n_kept}")

    # 4. round-5 curation stages: sub-document dedup, PII scrub,
    #    benchmark decontamination, mixture weights, packing assignment
    from lucene_spark.pipeline import decontam, dedup as dd, mixing, packing

    para = dd.paragraph_dedup(kept, text_col="text")
    n_para_removed = para.agg(F.sum("n_removed")).collect()[0][0]
    scrubbed = textops.scrub_pii(kept, text_col="text")
    n_pii = scrubbed.selectExpr(
        "sum(n_email + n_ipv4 + n_phone)"
    ).collect()[0][0]
    bench = kept.filter(F.col("doc_id") % 37 == 0)
    clean = decontam.decontaminate(kept, bench, text_col="text")
    mixed = mixing.mix_sources(kept, {"src3": 0.5, "src7": 2.0})
    packs = packing.pack_sequences(kept, seq_len=256, group_col="source")
    n_seq = packs.agg(F.max("seq_last")).collect()[0][0]
    print(
        f"paragraph-dedup removed {n_para_removed} paragraphs; "
        f"PII redactions {n_pii}; decontaminated {kept.count() - clean.count()} "
        f"docs vs a {bench.count()}-doc benchmark; mixture rows {mixed.count()}; "
        f"packed into ~{(n_seq or 0) + 1} sequences/group max"
    )

    # 5. ANN neighbors over embeddings (graph ANN — the HNSW role):
    #    index-time k-NN graph, then batched beam search for 4 queries
    emb = spark.read.parquet(emb_path)
    g = graph_ann.build_knn_graph(emb, id_col="vec_id", k_graph=8, dim=64)
    g = g.persist()
    g.count()
    nn = graph_ann.graph_search_topk(
        g, emb, emb.limit(4), id_col="vec_id", k=5, beam=16, iters=4, dim=64
    )
    print("ANN neighbors (4 queries, k=5):")
    nn.show(20, False)
    g.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
