"""Hot-term disjunction benchmark: plain one-shuffle OR vs the MAXSCORE
essential/non-essential pruned path (``searcher._disjunction_topk_essential``,
reference ``search/MaxScoreBulkScorer.java:28-70``).

The fixture is the deterministic Zipfian source-code corpus
(``lucene_spark/testing/corpus.py``) at a scale where postings decode
dominates query wall time — the regime the pruned path is built for. Both
clauses ("the", "if" — Zipf ranks 1 and 2) are present in nearly every
document with varying tf and doc length, so scores have real variance
(unlike duplicated-text fixtures, whose flat score distributions are
un-prunable by ANY impact-ordered strategy — the cost guard falls back
there by design).

Run: ``python scripts/hot_or_bench.py``. Env:
- ``HOT_N_DOCS``   corpus size (default 400000)
- ``HOT_INPUT_DIR`` corpus parquet dir (default keyed by size under /tmp)
- ``HOT_CPUS``     local[] parallelism (default 32)

Prints ONE JSON line with plain vs pruned wall times (median of 3) and the
prune stats; recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GEN_PARTITIONS = 64


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hot-or-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def generate_input(spark, n_docs: int, out_dir: str) -> None:
    from lucene_spark.testing.corpus import generate_corpus

    per_part = n_docs // GEN_PARTITIONS

    def gen(batches):
        for pdf in batches:
            for pid in pdf["id"]:
                yield generate_corpus(per_part, seed=42 + int(pid))

    schema = "repo string, path string, commit string, lang string, content string"
    (
        spark.range(GEN_PARTITIONS)
        .repartition(GEN_PARTITIONS, "id")
        .mapInPandas(gen, schema=schema)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def median_time(fn, runs: int = 3) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main() -> None:
    n_docs = int(os.environ.get("HOT_N_DOCS", "400000"))
    input_dir = os.environ.get("HOT_INPUT_DIR", f"/tmp/hot_or_corpus_{n_docs}")
    cpus = int(os.environ.get("HOT_CPUS", "32"))

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if not os.path.exists(input_dir):
            generate_input(spark, n_docs, input_dir)

        from pyspark.sql import functions as F  # noqa: F401

        from lucene_spark.index.build import IndexConfig, build_index
        from lucene_spark.search import query as Q
        from lucene_spark.search.searcher import IndexSearcher

        corpus = spark.read.parquet(input_dir)
        t0 = time.time()
        cfg = IndexConfig(
            text_col="content",
            field_name="content",
            order_by=None,
            docs_per_segment=1 << 16,
        )
        idx = build_index(spark, corpus, cfg)
        idx.postings.count()
        build_sec = time.time() - t0

        searcher = IndexSearcher(idx)
        searcher.optimize_for_serving()
        # two hot shapes: stopword OR stopword (worst case for any
        # impact-ordered strategy — flat tiny weights) and stopword OR
        # mid-frequency term (the textbook MAXSCORE case: the stopword
        # clause is demoted and its postings are probed, not iterated)
        shapes = {
            "the_or_if": ("the", "if"),
            "the_or_merge": ("the", "merge"),
        }
        out = {
            "n_docs": n_docs,
            "cpus": cpus,
            "build_sec": round(build_sec, 1),
        }
        # PRODUCTION gate (PRUNE_MIN_DF = 1<<16): the clauses are hot
        # enough that the two-phase path engages without test overrides
        pruned = IndexSearcher(idx)
        pruned.preload_stats()
        # serving layout: hot-term block metadata in driver memory — the
        # pruned paths then spend zero jobs on metadata/guard counts
        n_meta = pruned.preload_block_meta()
        out["preloaded_terms"] = n_meta
        for name, (ta, tb) in shapes.items():
            q_or = Q.BooleanQuery.of(
                should=[Q.TermQuery("content", ta), Q.TermQuery("content", tb)]
            )
            # warm both paths (JIT + cache locality), then median-of-3 each
            plain_rows = searcher.search(q_or, k=10, prune=False).collect()
            t_plain = median_time(
                lambda: searcher.search(q_or, k=10, prune=False).collect()
            )
            pruned.collect_prune_stats = True
            pruned_rows = pruned.search(q_or, k=10).collect()
            stats = dict(pruned.last_prune_stats or {})
            pruned.collect_prune_stats = False  # stats jobs out of timing
            t_pruned = median_time(lambda: pruned.search(q_or, k=10).collect())
            out[name] = {
                "plain_sec": round(t_plain, 3),
                "pruned_sec": round(t_pruned, 3),
                "speedup": round(t_plain / t_pruned, 2),
                "identical_topk": [
                    (r["doc_id"], r["score"]) for r in plain_rows
                ]
                == [(r["doc_id"], r["score"]) for r in pruned_rows],
                "prune_stats": stats,
            }
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
