"""Two-parallelism scaling run: same job, same input, local[N] vs local[4N].

Sandbox evidence for the north rule's two-cluster-size criterion
(BASELINE.md row 'Scaling efficiency'): throughput at both parallelism
levels + efficiency = (throughput_4N / throughput_N) / 4.

The input is a deterministic synthetic source-code corpus in the
input-hint schema (repo, path, commit, lang, content), generated ONCE
into a fixed partition layout (64 files — independent of the measured
parallelism) so both runs read identical bytes.

Usage: python scripts/scaling_bench.py  [writes BENCH.md, prints JSON]
Env: SCALING_N_DOCS (default 100000), SCALING_CPUS_LO/HI (default 8/32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import StructType

GEN_PARTITIONS = 64  # fixed — input identical for every measured parallelism


def generate_input(spark: SparkSession, n_docs: int, out_dir: str) -> None:
    import pandas as pd

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


def make_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-bench-{cpus}")
        # fixed task granularity across parallelism levels: thread count is
        # the ONLY variable between the two runs (cluster-size analogy)
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_once(cpus: int, input_dir: str) -> dict:
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import IndexSearcher

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        corpus = spark.read.parquet(input_dir)
        n_docs = corpus.count()

        t0 = time.time()
        cfg = IndexConfig(
            text_col="content",
            field_name="content",
            docs_per_segment=1 << 14,
            with_positions=True,
        )
        idx = build_index(spark, corpus, cfg)
        idx.postings.persist()
        idx.postings.count()
        idx.doclens.persist().count()
        idx.termstats.persist().count()
        build_sec = time.time() - t0

        searcher = IndexSearcher(idx)
        queries = [
            Q.TermQuery("content", "indexwriter"),
            Q.TermQuery("content", "return"),
            Q.BooleanQuery.of(
                must=[Q.TermQuery("content", "merge"), Q.TermQuery("content", "flush")]
            ),
            Q.BooleanQuery.of(
                should=[Q.TermQuery("content", "if"), Q.TermQuery("content", "hash")]
            ),
            Q.PhraseQuery("content", ("if", "return")),
            Q.PrefixQuery("content", "get"),
        ]
        t1 = time.time()
        n_runs = 0
        for _ in range(2):
            for q in queries:
                searcher.search(q, k=10).collect()
                n_runs += 1
        query_sec = time.time() - t1
        return {
            "cpus": cpus,
            "n_docs": n_docs,
            "build_sec": round(build_sec, 2),
            "docs_per_sec": round(n_docs / build_sec, 1),
            "n_queries": n_runs,
            "query_sec": round(query_sec, 2),
            "qps": round(n_runs / query_sec, 2),
        }
    finally:
        spark.stop()


def main() -> None:
    n_docs = int(os.environ.get("SCALING_N_DOCS", "100000"))
    lo = int(os.environ.get("SCALING_CPUS_LO", "8"))
    hi = int(os.environ.get("SCALING_CPUS_HI", "32"))
    input_dir = os.environ.get("SCALING_INPUT_DIR", "/tmp/scaling_corpus")

    if not os.path.exists(input_dir):
        gen_spark = make_spark(hi)
        gen_spark.sparkContext.setLogLevel("ERROR")
        generate_input(gen_spark, n_docs, input_dir)
        gen_spark.stop()

    r_lo = run_once(lo, input_dir)
    r_hi = run_once(hi, input_dir)
    ratio = hi // lo
    build_eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / ratio
    query_eff = (r_hi["qps"] / r_lo["qps"]) / ratio
    out = {
        "metric": "scaling_efficiency",
        "runs": [r_lo, r_hi],
        "parallelism_ratio": ratio,
        "build_scaling_efficiency": round(build_eff, 3),
        "query_scaling_efficiency": round(query_eff, 3),
    }
    print(json.dumps(out))

    with open("BENCH.md", "w") as f:
        f.write(
            f"""# BENCH — throughput + two-parallelism scaling

Same job (index build + BM25 query set), same input ({r_lo['n_docs']:,} synthetic
source-code docs in the input-hint schema, fixed {GEN_PARTITIONS}-file layout), run at
local[{lo}] and local[{hi}] — the sandbox stand-in for N vs 4N executor clusters
(BASELINE.md 'Scaling efficiency' row).

| parallelism | build sec | docs/sec | query sec ({r_lo['n_queries']} queries) | QPS |
|---|---|---|---|---|
| local[{lo}] | {r_lo['build_sec']} | {r_lo['docs_per_sec']} | {r_lo['query_sec']} | {r_lo['qps']} |
| local[{hi}] | {r_hi['build_sec']} | {r_hi['docs_per_sec']} | {r_hi['query_sec']} | {r_hi['qps']} |

- **Index-build scaling efficiency ({lo}→{hi} threads): {build_eff:.3f}**
  (target >= 0.8; efficiency = (docs_per_sec_{hi} / docs_per_sec_{lo}) / {ratio})
- Query scaling efficiency: {query_eff:.3f} — query latency at this corpus size is
  dominated by fixed per-job driver overhead (each search is a handful of
  sub-second Spark jobs), so QPS is expected to be flat across thread counts;
  the throughput-bound phase (index build) is the scaling-relevant measure.

Reproduce: `python scripts/scaling_bench.py` (env `SCALING_N_DOCS`,
`SCALING_CPUS_LO/HI`).
"""
        )


if __name__ == "__main__":
    main()
