"""Two-parallelism scaling for the PIPELINE ops: minhash-LSH dedup,
the composed curation pipeline, and the NN-descent k-NN graph build.

Same methodology as scripts/scaling_bench.py (the build-path evidence for
BASELINE.md's 'Scaling efficiency' row): each parallelism level runs in
its own SUBPROCESS over the SAME fixed-layout input; efficiency =
(throughput_hi / throughput_lo) / (hi / lo). Defaults local[4] vs
local[16] keep both levels un-oversubscribed on a 32-vCPU box (each Spark
task pairs a JVM thread with a pipelined Python worker).

Inputs (generated once, keyed by directory):
- text corpus: PSB_N_DOCS synthetic source-code docs (input-hint schema),
  fixed 64-file layout — minhash_lsh_pairs + curate_corpus run over it;
- embeddings: PSB_N_VECS deterministic 64-dim unit vectors —
  build_knn_graph runs over it with seed_planes = log2(N/256) so seed
  buckets stay ~256 (the knob the op's docstring prescribes at scale).

Usage: python scripts/pipeline_scaling_bench.py   [prints ONE JSON line]
Env: PSB_N_DOCS (default 1024000), PSB_N_VECS (default 131072),
     PSB_CPUS_LO/HI (default 4/16), PSB_REPEATS (default 2),
     PSB_TEXT_DIR / PSB_VEC_DIR (defaults under /tmp, keyed by name only —
     use fresh dirs when changing sizes).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

GEN_PARTITIONS = 64


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"pipeline-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", "128")
        # AQE ON (the production serving config): the LSH bucket
        # self-joins and NN-descent candidate joins are skew-prone on
        # clustered embeddings, and skew-split is exactly what keeps the
        # heavy tasks from serializing a level. Identical config at both
        # levels — thread count stays the only variable.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.broadcastTimeout", "1200")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def ensure_text(n_docs: int, out_dir: str, cpus: int) -> None:
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from lucene_spark.testing.corpus import generate_corpus

    per_part = n_docs // GEN_PARTITIONS

    def gen(batches):
        for pdf in batches:
            for pid in pdf["id"]:
                out = generate_corpus(per_part, seed=42 + int(pid))
                out["doc_id"] = out.index + int(pid) * per_part
                yield out[["doc_id", "content"]]

    (
        spark.range(GEN_PARTITIONS)
        .repartition(GEN_PARTITIONS, "id")
        .mapInPandas(gen, schema="doc_id long, content string")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    spark.stop()


def ensure_vecs(n_vecs: int, out_dir: str, cpus: int, dim: int = 64) -> None:
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    per_part = n_vecs // GEN_PARTITIONS

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for pid in pdf["id"]:
                rng = np.random.default_rng(1234 + int(pid))
                # mildly clustered unit vectors: 64 centers + noise, the
                # shape LSH/NN-descent seeding is designed for
                centers = np.random.default_rng(7).standard_normal((64, dim))
                idx = rng.integers(0, 64, size=per_part)
                v = centers[idx] + 0.35 * rng.standard_normal((per_part, dim))
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(per_part, dtype=np.int64)
                        + int(pid) * per_part,
                        "embedding": [row.astype("float32").tolist() for row in v],
                    }
                )

    (
        spark.range(GEN_PARTITIONS)
        .repartition(GEN_PARTITIONS, "id")
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    spark.stop()


def run_once(cpus: int) -> dict:
    from lucene_spark.pipeline import dedup, graph_ann
    from lucene_spark.pipeline.curate import curate_corpus

    text_dir = os.environ["PSB_TEXT_DIR"]
    vec_dir = os.environ["PSB_VEC_DIR"]
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        ops = os.environ.get("PSB_OPS", "minhash,curation,graph").split(",")
        docs = spark.read.parquet(text_dir)
        n_docs = docs.count()
        emb = spark.read.parquet(vec_dir)
        n_vecs = emb.count()
        seed_planes = max(4, int(math.log2(max(n_vecs, 512) / 256)))
        out: dict = {"cpus": cpus, "n_docs": n_docs, "n_vecs": n_vecs}

        if "minhash" in ops:
            t = time.time()
            out["minhash_pairs"] = dedup.minhash_lsh_pairs(
                docs, text_col="content", num_perm=16, bands=4
            ).count()
            out["minhash_sec"] = round(time.time() - t, 2)

        if "curation" in ops:
            t = time.time()
            out["curation_rows"] = curate_corpus(docs, text_col="content").count()
            out["curation_sec"] = round(time.time() - t, 2)

        if "graph" in ops:
            t = time.time()
            g = graph_ann.build_knn_graph(
                emb, id_col="vec_id", k_graph=8, dim=64, seed_planes=seed_planes
            )
            out["graph_edges"] = g.count()
            out["graph_sec"] = round(time.time() - t, 2)
            out["seed_planes"] = seed_planes
        return out
    finally:
        spark.stop()


def main() -> None:
    if "PSB_SINGLE" in os.environ:  # subprocess worker mode
        print("PSB_RESULT " + json.dumps(run_once(int(os.environ["PSB_SINGLE"]))))
        return

    n_docs = int(os.environ.get("PSB_N_DOCS", "1024000"))
    n_vecs = int(os.environ.get("PSB_N_VECS", "131072"))
    lo = int(os.environ.get("PSB_CPUS_LO", "4"))
    hi = int(os.environ.get("PSB_CPUS_HI", "16"))
    repeats = int(os.environ.get("PSB_REPEATS", "2"))
    text_dir = os.environ.setdefault("PSB_TEXT_DIR", "/tmp/psb_text")
    vec_dir = os.environ.setdefault("PSB_VEC_DIR", "/tmp/psb_vecs")

    ensure_text(n_docs, text_dir, hi)
    ensure_vecs(n_vecs, vec_dir, hi)

    def worker(cpus: int) -> dict:
        env = dict(os.environ)
        env["PSB_SINGLE"] = str(cpus)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=5400,
        )
        lines = [
            ln for ln in out.stdout.splitlines() if ln.startswith("PSB_RESULT ")
        ]
        if not lines:
            with open(f"/tmp/psb_worker_{cpus}.stderr", "w") as f:
                f.write(out.stderr)
            raise RuntimeError(
                f"worker failed (stderr in /tmp/psb_worker_{cpus}.stderr): "
                f"{out.stderr[-2000:]}"
            )
        return json.loads(lines[-1][len("PSB_RESULT "):])

    # alternate lo/hi, keep the best (min wall) per level per op
    best: dict[int, dict] = {}
    for _ in range(repeats):
        for cpus in (lo, hi):
            r = worker(cpus)
            print(f"PSB_PARTIAL {json.dumps(r)}", file=sys.stderr, flush=True)
            if cpus not in best:
                best[cpus] = r
            else:
                for k in ("minhash_sec", "curation_sec", "graph_sec"):
                    if k in r:
                        best[cpus][k] = min(best[cpus][k], r[k])
    r_lo, r_hi = best[lo], best[hi]
    ratio = hi // lo
    effs = {
        op: round((r_lo[f"{op}_sec"] / r_hi[f"{op}_sec"]) / ratio, 3)
        for op in ("minhash", "curation", "graph")
        if f"{op}_sec" in r_lo
    }
    print(
        json.dumps(
            {
                "metric": "pipeline_scaling_efficiency",
                "runs": [r_lo, r_hi],
                "parallelism_ratio": ratio,
                "efficiency": effs,
            }
        )
    )


if __name__ == "__main__":
    main()
