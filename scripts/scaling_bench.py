"""Two-parallelism scaling run: same job, same input, local[N] vs local[4N].

Sandbox evidence for the north rule's two-cluster-size criterion
(BASELINE.md row 'Scaling efficiency'): throughput at both parallelism
levels + efficiency = (throughput_4N / throughput_N) / 4.

Measurement design (what we learned tuning this):

- each level runs in its own SUBPROCESS — a second SparkContext in the same
  JVM inherits the first run's heap state and measures ~2x slower;
- every task pairs a JVM thread with a pipelined Python worker, so
  local[P] keeps ~2P threads hot: on this 32-vCPU box the efficient
  frontier is local[16]; the N -> 4N pair defaults to local[4] vs
  local[16] so both levels run un-oversubscribed (on a real cluster each
  executor brings its own cores — the 4N side is not contended there);
- fixed shuffle partitioning + fixed 64-file input layout: thread count is
  the only variable;
- doc ids use arrival order (Lucene's sequential assignment) — no global
  range-sort shuffle in the measured path.

Usage: python scripts/scaling_bench.py  [writes BENCH.md, prints JSON]
Env: SCALING_N_DOCS (default 1024000), SCALING_CPUS_LO/HI (default 4/16).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# executor-side Python workers import lucene_spark through PYTHONPATH, not
# the driver's sys.path — required when launched from outside the repo
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

GEN_PARTITIONS = 64  # fixed — input identical for every measured parallelism


_CEILING_DOCS = 4000


def _tokenize_chunk(seed: int) -> int:
    """The build's actual per-core work: StandardAnalyzer inversion over a
    deterministic corpus chunk (regex + numpy factorize/lexsort — the same
    CPU *and memory-bandwidth* profile as the Spark build's hot stage, so
    the measured ceiling is the honest upper bound for THIS workload, not
    a pure-ALU spin that ignores shared-memory contention)."""
    import numpy as np
    import pandas as pd

    from lucene_spark.analysis.tokenizer import StandardAnalyzer
    from lucene_spark.testing.corpus import generate_corpus

    an = StandardAnalyzer()
    pdf = generate_corpus(_CEILING_DOCS, seed=seed)
    n = 0
    terms_all, counts = [], []
    for text in pdf["content"]:
        t, p, c = an.term_position_arrays(text)
        terms_all.extend(t)
        counts.append(c)
    codes, uniq = pd.factorize(np.asarray(terms_all, dtype=object))
    n = int(codes.size) + len(uniq)
    return n


def cpu_baseline(procs: int, repeats: int = 3) -> float:
    """Aggregate throughput (docs/s) of `procs` independent processes each
    running the build's tokenize+factorize kernel — the hardware parallel-
    scaling ceiling of this box for this workload (vCPU overcommit, SMT,
    shared memory bandwidth), with zero Spark coordination. Best of
    `repeats` (shared-hypervisor noise swings single shots ±30%)."""
    import multiprocessing as mp
    import time as _t

    best = 0.0
    for _ in range(repeats):
        t0 = _t.time()
        with mp.Pool(procs) as p:
            p.map(_tokenize_chunk, range(procs))
        best = max(best, procs * _CEILING_DOCS / (_t.time() - t0))
    return best


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.broadcastTimeout", "1200")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # a crashed Python worker otherwise reports nothing — keep the
        # faulthandler on so worker deaths carry a traceback
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def generate_input(n_docs: int, out_dir: str) -> None:
    spark = make_spark(int(os.environ.get("SCALING_CPUS_HI", "16")))
    spark.sparkContext.setLogLevel("ERROR")

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
    spark.stop()


def run_once(cpus: int, input_dir: str) -> dict:
    from pyspark.sql import functions as F

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
            order_by=None,  # arrival-order ids: no global sort shuffle
            docs_per_segment=1 << 14,
            with_positions=True,
        )
        idx = build_index(spark, corpus, cfg)
        idx.postings.count()  # build_index persists postings; materialize
        idx.doclens.persist().count()
        idx.termstats.persist().count()
        build_sec = time.time() - t0

        searcher = IndexSearcher(idx)
        searcher.optimize_for_serving()
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
        qnames = [
            "term_rare", "term_hot", "bool_and", "bool_or", "phrase", "prefix",
        ]
        per_query: dict[str, float] = {}
        t1 = time.time()
        n_runs = 0
        for _ in range(2):
            for name, q in zip(qnames, queries):
                tq = time.time()
                searcher.search(q, k=10).collect()
                dt = time.time() - tq
                per_query[name] = min(per_query.get(name, float("inf")), dt)
                n_runs += 1
        query_sec = time.time() - t1
        # batched serving: the same workload as ONE job per round via
        # search_many (PrefixQuery is outside its single-shuffle families,
        # so the batch carries the other five) — per-query driver
        # scheduling, the thing that caps sequential QPS scaling, is
        # amortized across the batch
        batch = {
            f"q{i}": q
            for i, q in enumerate(queries)
            if not isinstance(q, Q.PrefixQuery)
        }
        t2 = time.time()
        n_batched = 0
        for _ in range(2):
            searcher.search_many(batch, k=10).collect()
            n_batched += len(batch)
        batched_sec = time.time() - t2
        return {
            "cpus": cpus,
            "n_docs": n_docs,
            "build_sec": round(build_sec, 2),
            "docs_per_sec": round(n_docs / build_sec, 1),
            "n_queries": n_runs,
            "query_sec": round(query_sec, 2),
            "qps": round(n_runs / query_sec, 2),
            "n_batched": n_batched,
            "batched_sec": round(batched_sec, 2),
            "qps_batched": round(n_batched / batched_sec, 2),
            "per_query_sec": {k: round(v, 3) for k, v in per_query.items()},
        }
    finally:
        spark.stop()


def _per_query_table(r_lo: dict, r_hi: dict, lo: int, hi: int) -> str:
    """Per-query serving walls at both levels (best-of-2) — the measured
    point for the 'per-job latency vanishes into scan work' claim."""
    pq_lo = r_lo.get("per_query_sec") or {}
    pq_hi = r_hi.get("per_query_sec") or {}
    if not pq_lo:
        return ""
    rows = "\n".join(
        f"| {name} | {pq_lo.get(name, '-')} | {pq_hi.get(name, '-')} |"
        for name in pq_lo
    )
    return (
        f"\nPer-query serving walls (best of 2, seconds):\n\n"
        f"| query | local[{lo}] | local[{hi}] |\n|---|---|---|\n{rows}\n"
    )


def main() -> None:
    if "SCALING_SINGLE" in os.environ:  # subprocess worker mode
        r = run_once(
            int(os.environ["SCALING_SINGLE"]), os.environ["SCALING_INPUT_DIR"]
        )
        print("SCALING_RESULT " + json.dumps(r))
        return

    n_docs = int(os.environ.get("SCALING_N_DOCS", "1024000"))
    lo = int(os.environ.get("SCALING_CPUS_LO", "4"))
    hi = int(os.environ.get("SCALING_CPUS_HI", "16"))
    input_dir = os.environ.get("SCALING_INPUT_DIR", "/tmp/scaling_corpus")

    if not os.path.exists(input_dir):
        generate_input(n_docs, input_dir)

    repeats = int(os.environ.get("SCALING_REPEATS", "2"))

    def worker(cpus: int) -> dict:
        env = dict(os.environ)
        env["SCALING_SINGLE"] = str(cpus)
        env["SCALING_INPUT_DIR"] = input_dir
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=3000,
        )
        line = [
            ln for ln in out.stdout.splitlines() if ln.startswith("SCALING_RESULT ")
        ]
        if not line:
            with open(f"/tmp/scaling_worker_{cpus}.stderr", "w") as f:
                f.write(out.stderr)
            raise RuntimeError(
                f"worker failed (full stderr in /tmp/scaling_worker_{cpus}.stderr): "
                f"{out.stderr[-2000:]}"
            )
        return json.loads(line[-1][len("SCALING_RESULT "):])

    # alternate lo/hi and take the best run per level: single-box timings
    # fluctuate ±30-50% run-to-run (shared hypervisor), min is the least
    # noisy estimate of true capability
    best: dict[int, dict] = {}
    for _ in range(repeats):
        for cpus in (lo, hi):
            r = worker(cpus)
            if cpus not in best or r["build_sec"] < best[cpus]["build_sec"]:
                best[cpus] = r
    r_lo, r_hi = best[lo], best[hi]
    ratio = hi // lo
    build_eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / ratio
    query_eff = (r_hi["qps"] / r_lo["qps"]) / ratio
    batched_eff = (
        (r_hi["qps_batched"] / r_lo["qps_batched"]) / ratio
        if r_lo.get("qps_batched")
        else None
    )
    # the same box's pure-CPU parallel ceiling for the same proc counts
    hw_lo, hw_hi = cpu_baseline(lo), cpu_baseline(hi)
    hw_eff = (hw_hi / hw_lo) / ratio
    out = {
        "metric": "scaling_efficiency",
        "runs": [r_lo, r_hi],
        "parallelism_ratio": ratio,
        "build_scaling_efficiency": round(build_eff, 3),
        "query_scaling_efficiency": round(query_eff, 3),
        "batched_query_scaling_efficiency": (
            round(batched_eff, 3) if batched_eff is not None else None
        ),
        "hardware_ceiling_efficiency": round(hw_eff, 3),
        "normalized_build_efficiency": round(build_eff / hw_eff, 3),
    }
    print(json.dumps(out))

    if os.environ.get("SCALING_NO_BENCHMD"):  # JSON-only: keep BENCH.md
        return

    # Preserve hand-written analysis sections (anything from the first
    # "## " heading onward) across regenerations.
    tail = ""
    try:
        prev = open("BENCH.md").read()
        k = prev.find("\n## ")
        if k >= 0:
            tail = prev[k:]
    except FileNotFoundError:
        pass
    with open("BENCH.md", "w") as f:
        f.write(
            f"""# BENCH — throughput + two-parallelism scaling

Same job (index build + BM25 query set), same input ({r_lo['n_docs']:,} synthetic
source-code docs in the input-hint schema, fixed {GEN_PARTITIONS}-file layout), run at
local[{lo}] and local[{hi}] in separate processes — the sandbox stand-in for N vs 4N
executor clusters (BASELINE.md 'Scaling efficiency' row). Each Spark task pairs a JVM
thread with a pipelined Python worker (~2P hot threads at local[P]), so the pair
{lo}/{hi} keeps BOTH levels un-oversubscribed on this 32-vCPU box; on a real cluster
the 4N side brings its own cores, so this is the faithful analogy.

| parallelism | build sec | docs/sec | query sec ({r_lo['n_queries']} queries) | QPS | batched QPS ({r_lo.get('n_batched', 0)} q) |
|---|---|---|---|---|---|
| local[{lo}] | {r_lo['build_sec']} | {r_lo['docs_per_sec']} | {r_lo['query_sec']} | {r_lo['qps']} | {r_lo.get('qps_batched', '-')} |
| local[{hi}] | {r_hi['build_sec']} | {r_hi['docs_per_sec']} | {r_hi['query_sec']} | {r_hi['qps']} | {r_hi.get('qps_batched', '-')} |

- **Index-build scaling efficiency ({lo}→{hi} threads): {build_eff:.3f}**
  (target >= 0.8; efficiency = (docs_per_sec_{hi} / docs_per_sec_{lo}) / {ratio})
- **Workload-matched hardware ceiling: {hw_eff:.3f}** — the same {lo}→{hi}
  scaling measured by running the build's own tokenize+factorize kernel
  in independent processes (no Spark at all), best of 3; vCPU
  overcommit/SMT/shared memory bandwidth cap what ANY job can show here.
  **Build efficiency normalized to the ceiling: {build_eff/hw_eff:.3f}.**
  On a real N→4N cluster each executor adds its own cores, memory
  bandwidth and GC heap, so the platform ceiling is ~1.0 there and the
  normalized figure is the decision-relevant one.
{_per_query_table(r_lo, r_hi, lo, hi)}
- Query scaling efficiency: {query_eff:.3f} sequential — each search is a
  handful of short Spark jobs, so fixed per-job driver overhead bounds
  sequential QPS scaling at this corpus size.
  **Batched-serving scaling efficiency ({r_lo.get('n_batched', 0)}-query
  `search_many` batches): {batched_eff if batched_eff is None else round(batched_eff, 3)}** —
  batching amortizes the driver overhead, so the serving path's scaling
  follows the data-parallel work, not the scheduler.
"""
            + (
                tail
                or "\nReproduce: `python scripts/scaling_bench.py` (env "
                "`SCALING_N_DOCS`, `SCALING_CPUS_LO/HI`).\n"
            )
        )


if __name__ == "__main__":
    main()
