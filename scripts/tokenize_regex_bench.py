"""Microbench: JVM tokenize cost of the CJK-aware token pattern vs the
pre-CJK pattern, over the sf0.1 documents corpus.

The build's JVM front-end spends most of its CPU in regexp_extract_all
(analysis/sql.py sql_tokens); the scaling number in BENCH.md depends on
that kernel's speed. The CJK-aware pattern adds four alternatives AFTER
the common word-run rule (mutually exclusive on the first character, so
results are identical on non-CJK text); this script quantifies the
remaining cost. Run alone on an idle box:

    python scripts/tokenize_regex_bench.py
"""

import os
import time

from pyspark.sql import SparkSession, functions as F

OLD_SEP_L = r"(?<=[^\W\d])[.:'’](?=[^\W\d])"
OLD_SEP_D = r"(?<=\d)[.,'’](?=\d)"
OLD_PATTERN = rf"(?U)\w+(?:(?:{OLD_SEP_L}|{OLD_SEP_D})\w+)*"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from lucene_spark.analysis.sql import TOKEN_PATTERN_JAVA, sql_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    docs.persist().count()

    def run(expr) -> float:
        best = float("inf")
        for _ in range(3):
            t = time.time()
            docs.agg(F.sum(F.size(expr)).alias("n")).collect()
            best = min(best, time.time() - t)
        return best

    def pat(pattern: str):
        return F.regexp_extract_all(F.lower(F.col("text")), F.lit(pattern), F.lit(0))

    run(pat(OLD_PATTERN))  # JIT warm-up for the whole pipeline shape
    t_old = run(pat(OLD_PATTERN))
    t_cjk = run(pat(TOKEN_PATTERN_JAVA))
    t_disp = run(sql_tokens(F.col("text")))
    print(
        f"old={t_old:.3f}s cjk_always={t_cjk:.3f}s dispatched={t_disp:.3f}s "
        f"(dispatch overhead vs old: {100*(t_disp/t_old-1):.1f}%)"
    )


if __name__ == "__main__":
    main()
