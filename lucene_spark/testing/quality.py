"""IR-quality harness: precision/recall/AP per topic, MAP over the run.

The distributed re-expression of the reference's quality benchmark
(``benchmark/.../quality/QualityBenchmark.java``; judging
``quality/trec/TrecJudge.java:31``; metrics ``quality/QualityStats.java``):
ranked results x qrels -> per-query P@k / recall / average precision as one
window-function plan, MAP as the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["evaluate_run", "mean_average_precision"]


def evaluate_run(
    results: DataFrame, qrels: DataFrame, k: int = 10
) -> DataFrame:
    """Per-query metrics.

    results: (query_id, doc_id, rank)  — rank 1-based, one run per query
    qrels:   (query_id, doc_id)       — the relevant set
    returns: (query_id, n_rel, n_ret, n_rel_ret, p_at_k, recall, ap)
    """
    rel = qrels.select("query_id", "doc_id", F.lit(1).alias("_rel"))
    n_rel = qrels.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    j = results.join(rel, ["query_id", "doc_id"], "left").na.fill({"_rel": 0})
    w = Window.partitionBy("query_id").orderBy("rank")
    j = j.withColumn("hits_at", F.sum("_rel").over(w))
    # precision at each relevant hit = hits_at / rank; AP = sum / n_rel
    per_q = j.groupBy("query_id").agg(
        F.count("*").alias("n_ret"),
        F.sum("_rel").alias("n_rel_ret"),
        F.sum(
            F.when(F.col("_rel") == 1, F.col("hits_at") / F.col("rank")).otherwise(
                0.0
            )
        ).alias("_ap_num"),
        F.sum(
            F.when(F.col("rank") <= k, F.col("_rel")).otherwise(0)
        ).alias("_rel_at_k"),
    )
    return (
        per_q.join(n_rel, "query_id", "left")
        .na.fill({"n_rel": 0})
        .select(
            "query_id",
            "n_rel",
            "n_ret",
            "n_rel_ret",
            (F.col("_rel_at_k") / F.lit(float(k))).alias("p_at_k"),
            F.when(
                F.col("n_rel") > 0, F.col("n_rel_ret") / F.col("n_rel")
            ).otherwise(0.0).alias("recall"),
            F.when(
                F.col("n_rel") > 0, F.col("_ap_num") / F.col("n_rel")
            ).otherwise(0.0).alias("ap"),
        )
    )


def mean_average_precision(results: DataFrame, qrels: DataFrame, k: int = 10) -> float:
    row = evaluate_run(results, qrels, k).agg(F.avg("ap").alias("map")).collect()[0]
    return float(row["map"] or 0.0)
