"""Benchmark decontamination — n-gram exact-overlap removal.

The GPT-3 appendix-C / Gopher §A.3 protocol every serious training-data
pipeline runs: given a benchmark/eval table, flag (and drop) any training
document that shares at least one word 13-gram with any benchmark
document.  Re-expressed Spark-first:

- benchmark side: explode each eval doc into its distinct 13-gram hashes
  (``dedup.h60`` — md5-derived, so a DuckDB oracle reproduces it
  bit-exactly).  Benchmark suites are small (10^3-10^6 docs → a few
  million grams), so this side is **broadcast** by default: the join
  against the training grams is then map-side, and the full training
  n-gram stream never shuffles;
- training side: the same explode is map-side (no shuffle); only the
  *matching* rows — a tiny fraction of any honest corpus — reach the
  per-doc aggregation, whose key (doc_id) is dense and uniform;
- at 100 TB the plan is: scan → explode → broadcast-hash-join → groupBy
  on the match survivors.  If the benchmark side is genuinely huge, pass
  ``broadcast=False`` and the join degrades to a sort-merge on the
  uniform 60-bit gram hash (no skew by construction).

Shingling reuses :func:`lucene_spark.pipeline.dedup.shingles` (docs
shorter than n contribute their whole token stream as one gram, so a
verbatim short benchmark answer still matches a verbatim short doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.pipeline.dedup import h60, shingles

__all__ = ["benchmark_ngrams", "contamination_report", "decontaminate"]

#: the published protocol's n (GPT-3 used 13-gram overlap; Gopher likewise)
DEFAULT_N = 13


def _gram_hashes(
    docs: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(doc_id, gh) — distinct 60-bit hashes of the doc's word n-grams."""
    return (
        shingles(docs, text_col=text_col, id_col=id_col, shingle_size=n)
        .select("doc_id", h60(F.col("shingle")).alias("gh"))
        .distinct()
    )


def benchmark_ngrams(
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_N,
) -> DataFrame:
    """(bench_id, gh) — the distinct n-gram hash set of the benchmark
    table.  Materialize/cache this once and reuse it across every
    training shard: the benchmark side is fixed while the corpus streams.
    """
    return _gram_hashes(bench, text_col, id_col, n).withColumnRenamed(
        "doc_id", "bench_id"
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    n: int = DEFAULT_N,
    broadcast: bool = True,
) -> DataFrame:
    """Per contaminated training doc: (doc_id, n_hits, n_bench_docs).

    ``n_hits``       = distinct training n-grams that appear anywhere in
                       the benchmark set (a gram shared with two bench
                       docs counts once);
    ``n_bench_docs`` = distinct benchmark documents sharing at least one
                       n-gram with this doc (the "which evals does this
                       leak" signal).

    Docs with no overlap are absent — a left join against the corpus (or
    :func:`decontaminate`'s anti-join) is the caller's choice of shape.
    """
    # NO distinct on the training side: that would shuffle the full gram
    # stream before the join — countDistinct below dedups the (tiny)
    # match survivors instead, so training grams stay map-side
    tg = shingles(docs, text_col=text_col, id_col=id_col, shingle_size=n).select(
        "doc_id", h60(F.col("shingle")).alias("gh")
    )
    bg = benchmark_ngrams(
        bench, bench_text_col or text_col, bench_id_col or id_col, n
    )
    if broadcast:
        bg = F.broadcast(bg)
    return (
        tg.join(bg, "gh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gh").alias("n_hits"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    n: int = DEFAULT_N,
    broadcast: bool = True,
) -> DataFrame:
    """The training table with every contaminated document removed
    (anti-join on the contamination report's doc_id — all original
    columns survive)."""
    rep = contamination_report(
        docs,
        bench,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        bench_id_col=bench_id_col,
        n=n,
        broadcast=broadcast,
    ).select(F.col("doc_id").alias("_contam_id"))
    if broadcast:
        rep = rep.hint("broadcast")
    return docs.join(rep, docs[id_col] == rep["_contam_id"], "left_anti")
