"""IVF-flat approximate nearest neighbor: a coarse k-means quantizer over
fixed-point vectors, then exact search inside the probed inverted lists.

The third ANN strategy next to hyperplane LSH (`pipeline/similarity.py`)
and the k-NN graph (`pipeline/graph_ann.py`) — the classic
inverted-file layout: cluster the corpus into ``k_centroids`` cells,
store each cell's member list, and at query time scan only the
``n_probes`` nearest cells. Fills the same role as FAISS's IndexIVFFlat
and complements the reference's HNSW
(``codecs/lucene99/Lucene99HnswVectorsFormat.java:82``) with a layout
whose build is pure shuffles — no iterative graph refinement.

Everything is DETERMINISTIC and integer-exact so a DuckDB oracle
reproduces results bit-for-bit:

- vectors quantize to int64 fixed point (2^20, `dedup.quantize`);
- seeds are the ``k_centroids`` vectors with the smallest
  (md5-derived h60(vec_id), vec_id) — pseudo-random but reproducible;
- assignment minimizes integer squared L2 ``sum((v-c)^2)`` with ties to
  the lower centroid id (64 dims x (2^21)^2 < 2^48, no overflow);
- centroid update is the per-dimension mean, truncated toward zero via
  an exact double quotient (sums < 2^53, so the division is exact in
  IEEE double on both engines);
- a fixed ``n_iters`` of Lloyd iterations (no convergence test — the
  plan must be static); empty cells simply drop out.

Scale shape: centroids are tiny (k x d longs) and BROADCAST to both the
assignment cross join and the probe step, so each Lloyd iteration is one
broadcast join + one (centroid, dim) shuffle of partial sums — map-side
combined, never a corpus-wide re-shuffle. The final search joins each
query's probed cells against the cell-keyed member table: candidates =
members of n_probes cells, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.pipeline.dedup import cosine_from_int, h60, int_dot, quantize
from lucene_spark.pipeline.partitioning import spread

__all__ = ["ivf_fit", "ivf_topk"]


def _sq_l2(a, b):
    """Integer squared L2 between two array<long> columns (codegen fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _nearest(vectors: DataFrame, cents: DataFrame, out: str, keep: int = 1) -> DataFrame:
    """Attach the ``keep`` nearest centroids (sq-L2 asc, centroid_id asc)
    to each (id, qv) row; ``out`` names the rank column's id alias."""
    d = vectors.crossJoin(F.broadcast(cents)).withColumn(
        "_dist", _sq_l2(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("_id").orderBy(F.asc("_dist"), F.asc("centroid_id"))
    ranked = d.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= keep)
    return ranked.select("_id", "qv", F.col("centroid_id").alias(out), "_rk")


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids: per-dimension truncated mean of the assigned vectors
    (one (centroid, dim) shuffle, map-side combined)."""
    dims = assigned.select(
        F.col("cell").alias("centroid_id"), F.posexplode("qv").alias("i", "v")
    )
    sums = dims.groupBy("centroid_id", "i").agg(
        F.sum("v").alias("s"), F.count("*").alias("n")
    )
    return (
        sums.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("i", "s", "n"))).alias("a"))
        .select(
            "centroid_id",
            F.transform(
                "a", lambda x: (x["s"].cast("double") / x["n"]).cast("long")
            ).alias("cv"),
        )
    )


def ivf_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_centroids: int = 16,
    n_iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Fit the coarse quantizer. Returns ``(cells, cents)``:
    cells = (vec_id, cell, qv) — every corpus vector's inverted-list key;
    cents = (centroid_id, cv: array<long>) — the final centroids."""
    vecs = spread(emb).select(
        F.col(id_col).alias("_id"), quantize(F.col(vec_col)).alias("qv")
    )
    vecs = vecs.persist()
    # seed pick is orderBy+limit — Spark's TakeOrderedAndProject (per-
    # partition heap + tiny driver merge), NOT a global window sort; the
    # row_number below ranks only the k_centroids surviving rows
    seeds = (
        vecs.withColumn("_h", h60(F.col("_id").cast("string")))
        .orderBy(F.asc("_h"), F.asc("_id"))
        .limit(k_centroids)
    )
    seed_w = Window.orderBy(F.asc("_h"), F.asc("_id"))
    cents = seeds.withColumn("_sr", F.row_number().over(seed_w)).select(
        (F.col("_sr") - 1).alias("centroid_id"), F.col("qv").alias("cv")
    )
    for _ in range(n_iters):
        assigned = _nearest(vecs, cents, out="cell").select("_id", "qv", "cell")
        cents = _update(assigned)
    cells = _nearest(vecs, cents, out="cell").select(
        F.col("_id").alias(id_col), F.col("cell"), F.col("qv")
    )
    return cells, cents


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    k_centroids: int = 16,
    n_probes: int = 4,
    n_iters: int = 2,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact cosine top-k inside the
    ``n_probes`` nearest inverted lists per query, self excluded. Same
    output shape as the other ANN strategies."""
    cells, cents = ivf_fit(emb, id_col, vec_col, k_centroids, n_iters)
    qv = queries.select(
        F.col(id_col).alias("_id"), quantize(F.col(vec_col)).alias("qv")
    )
    probes = _nearest(qv, cents, out="cell", keep=n_probes).select(
        F.col("_id").alias("query_id"), F.col("qv").alias("q_qv"), "cell"
    )
    cand = probes.join(cells, "cell").filter(F.col("query_id") != F.col(id_col))
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_from_int(
            int_dot(F.col("q_qv"), F.col("qv")),
            int_dot(F.col("q_qv"), F.col("q_qv")),
            int_dot(F.col("qv"), F.col("qv")),
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
