"""Graph-based approximate nearest-neighbor search (the HNSW role).

The reference's vector index is an HNSW graph
(``codecs/lucene99/Lucene99HnswVectorsFormat.java:82``,
``util/hnsw/HnswGraphBuilder.java``, ``util/hnsw/HnswGraphSearcher.java:40``)
because graph search reaches high recall at a small, data-independent
candidate budget — hyperplane LSH cannot do that on weakly-clustered
embeddings (measured on this corpus: top-10 neighbors sit at mean cosine
~0.30, per-plane agreement ~0.60, so an 8-plane bucket retains <2% of true
neighbors; reaching recall 0.9 via probing would touch ~2/3 of the corpus).

Spark-native re-expression, split the way a 100 TB deployment splits it:

- **Offline graph build** (``build_knn_graph``): a k-NN graph via
  NN-descent (Dong et al., WWW'11) — LSH-bucketed seed edges from a few
  salted coarse tables, then rounds of neighbor-of-neighbor expansion with
  exact fixed-point cosine scoring and per-node top-``k_graph`` pruning.
  Every round is joins + one window agg; candidate volume is
  O(N * k_graph^2) per round regardless of data size per partition.
- **Batched beam search** (``graph_search_topk``): all queries advance one
  beam step per Spark job — frontier ⋈ graph edges ⋈ corpus vectors,
  dedup against visited, keep top-``beam`` per query. The per-query work
  is O(beam * k_graph * iters) scored candidates, independent of corpus
  size — the property that makes graph ANN the scale path. Queries are
  broadcast; the only shuffled relation is the frontier-edge join keyed by
  node id. While the graph + quantized vectors fit a broadcast
  (auto-gated at ``local_kernel_max`` rows), the SAME search runs as a
  single Arrow pass with the graph in executor RAM
  (``_graph_search_local``) — the reference's own serving shape (HNSW is
  served from RAM per searcher), bit-identical to the join plan and ~6x
  faster at toy scale because the ``iters`` sequential job barriers
  collapse into one job.

All similarity arithmetic is 2^20 fixed-point int64 (``dedup.quantize``)
with (cosine desc, id asc) tie-breaks, so builds and searches are
bit-deterministic across partitionings and parallelism levels.

Recall@10 vs brute force is measured in
``tests/test_pipeline.py::test_graph_ann_recall_vs_brute_force`` (>= 0.9 at
the documented beam/iters on the sf0.01 embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.pipeline.dedup import cosine_from_int, int_dot, quantize
from lucene_spark.pipeline.partitioning import spread
from lucene_spark.pipeline.similarity import _plane_weight

__all__ = ["build_knn_graph", "graph_search_topk"]


def _vectors(df: DataFrame, id_col: str, vec_col: str, id_out: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(id_out),
        quantize(F.col(vec_col)).alias(f"qv_{id_out}"),
    ).withColumn(f"n_{id_out}", int_dot(F.col(f"qv_{id_out}"), F.col(f"qv_{id_out}")))


def _salted_bucket(qv, dim: int, n_planes: int, salt: str):
    """Hyperplane bucket with salted md5 plane weights (independent tables)."""
    bits = []
    for p in range(n_planes):
        w = F.array(
            *[F.lit(_plane_weight(f"{salt}{p}", i)).cast("long") for i in range(dim)]
        )
        s = F.aggregate(
            F.zip_with(qv, w, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(s >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _score_pairs(
    pairs: DataFrame, vecs: DataFrame, broadcast_vecs: bool = False
) -> DataFrame:
    """(src, dst) -> (src, dst, cosine) by joining both sides' vectors.

    ``broadcast_vecs=True`` ships the vector table as a broadcast hash
    join on BOTH sides — the candidate-pair frame (the big side: 10-100x
    more rows than vectors, each about to grow two vector columns) then
    never shuffles for the lookup. Measured effect at 65k vectors /
    1M-scale pairs: shuffle spill drops ~6x and the 4->16-thread scaling
    efficiency of the graph build recovers from disk-bandwidth-bound
    (see BENCH.md). Callers flip it off above the broadcast budget
    (build_knn_graph's auto mode) — at 10^9 vectors the shuffle join is
    the right plan again and AQE picks the strategy per stage."""
    s = vecs.select(
        F.col("id_node").alias("src"),
        F.col("qv_id_node").alias("qv_s"),
        F.col("n_id_node").alias("n_s"),
    )
    d = vecs.select(
        F.col("id_node").alias("dst"),
        F.col("qv_id_node").alias("qv_d"),
        F.col("n_id_node").alias("n_d"),
    )
    if broadcast_vecs:
        s, d = F.broadcast(s), F.broadcast(d)
    return (
        pairs.join(s, "src")
        .join(d, "dst")
        .select(
            "src",
            "dst",
            cosine_from_int(
                int_dot(F.col("qv_s"), F.col("qv_d")), F.col("n_s"), F.col("n_d")
            ).alias("cosine"),
        )
    )


def _prune_topk(edges: DataFrame, k_graph: int) -> DataFrame:
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        edges.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k_graph)
        .drop("_r")
    )


def _bucket_local_topk(bucketed: DataFrame, k_graph: int) -> DataFrame:
    """All-pairs top-``k_graph`` WITHIN each LSH seed bucket, computed where
    the bucket lives (``applyInPandas`` + one numpy matmul per bucket) so
    candidate PAIR rows never enter a shuffle.

    The SQL seed path materializes ~N*B pair rows per table (B = bucket
    population) and pushes them through a distinct + a window shuffle; this
    kernel shuffles only the N vector rows (grouped by bucket) and emits at
    most N*k_graph pre-pruned edges — the ~B/k shuffle-volume cut BENCH.md
    names as the graph-build lever. Within one seed table a node sits in
    exactly one bucket, so per-bucket top-k per src IS the table's global
    top-k per src, and the union of per-table top-ks contains the global
    top-k over all tables' pairs (a pair in the global top-k ranks at least
    as high inside the subset one table contributes) — the merged result is
    bit-identical to scoring every distinct pair, pinned by
    ``test_graph_seed_local_topk_bit_identical``.

    Arithmetic matches ``cosine_from_int`` bit-for-bit: the float64 matmul
    is EXACT for the int64 quantized vectors because |component| < 2^23
    keeps every product and 64-term partial sum an integer below 2^53
    (BLAS summation order is then irrelevant — integer addition under
    exact representation is associative), and the final
    ``dot / (sqrt(na) * sqrt(nb))`` uses the same IEEE op order as the
    Column expression. Guarded by an assert; corpora quantized from
    embeddings with |x| < 8.0 are always in range.
    """
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "src": pd.Series(dtype="int64"),
            "dst": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["id_node"].to_numpy(dtype=np.int64)
        qv = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
        assert int(np.abs(qv).max(initial=0)) < (1 << 23), "quantized overflow"
        qf = qv.astype(np.float64)
        dots = qf @ qf.T
        norms = np.sqrt(pdf["n"].to_numpy(dtype=np.int64).astype(np.float64))
        cos = dots / np.outer(norms, norms)
        k = min(k_graph, n - 1)
        not_i = ~np.eye(n, dtype=bool)
        src_out = np.empty(n * k, dtype=np.int64)
        dst_out = np.empty(n * k, dtype=np.int64)
        cos_out = np.empty(n * k, dtype=np.float64)
        for i in range(n):
            cand_ids = ids[not_i[i]]
            cand_cos = cos[i][not_i[i]]
            # (cosine desc, dst asc) — _prune_topk's exact total order
            order = np.lexsort((cand_ids, -cand_cos))[:k]
            lo = i * k
            src_out[lo : lo + k] = ids[i]
            dst_out[lo : lo + k] = cand_ids[order]
            cos_out[lo : lo + k] = cand_cos[order]
        return pd.DataFrame({"src": src_out, "dst": dst_out, "cosine": cos_out})

    return bucketed.groupBy("bucket").applyInPandas(
        per_bucket, schema="src long, dst long, cosine double"
    )


def build_knn_graph(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_graph: int = 8,
    dim: int = 64,
    seed_tables: int = 3,
    seed_planes: int = 4,
    rounds: int = 2,
    broadcast_vectors: bool | None = None,
    seed_local_topk: bool = True,
    rounds_local: bool = True,
) -> DataFrame:
    """Approximate k-NN graph (src, dst, cosine) via NN-descent.

    Seeding: ``seed_tables`` independent salted hyperplane tables at
    ``seed_planes`` planes each; candidate pairs are same-bucket pairs
    (bucket population ~ N / 2^seed_planes — pick seed_planes ~
    log2(N / 256) at scale so seed buckets stay bounded). With
    ``seed_local_topk`` (default) the per-bucket all-pairs scoring + top-k
    happens inside the bucket group (``_bucket_local_topk``) so the O(N*B)
    pair relation never shuffles — bit-identical to the SQL pair path
    (``seed_local_topk=False``), which remains for the A/B pin. Refinement:
    ``rounds`` NN-descent iterations — the undirected closure's
    neighbor-of-neighbor pairs, scored exactly, merged, pruned to
    ``k_graph`` per node (HnswGraphBuilder's role, expressed as joins).

    The result is checkpointed per round (``localCheckpoint``) so the
    iterative lineage never re-executes earlier rounds.
    """
    vecs = _vectors(spread(corpus), id_col, vec_col, "id_node")
    if broadcast_vectors is None:
        # auto: broadcast the vector lookup while it fits executor memory
        # (~2^22 quantized 64-dim rows is ~1-2 GB); beyond that the
        # shuffle join is the right plan
        broadcast_vectors = corpus.count() <= (1 << 22)
    if seed_local_topk:
        # bucket-local kernel: shuffle N vector rows per table, emit
        # <= N*k_graph pre-pruned edges — pair rows never shuffle
        seeds = []
        for t in range(seed_tables):
            bt = vecs.withColumn(
                "bucket",
                _salted_bucket(F.col("qv_id_node"), dim, seed_planes, f"t{t}:"),
            ).select(
                "bucket",
                "id_node",
                F.col("qv_id_node").alias("qv"),
                F.col("n_id_node").alias("n"),
            )
            seeds.append(_bucket_local_topk(bt, k_graph))
        cand = seeds[0]
        for s in seeds[1:]:
            cand = cand.unionByName(s)
        graph = _prune_topk(
            cand.dropDuplicates(["src", "dst"]), k_graph
        ).localCheckpoint()
    else:
        seeds = []
        for t in range(seed_tables):
            b = vecs.withColumn(
                "bucket", _salted_bucket(F.col("qv_id_node"), dim, seed_planes, f"t{t}:")
            ).select(F.col("id_node"), "bucket")
            pairs = (
                b.alias("a")
                .join(b.alias("b"), "bucket")
                .filter(F.col("a.id_node") != F.col("b.id_node"))
                .select(
                    F.col("a.id_node").alias("src"), F.col("b.id_node").alias("dst")
                )
            )
            seeds.append(pairs)
        cand = seeds[0]
        for s in seeds[1:]:
            cand = cand.unionByName(s)
        graph = _prune_topk(
            _score_pairs(cand.distinct(), vecs, broadcast_vectors), k_graph
        ).localCheckpoint()

    round_kernel = None
    if rounds_local and broadcast_vectors and rounds > 0:
        round_kernel = _make_round_kernel(vecs, k_graph)
    for _ in range(rounds):
        und = graph.select("src", "dst").unionByName(
            graph.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        if round_kernel is not None:
            # fused round: ONE shuffle. The candidate stream (existing
            # edges + neighbor-of-neighbor pairs, duplicates included)
            # groups by src and a numpy kernel dedupes, scores against
            # the Python-broadcast vector matrix (same exact float64
            # arithmetic as the seed kernel) and prunes to k_graph —
            # replacing the distinct + score-join + dropDuplicates +
            # window chain (4 shuffles of ~N*k^2 rows) of the SQL path,
            # which remains below for the A/B pin.
            non = (
                und.alias("a")
                .join(und.alias("b"), F.col("a.dst") == F.col("b.src"))
                .filter(F.col("a.src") != F.col("b.dst"))
                .select(F.col("a.src").alias("src"),
                        F.col("b.dst").alias("dst"))
            )
            cand = graph.select("src", "dst").unionByName(non)
            graph = cand.groupBy("src").applyInPandas(
                round_kernel, schema="src long, dst long, cosine double"
            ).localCheckpoint()
            continue
        non = (
            und.alias("a")
            .join(und.alias("b"), F.col("a.dst") == F.col("b.src"))
            .filter(F.col("a.src") != F.col("b.dst"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .distinct()
        )
        merged = graph.unionByName(
            _score_pairs(non, vecs, broadcast_vectors)
        ).dropDuplicates(["src", "dst"])
        graph = _prune_topk(merged, k_graph).localCheckpoint()
    return graph


def _make_round_kernel(vecs: DataFrame, k_graph: int):
    """Per-src NN-descent round kernel with a Python-broadcast vector
    matrix (sorted-id index + int64 matrix + norms). Memory budget is the
    same 2^22-row gate as the JVM-side broadcast (~2 GB matrix); each
    Python worker holds one copy, the price of scoring without a join.
    Bit-identical to the SQL round (pinned by
    ``test_graph_round_local_bit_identical``): float64 products of the
    quantized vectors are exact below 2^53 and the (cosine desc, dst asc)
    order matches ``_prune_topk``."""
    import numpy as np
    import pandas as pd

    pdf = vecs.toPandas()
    order = np.argsort(pdf["id_node"].to_numpy())
    ids_sorted = pdf["id_node"].to_numpy()[order].astype(np.int64)
    mat = np.stack(
        [np.asarray(v, dtype=np.int64) for v in pdf["qv_id_node"]]
    )[order]
    assert int(np.abs(mat).max(initial=0)) < (1 << 23), "quantized overflow"
    matf = mat.astype(np.float64)
    norms = np.sqrt(pdf["n_id_node"].to_numpy()[order].astype(np.float64))
    sc = vecs.sparkSession.sparkContext
    bc = sc.broadcast((ids_sorted, matf, norms))

    def per_src(pdf_g: pd.DataFrame) -> pd.DataFrame:
        ids_s, m, nr = bc.value
        src = int(pdf_g["src"].iloc[0])
        dst = np.unique(pdf_g["dst"].to_numpy(dtype=np.int64))
        dst = dst[dst != src]
        if dst.size == 0:
            return pd.DataFrame(
                {"src": pd.Series(dtype="int64"),
                 "dst": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
        six = int(np.searchsorted(ids_s, src))
        dix = np.searchsorted(ids_s, dst)
        dots = m[dix] @ m[six]
        cos = dots / (nr[dix] * nr[six])
        top = np.lexsort((dst, -cos))[:k_graph]
        return pd.DataFrame(
            {"src": np.full(top.size, src, dtype=np.int64),
             "dst": dst[top], "cosine": cos[top]}
        )

    return per_src


def graph_search_topk(
    graph: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    beam: int = 16,
    iters: int = 4,
    dim: int = 64,
    entry_planes: int = 4,
    exclude_self: bool = True,
    local_kernel: bool | None = None,
    local_kernel_max: int = 1 << 20,
) -> DataFrame:
    """Batched best-first beam search over a k-NN graph.

    Entry points per query: the query's salted-LSH bucket mates (same
    table family as the graph seeds) — a cheap data-dependent start — and
    every iteration expands the current top-``beam`` unexpanded nodes
    through the graph's out-edges, scores new nodes exactly, and re-ranks.
    All queries advance together: each iteration is ONE frontier⋈edges
    join + ONE vector-scoring join, so a 10k-query batch costs the same
    number of Spark jobs as a single query (HnswGraphSearcher.java:40's
    sequential loop, re-expressed batch-parallel).

    Returns (query_id, neighbor_id, cosine, rank) like the other ANN ops.

    ``local_kernel``: run the whole beam search inside ONE Arrow-batched
    pass over the queries, with the graph + quantized vectors shipped as
    a broadcast — the faithful HNSW SERVING shape (the reference serves
    its graph from RAM per searcher; HnswGraphSearcher.java:40), cutting
    the ``iters`` sequential Spark job barriers to a single job. Auto
    mode (None) engages it while the corpus fits the broadcast budget
    (``local_kernel_max`` rows, ~0.5 GB quantized at the default);
    beyond that the iterative join plan above is the scale path. The two
    paths are BIT-IDENTICAL (same entries, same per-round frontier and
    tie-breaks, same fixed-point cosine) — pinned by
    ``tests/test_pipeline.py::test_graph_search_local_kernel_bit_identical``.
    """
    if local_kernel is None:
        local_kernel = corpus.count() <= local_kernel_max
    if local_kernel:
        return _graph_search_local(
            graph, corpus, queries, id_col, vec_col, k, beam, iters, dim,
            entry_planes, exclude_self,
        )
    vecs = _vectors(spread(corpus), id_col, vec_col, "id_node").localCheckpoint()
    q = _vectors(queries, id_col, vec_col, "query_id")

    qb = q.withColumn(
        "bucket", _salted_bucket(F.col("qv_query_id"), dim, entry_planes, "t0:")
    )
    cb = vecs.withColumn(
        "bucket", _salted_bucket(F.col("qv_id_node"), dim, entry_planes, "t0:")
    ).select("id_node", "bucket")
    entry = qb.join(cb, "bucket").select("query_id", F.col("id_node").alias("node"))
    # global fallback entries so empty buckets still converge: the `beam`
    # smallest corpus ids (deterministic; the "entry node" of HNSW's top
    # layer plays this role)
    first = vecs.select(F.col("id_node").alias("node")).orderBy("node").limit(beam)
    entry = entry.unionByName(
        q.select("query_id").crossJoin(F.broadcast(first))
    ).distinct()

    qside = q.select(
        F.col("query_id").alias("qid"),
        F.col("qv_query_id").alias("qv_qid"),
        F.col("n_query_id").alias("n_qid"),
    )

    def score_nodes(cand: DataFrame) -> DataFrame:
        return (
            cand.join(vecs, cand["node"] == vecs["id_node"])
            .join(F.broadcast(qside), F.col("query_id") == F.col("qid"))
            .select(
                "query_id",
                "node",
                cosine_from_int(
                    int_dot(F.col("qv_id_node"), F.col("qv_qid")),
                    F.col("n_id_node"),
                    F.col("n_qid"),
                ).alias("cosine"),
            )
        )

    visited = (
        score_nodes(entry).withColumn("expanded", F.lit(False)).localCheckpoint()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("node"))
    for _ in range(iters):
        frontier = (
            visited.filter(~F.col("expanded"))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= beam)
            .select("query_id", "node")
        )
        edges = (
            frontier.join(graph, frontier["node"] == graph["src"])
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
        )
        fresh = edges.join(
            visited.select("query_id", "node"), ["query_id", "node"], "left_anti"
        )
        visited = (
            visited.join(
                frontier.withColumn("_f", F.lit(True)), ["query_id", "node"], "left"
            )
            .withColumn("expanded", F.col("expanded") | F.col("_f").isNotNull())
            .drop("_f")
            .unionByName(score_nodes(fresh).withColumn("expanded", F.lit(False)))
            .localCheckpoint()
        )

    out = visited
    if exclude_self:
        out = out.filter(F.col("node") != F.col("query_id"))
    return (
        out.withColumn("rank", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("node"))
        ))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("node").alias("neighbor_id"), "cosine", "rank")
    )


def _graph_search_local(
    graph: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    beam: int,
    iters: int,
    dim: int,
    entry_planes: int,
    exclude_self: bool,
) -> DataFrame:
    """Broadcast beam-search kernel: one mapInPandas pass over the
    queries replays graph_search_topk's exact iteration — same salted
    entry buckets, same top-``beam`` (cosine desc, id asc) frontier,
    same visited/fresh bookkeeping — in numpy int64/float64, which
    reproduces the SQL fixed-point cosine bit-for-bit (integer dots are
    exact below 2^53; the float64 divide/sqrt chain is the same IEEE op
    order)."""
    import numpy as np

    spark = corpus.sparkSession

    vp = _vectors(corpus, id_col, vec_col, "id_node").toPandas()
    ids = vp["id_node"].to_numpy(dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    Q = np.array(vp["qv_id_node"].tolist(), dtype=np.int64)[order]
    Ns = vp["n_id_node"].to_numpy(dtype=np.int64)[order]
    id_to_idx = {int(v): i for i, v in enumerate(ids)}

    ep = graph.select("src", "dst").toPandas()
    adj: dict = {}
    for s_, d_ in zip(ep["src"].to_numpy(), ep["dst"].to_numpy()):
        si = id_to_idx.get(int(s_))
        di = id_to_idx.get(int(d_))
        if si is not None and di is not None:
            adj.setdefault(si, []).append(di)
    adj = {kk: tuple(set(v)) for kk, v in adj.items()}

    W = np.array(
        [
            [_plane_weight(f"t0:{p}", i) for i in range(dim)]
            for p in range(entry_planes)
        ],
        dtype=np.int64,
    )
    pbits = (1 << np.arange(entry_planes, dtype=np.int64))
    buckets = ((Q @ W.T) >= 0) @ pbits
    bucket_map: dict = {}
    for i, b in enumerate(buckets):
        bucket_map.setdefault(int(b), []).append(i)
    first_idx = tuple(range(min(beam, len(ids))))  # smallest ids post-sort

    bc = spark.sparkContext.broadcast(
        (ids, Q, Ns, adj, bucket_map, first_idx, W, pbits)
    )

    q = _vectors(queries, id_col, vec_col, "query_id")

    def run(batches):
        import pandas as pd

        ids, Q, Ns, adj, bucket_map, first_idx, W, pbits = bc.value
        sN = np.sqrt(Ns.astype(np.float64))
        for pdf in batches:
            rows = []
            for qid, qv_l, nq in zip(
                pdf["query_id"], pdf["qv_query_id"], pdf["n_query_id"]
            ):
                qid = int(qid)
                qv = np.asarray(qv_l, dtype=np.int64)
                snq = np.sqrt(np.float64(int(nq)))
                qb = int(((qv @ W.T) >= 0) @ pbits)

                def score(ix):
                    dots = (Q[ix] @ qv).astype(np.float64)
                    return dots / (sN[ix] * snq)

                cand = sorted(set(bucket_map.get(qb, ())) | set(first_idx))
                idxs = np.asarray(cand, dtype=np.int64)
                visited: dict = {}
                for i2, c2 in zip(idxs, score(idxs)):
                    visited[int(i2)] = [float(c2), False]
                for _ in range(iters):
                    unexp = [
                        (c, i2) for i2, (c, e) in visited.items() if not e
                    ]
                    unexp.sort(key=lambda t: (-t[0], ids[t[1]]))
                    fresh = set()
                    for _, fidx in unexp[:beam]:
                        visited[fidx][1] = True
                        for d2 in adj.get(fidx, ()):
                            if d2 not in visited:
                                fresh.add(d2)
                    if fresh:
                        fi = np.asarray(sorted(fresh), dtype=np.int64)
                        for i2, c2 in zip(fi, score(fi)):
                            visited[int(i2)] = [float(c2), False]
                out = [(int(ids[i2]), c) for i2, (c, _) in visited.items()]
                if exclude_self:
                    out = [(n2, c) for n2, c in out if n2 != qid]
                out.sort(key=lambda t: (-t[1], t[0]))
                for r, (n2, c) in enumerate(out[:k], 1):
                    rows.append((qid, n2, c, r))
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "cosine", "rank"]
            )

    return q.mapInPandas(
        run, "query_id long, neighbor_id long, cosine double, rank int"
    )
