"""Driver-contract entries for the training-data pipeline operators.

Every Spark plan here has a bit-exact DuckDB oracle: all hashing is
md5-derived (``dedup.h60``), all similarity arithmetic runs on 2^20
fixed-point int64 dot products, and all floating-point post-processing is
restricted to IEEE-deterministic ops (+ - * / sqrt abs least greatest).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_spark.entry_impl import register
from lucene_spark.pipeline import (
    decontam,
    dedup,
    mixing,
    multimodal,
    packing,
    similarity,
    text,
)

# DuckDB mirror of dedup.h60
def _H(s: str) -> str:
    return f"('0x' || substring(md5({s}), 1, 15))::BIGINT"


#: per-permutation universal-hash constants, identical to dedup._perm_consts
_PERM_AB_ROWS = ",".join(
    "({}, {}, {})".format(i, *dedup._perm_consts(i)) for i in range(16)
)


# shared shingle/minhash CTE chain (num_perm=16, bands=4, shingle=3)
_MINHASH_CTES = f"""
mh_toks AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9_]+') AS tk FROM documents),
mh_sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 3
              THEN list_transform(generate_series(1, len(tk)-2),
                                  i -> array_to_string(tk[i:i+2], ' '))
              ELSE [array_to_string(tk, ' ')] END AS shs
  FROM mh_toks
),
mh_ex AS (SELECT doc_id, unnest(shs) AS shingle FROM mh_sh),
mh_h AS (
  SELECT doc_id,
         ('0x' || substring(md5(shingle), 1, 15))::BIGINT >> 30 AS hi,
         ('0x' || substring(md5(shingle), 1, 15))::BIGINT & 1073741823 AS lo
  FROM mh_ex
),
mh_ab(perm, a, b) AS (VALUES {_PERM_AB_ROWS}),
mh_pr AS (SELECT doc_id, hi, lo, perm, a, b FROM mh_h CROSS JOIN mh_ab),
mh_sig AS (
  SELECT doc_id, perm,
         min(((((a * hi) & 2147483647) << 30) + ((a * hi) >> 31) + a * lo + b)
             % 2305843009213693951) AS minhash
  FROM mh_pr GROUP BY doc_id, perm
)
""".strip()

_LSH_CTES = f"""
{_MINHASH_CTES},
lsh_b AS (
  SELECT doc_id, perm // 4 AS band,
         bit_xor({_H("perm || ':' || minhash")}) AS band_hash
  FROM mh_sig GROUP BY doc_id, perm // 4
),
lsh_ok AS (
  SELECT band, band_hash FROM lsh_b GROUP BY band, band_hash HAVING count(*) <= 1000
),
lsh_b2 AS (SELECT lsh_b.* FROM lsh_b JOIN lsh_ok USING (band, band_hash)),
lsh_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM lsh_b2 a JOIN lsh_b2 b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id
)
""".strip()


# ---- deduplication ---------------------------------------------------------


@register(
    "dedup_exact",
    """SELECT sha256(coalesce(text, '')) AS content_sha256,
       count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc_id
FROM documents GROUP BY 1 ORDER BY content_sha256""",
)
def dedup_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_duplicate_groups(docs, text_col="text")


@register(
    "dedup_minhash_signatures",
    f"WITH {_MINHASH_CTES}\n"
    "SELECT doc_id, perm::BIGINT AS perm, minhash FROM mh_sig ORDER BY doc_id, perm",
)
def dedup_minhash_signatures(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = dedup.minhash_signatures(docs, text_col="text", num_perm=16)
    return sigs.select("doc_id", F.col("perm").cast("long").alias("perm"), "minhash")


@register(
    "dedup_minhash_lsh_pairs",
    f"WITH {_LSH_CTES}\nSELECT id_a, id_b FROM lsh_pairs ORDER BY id_a, id_b",
)
def dedup_minhash_lsh_pairs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(docs, text_col="text", num_perm=16, bands=4)


@register(
    "dedup_ngram_jaccard",
    f"""WITH {_LSH_CTES},
jd_sh AS (SELECT DISTINCT doc_id, shingle FROM mh_ex),
jd_sz AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM jd_sh GROUP BY doc_id),
jd_int AS (
  SELECT p.id_a, p.id_b, count(*)::BIGINT AS n_inter
  FROM lsh_pairs p
  JOIN jd_sh a ON a.doc_id = p.id_a
  JOIN jd_sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
  GROUP BY p.id_a, p.id_b
)
SELECT p.id_a, p.id_b,
       CAST(coalesce(ji.n_inter, 0) AS DOUBLE)
         / CAST(sa.n_sh + sb.n_sh - coalesce(ji.n_inter, 0) AS DOUBLE) AS jaccard
FROM lsh_pairs p
LEFT JOIN jd_int ji ON ji.id_a = p.id_a AND ji.id_b = p.id_b
JOIN jd_sz sa ON sa.doc_id = p.id_a
JOIN jd_sz sb ON sb.doc_id = p.id_b
ORDER BY p.id_a, p.id_b""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, text_col="text", num_perm=16, bands=4)
    return dedup.ngram_jaccard_pairs(docs, pairs, text_col="text")


@register(
    "dedup_duplicate_clusters",
    f"""WITH RECURSIVE {_LSH_CTES},
cc_edges AS (
  SELECT id_a AS src, id_b AS dst FROM lsh_pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM lsh_pairs
),
cc_reach(node, lab) AS (
  SELECT src, src FROM cc_edges
  UNION
  SELECT e.dst, r.lab FROM cc_reach r JOIN cc_edges e ON e.src = r.node
)
SELECT node AS doc_id, min(lab)::BIGINT AS cluster_id
FROM cc_reach GROUP BY node ORDER BY doc_id""",
)
def dedup_duplicate_clusters(spark, sf_dir):
    """Pairs -> connected-component cluster ids (min doc id per component);
    the oracle is an independent transitive-closure recursive CTE over the
    same LSH candidate pairs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, text_col="text", num_perm=16, bands=4)
    return dedup.duplicate_clusters(pairs)


_SIMHASH_CTES = f"""
sim_tf AS (
  SELECT doc_id, tok, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9_]+')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
),
sim_bits AS (
  SELECT doc_id, b, sum(tf * (((th >> b) & 1) * 2 - 1))::BIGINT AS s
  FROM (SELECT doc_id, tf, {_H("tok")} AS th,
               unnest(generate_series(0, 31)) AS b
        FROM sim_tf)
  GROUP BY doc_id, b
),
sim_hash AS (
  SELECT doc_id,
         sum(CASE WHEN s >= 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
  FROM sim_bits GROUP BY doc_id
)
""".strip()


@register(
    "dedup_simhash",
    f"WITH {_SIMHASH_CTES}\nSELECT doc_id, simhash FROM sim_hash ORDER BY doc_id",
)
def dedup_simhash(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash(docs, text_col="text")


@register(
    "dedup_simhash_pairs",
    f"""WITH {_SIMHASH_CTES},
sp_band AS (
  SELECT doc_id, simhash, b AS byte_idx, (simhash >> (b * 8)) & 255 AS byte_val
  FROM sim_hash, unnest(generate_series(0, 3)) t(b)
),
sp_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
  FROM sp_band a JOIN sp_band b USING (byte_idx, byte_val)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM sp_pairs WHERE hamming <= 6 ORDER BY id_a, id_b""",
)
def dedup_simhash_pairs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.simhash_pairs(docs, text_col="text", max_hamming=6).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# quantized-embedding CTEs shared by near-dup + ANN oracles
_EMB_CTES = """
eq AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
  FROM embeddings
),
ee AS (SELECT vec_id, unnest(qv) AS v,
              unnest(generate_series(1, len(qv))) AS i FROM eq),
en AS (SELECT vec_id, sum(v * v)::BIGINT AS nsq FROM ee GROUP BY vec_id)
""".strip()


@register(
    "dedup_embedding_cosine",
    f"""WITH {_EMB_CTES},
ed AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v)::BIGINT AS dot
  FROM ee a JOIN ee b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
ec AS (
  SELECT id_a, id_b,
         CAST(dot AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine
  FROM ed JOIN en na ON na.vec_id = id_a JOIN en nb ON nb.vec_id = id_b
)
SELECT id_a, id_b, cosine FROM ec WHERE cosine >= 0.4 ORDER BY id_a, id_b""",
)
def dedup_embedding_cosine(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return dedup.embedding_near_dup_pairs(emb, threshold=0.4)


# ---- similarity search (ANN) ----------------------------------------------


@register(
    "ann_brute_force_topk",
    f"""WITH {_EMB_CTES},
aq AS (SELECT * FROM eq WHERE vec_id < 8),
ad AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v)::BIGINT AS dot
  FROM ee c JOIN (SELECT vec_id, unnest(qv) AS v,
                         unnest(generate_series(1, len(qv))) AS i FROM aq) q
    ON q.i = c.i AND c.vec_id != q.vec_id
  GROUP BY q.vec_id, c.vec_id
),
ac AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nsq AS DOUBLE)) * sqrt(CAST(nc.nsq AS DOUBLE))) AS cosine
  FROM ad JOIN en nq ON nq.vec_id = query_id JOIN en nc ON nc.vec_id = neighbor_id
),
ar AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC)::INTEGER AS rank
  FROM ac
)
SELECT query_id, neighbor_id, cosine, rank FROM ar WHERE rank <= 5
ORDER BY query_id, rank""",
)
def ann_brute_force_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 8), id_col="vec_id", k=5
    )


_HP_CTES = f"""
hw AS (
  SELECT p, i + 1 AS i, ({_H("p || '#' || i")} % 2001 - 1000) AS w
  FROM (SELECT unnest(generate_series(0, 7)) AS p),
       (SELECT unnest(generate_series(0, 63)) AS i)
),
hb AS (
  SELECT e.vec_id,
         sum(CASE WHEN ps >= 0 THEN (1 << p) ELSE 0 END)::INTEGER AS bucket
  FROM (
    SELECT ee.vec_id, hw.p, sum(ee.v * hw.w)::BIGINT AS ps
    FROM ee JOIN hw ON hw.i = ee.i
    GROUP BY ee.vec_id, hw.p
  ) e
  GROUP BY e.vec_id
)
""".strip()


# ---- filtered KNN through the Query AST (KnnFloatVectorQuery.java:40) ------

_KNN_ORACLE = f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9_]+')) AS term FROM documents
),
tf AS (SELECT DISTINCT doc_id, term FROM tok),
{_EMB_CTES},
kqe AS (SELECT unnest(qv) AS v, unnest(generate_series(1, len(qv))) AS i
        FROM eq WHERE vec_id = 0),
knq AS (SELECT sum(v * v)::BIGINT AS nsq FROM kqe),
kd AS (
  SELECT c.vec_id AS doc_id, sum(c.v * q.v)::BIGINT AS dot
  FROM ee c JOIN kqe q ON q.i = c.i
  WHERE c.vec_id IN (SELECT doc_id FROM tf WHERE term = 'vector')
  GROUP BY c.vec_id
),
kc AS (
  SELECT kd.doc_id,
         CAST(dot AS DOUBLE)
           / (sqrt(CAST(en.nsq AS DOUBLE)) * sqrt(CAST((SELECT nsq FROM knq) AS DOUBLE))) AS score
  FROM kd JOIN en ON en.vec_id = kd.doc_id
)
SELECT doc_id, score FROM kc ORDER BY score DESC, doc_id ASC LIMIT 10"""


@register("knn_vector_filtered", _KNN_ORACLE)
def knn_vector_filtered(spark, sf_dir):
    """Filtered KNN as an index query: docs matching TermQuery('vector')
    are scored exactly against query vector 0 (the reference's
    exact-search fallback over the filter set,
    AbstractKnnVectorQuery.java:89), top-10 by fixed-point cosine."""
    from lucene_spark.entry_impl import get_searcher
    from lucene_spark.search import query as Q

    idx, s = get_searcher(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if idx.vectors is None:
        idx.attach_vectors(emb, id_col="vec_id", vec_col="embedding")
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    q = Q.KnnFloatVectorQuery(
        "vector",
        tuple(float(x) for x in qv),
        k=10,
        filter=Q.TermQuery("text", "vector"),
    )
    return s.search(q, k=10).select("doc_id", "score")


@register(
    "ann_lsh_bucketed_topk",
    f"""WITH {_EMB_CTES},
{_HP_CTES},
lq AS (SELECT vec_id FROM embeddings WHERE vec_id < 32),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM hb q JOIN hb c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
  WHERE q.vec_id IN (SELECT vec_id FROM lq)
),
ld AS (
  SELECT cand.query_id, cand.neighbor_id, sum(a.v * b.v)::BIGINT AS dot
  FROM cand JOIN ee a ON a.vec_id = cand.query_id
            JOIN ee b ON b.vec_id = cand.neighbor_id AND b.i = a.i
  GROUP BY cand.query_id, cand.neighbor_id
),
lc AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine
  FROM ld JOIN en na ON na.vec_id = query_id JOIN en nb ON nb.vec_id = neighbor_id
),
lr AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC)::INTEGER AS rank
  FROM lc
)
SELECT query_id, neighbor_id, cosine, rank FROM lr WHERE rank <= 5
ORDER BY query_id, rank""",
)
def ann_lsh_bucketed_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.hyperplane_bucketed_topk(
        emb, emb.filter(F.col("vec_id") < 32), id_col="vec_id", k=5, dim=64, n_planes=8
    )


_N_PROBES = 4


@register(
    "ann_lsh_multiprobe_topk",
    f"""WITH {_EMB_CTES},
hw AS (
  SELECT p, i + 1 AS i, ({_H("p || '#' || i")} % 2001 - 1000) AS w
  FROM (SELECT unnest(generate_series(0, 7)) AS p),
       (SELECT unnest(generate_series(0, 63)) AS i)
),
hpp AS (
  SELECT ee.vec_id, hw.p, sum(ee.v * hw.w)::BIGINT AS ps
  FROM ee JOIN hw ON hw.i = ee.i
  GROUP BY ee.vec_id, hw.p
),
hbm AS (
  SELECT vec_id,
         sum(CASE WHEN ps >= 0 THEN (1 << p) ELSE 0 END)::INTEGER AS bucket
  FROM hpp GROUP BY vec_id
),
mq AS (SELECT vec_id FROM embeddings WHERE vec_id < 32),
flips AS (
  SELECT vec_id, p,
         row_number() OVER (PARTITION BY vec_id ORDER BY abs(ps) ASC, p ASC) AS rk
  FROM hpp WHERE vec_id IN (SELECT vec_id FROM mq)
),
probes AS (
  SELECT b.vec_id, b.bucket AS probe
  FROM hbm b WHERE b.vec_id IN (SELECT vec_id FROM mq)
  UNION ALL
  SELECT f.vec_id, xor(b.bucket, (1 << f.p))::INTEGER AS probe
  FROM flips f JOIN hbm b USING (vec_id)
  WHERE f.rk <= {_N_PROBES - 1}
),
mcand AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN hbm c ON c.bucket = p.probe AND c.vec_id != p.vec_id
),
md AS (
  SELECT mcand.query_id, mcand.neighbor_id, sum(a.v * b.v)::BIGINT AS dot
  FROM mcand JOIN ee a ON a.vec_id = mcand.query_id
             JOIN ee b ON b.vec_id = mcand.neighbor_id AND b.i = a.i
  GROUP BY mcand.query_id, mcand.neighbor_id
),
mc AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine
  FROM md JOIN en na ON na.vec_id = query_id JOIN en nb ON nb.vec_id = neighbor_id
),
mr AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC)::INTEGER AS rank
  FROM mc
)
SELECT query_id, neighbor_id, cosine, rank FROM mr WHERE rank <= 5
ORDER BY query_id, rank""",
)
def ann_lsh_multiprobe_topk(spark, sf_dir):
    """Multi-probe LSH ANN: own bucket + the 3 smallest-|margin| Hamming-1
    buckets per query — the recall-controlled approximate path (recall
    measured against brute force in tests/test_pipeline.py)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.hyperplane_multiprobe_topk(
        emb, emb.filter(F.col("vec_id") < 32), id_col="vec_id",
        k=5, dim=64, n_planes=8, n_probes=_N_PROBES,
    )


# ---- IVF-flat ANN (pipeline/ivf.py; FAISS IndexIVFFlat role) ---------------
# Deterministic 2-iteration Lloyd over int64 fixed-point vectors: seeds by
# md5 order, integer squared-L2 assignment (ties to lower centroid id),
# truncated-mean updates (exact double quotients) — unrolled below so the
# DuckDB oracle replays the identical k-means.

_IVF_SEEDS = """
ivf_seed AS (
  SELECT vec_id, row_number() OVER (
           ORDER BY ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
                    vec_id) AS r
  FROM eq QUALIFY r <= 16
),
ivf_c0 AS (
  SELECT s.r - 1 AS cid, ee.i, ee.v
  FROM ivf_seed s JOIN ee ON ee.vec_id = s.vec_id
)
""".strip()


def _ivf_iter(n: int, cents_in: str) -> str:
    """One Lloyd iteration: assign to nearest (sq-L2, cid tie-break), then
    truncated-mean centroids — CTEs ivf_a{n} / ivf_c{n}."""
    return f"""
ivf_d{n} AS (
  SELECT ee.vec_id, c.cid, sum((ee.v - c.v) * (ee.v - c.v)) AS dist
  FROM ee JOIN {cents_in} c USING (i) GROUP BY ee.vec_id, c.cid
),
ivf_a{n} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM ivf_d{n}
  ) WHERE rk = 1
),
ivf_c{n} AS (
  SELECT a.cid, ee.i,
         CAST(trunc(CAST(sum(ee.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
  FROM ivf_a{n} a JOIN ee USING (vec_id) GROUP BY a.cid, ee.i
)
""".strip()


@register(
    "ann_ivf_topk",
    f"""WITH {_EMB_CTES},
{_IVF_SEEDS},
{_ivf_iter(1, "ivf_c0")},
{_ivf_iter(2, "ivf_c1")},
ivf_cells AS (
  SELECT vec_id, cid FROM (
    SELECT ee.vec_id, c.cid,
           row_number() OVER (PARTITION BY ee.vec_id
                              ORDER BY sum((ee.v - c.v) * (ee.v - c.v)), c.cid) AS rk
    FROM ee JOIN ivf_c2 c USING (i) GROUP BY ee.vec_id, c.cid
  ) WHERE rk = 1
),
ivf_probes AS (
  SELECT vec_id, cid FROM (
    SELECT ee.vec_id, c.cid,
           row_number() OVER (PARTITION BY ee.vec_id
                              ORDER BY sum((ee.v - c.v) * (ee.v - c.v)), c.cid) AS rk
    FROM ee JOIN ivf_c2 c USING (i)
    WHERE ee.vec_id < 8
    GROUP BY ee.vec_id, c.cid
  ) WHERE rk <= 4
),
ivf_cand AS (
  SELECT p.vec_id AS query_id, m.vec_id AS neighbor_id
  FROM ivf_probes p JOIN ivf_cells m ON m.cid = p.cid AND m.vec_id != p.vec_id
),
ivf_dot AS (
  SELECT c.query_id, c.neighbor_id, sum(a.v * b.v)::BIGINT AS dot
  FROM ivf_cand c JOIN ee a ON a.vec_id = c.query_id
                  JOIN ee b ON b.vec_id = c.neighbor_id AND b.i = a.i
  GROUP BY c.query_id, c.neighbor_id
),
ivf_cos AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE) / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine
  FROM ivf_dot JOIN en na ON na.vec_id = query_id JOIN en nb ON nb.vec_id = neighbor_id
),
ivf_rank AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC)::INTEGER AS rank
  FROM ivf_cos
)
SELECT query_id, neighbor_id, cosine, rank FROM ivf_rank WHERE rank <= 5
ORDER BY query_id, rank""",
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-flat: deterministic coarse k-means (2 Lloyd iterations over
    int64 fixed-point vectors) -> probe the 4 nearest cells per query ->
    exact cosine top-5 inside the probed inverted lists (pipeline/ivf.py;
    the FAISS IndexIVFFlat layout complementing LSH and the k-NN graph)."""
    from lucene_spark.pipeline import ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        id_col="vec_id",
        k=5,
        k_centroids=16,
        n_probes=4,
        n_iters=2,
    )


@register("ann_graph_topk", None)
def ann_graph_topk(spark, sf_dir):
    """Graph ANN (the HNSW role, Lucene99HnswVectorsFormat.java:82):
    NN-descent k-NN graph + batched beam search. Iterative (graph rounds,
    beam steps), so no single-statement SQL oracle — correctness is pinned
    by the measured recall@10 >= 0.9 fixture vs the exact brute-force
    baseline (tests/test_pipeline.py::test_graph_ann_recall_vs_brute_force)
    plus determinism (fixed-point cosines, id tie-breaks)."""
    from lucene_spark.pipeline import graph_ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    graph = graph_ann.build_knn_graph(emb, id_col="vec_id", k_graph=8, dim=64)
    return graph_ann.graph_search_topk(
        graph, emb, emb.filter(F.col("vec_id") < 8), id_col="vec_id",
        k=5, beam=16, iters=4, dim=64,
    )


# ---- scalar-quantized + byte vectors (Lucene99 quantization role) ----------

# float32(1f - defaultCI(64)) — defaultCI = max(0.9f, 1f - 1f/65f)
# (Lucene99ScalarQuantizedVectorsFormat.calculateDefaultConfidenceInterval)
_CI_COMP = "CAST(0.01538461446762085 AS FLOAT)"

_QUANT_CTES = f"""
ev AS (SELECT vec_id, unnest(embedding) AS v,
              unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
qn AS (SELECT count(*)::BIGINT AS n FROM ev),
qsel AS (
  SELECT CAST(trunc(CAST(CAST(CAST(CAST(n AS FLOAT) * {_CI_COMP} AS FLOAT)
      / CAST(2.0 AS FLOAT) AS FLOAT) + CAST(0.5 AS FLOAT) AS FLOAT)) AS BIGINT) AS sel
  FROM qn
),
qsorted AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM ev),
qmm AS (
  SELECT CAST(min(v) AS FLOAT) AS minq, CAST(max(v) AS FLOAT) AS maxq
  FROM qsorted, qsel
  WHERE rn > sel AND rn <= (SELECT n FROM qn) - sel
),
qp AS (
  SELECT minq, maxq,
         CAST(CAST(127.0 AS FLOAT) / CAST(maxq - minq AS FLOAT) AS FLOAT) AS scale,
         CAST(CAST(maxq - minq AS FLOAT) / CAST(127.0 AS FLOAT) AS FLOAT) AS alpha
  FROM qmm
),
qcomp AS (
  SELECT e.vec_id, e.i, e.v,
         CAST(floor(CAST(CAST(p.scale *
             CAST(greatest(p.minq, least(p.maxq, e.v)) - p.minq AS FLOAT)
           AS FLOAT) + CAST(0.5 AS FLOAT) AS FLOAT)) AS BIGINT) AS code,
         p.minq, p.alpha
  FROM ev e CROSS JOIN qp p
),
qterm AS (
  SELECT vec_id, i, code,
         CAST(
           CAST(minq * CAST(v - CAST(minq / CAST(2.0 AS FLOAT) AS FLOAT) AS FLOAT) AS FLOAT)
           + CAST(CAST(CAST(v - minq AS FLOAT) - dxq AS FLOAT) * dxq AS FLOAT)
         AS FLOAT) AS term
  FROM (SELECT *, CAST(CAST(code AS FLOAT) * alpha AS FLOAT) AS dxq FROM qcomp)
),
qvs AS (
  SELECT vec_id,
         list_reduce(list(term ORDER BY i), (a, b) -> CAST(a + b AS FLOAT)) AS corr
  FROM qterm GROUP BY vec_id
)
""".strip()


@register(
    "ann_scalar_quantized_topk",
    f"""WITH {_QUANT_CTES},
qd AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(q.code * c.code)::BIGINT AS dot
  FROM qcomp q JOIN qcomp c ON c.i = q.i AND c.vec_id != q.vec_id
  WHERE q.vec_id < 4
  GROUP BY 1, 2
),
qcm AS (SELECT CAST(alpha * alpha AS FLOAT) AS cm FROM qp),
qsc AS (
  SELECT d.query_id, d.neighbor_id,
         greatest(
           CAST(CAST(CAST(1.0 AS FLOAT) +
             CAST(CAST(CAST(CAST(d.dot AS FLOAT) * qcm.cm AS FLOAT)
                  + qq.corr AS FLOAT) + cc.corr AS FLOAT)
           AS FLOAT) / CAST(2.0 AS FLOAT) AS FLOAT),
           CAST(0.0 AS FLOAT)) AS score
  FROM qd d CROSS JOIN qcm
  JOIN qvs qq ON qq.vec_id = d.query_id
  JOIN qvs cc ON cc.vec_id = d.neighbor_id
),
qr AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC)::INTEGER AS rank
  FROM qsc
)
SELECT query_id, neighbor_id, score, rank FROM qr WHERE rank <= 5
ORDER BY query_id, rank""",
)
def ann_scalar_quantized_topk(spark, sf_dir):
    """Scalar-quantized (int7) exact top-k — the Lucene99 quantized-vectors
    pipeline (ScalarQuantizer quantile fit -> per-vector codes + float32
    corrective offsets -> integer dot + corrected float32 score,
    ScalarQuantizedVectorSimilarity.DotProduct) at the codec's default
    confidence interval max(0.9, 1 - 1/(dim+1)). The oracle re-derives the
    ENTIRE quantizer in SQL (selector-index quantiles, float32 scale/alpha,
    Math.round codes, the sequential float32 correction fold) and matches
    bit-exactly."""
    from lucene_spark.pipeline import quantization as qz

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf, quant = qz.quantize_embeddings(
        emb, confidence_interval=qz.default_confidence_interval(64), bits=7
    )
    queries = qdf.filter(F.col("vec_id") < 4)
    return qz.quantized_topk(qdf, queries, quant, k=5)


@register(
    "ann_byte_vector_topk",
    f"""WITH
bb AS (SELECT vec_id,
              list_transform(embedding,
                             x -> CAST(floor(CAST(x AS DOUBLE) * 127.0) AS BIGINT)) AS bv
       FROM embeddings),
be AS (SELECT vec_id, unnest(bv) AS v,
              unnest(generate_series(1, len(bv))) AS i FROM bb),
bd AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v)::BIGINT AS dot
  FROM be q JOIN be c ON c.i = q.i AND c.vec_id != q.vec_id
  WHERE q.vec_id < 8
  GROUP BY 1, 2
),
bs AS (
  SELECT query_id, neighbor_id,
         CAST(CAST(0.5 AS FLOAT) +
              CAST(CAST(dot AS FLOAT) / CAST(2097152.0 AS FLOAT) AS FLOAT)
         AS FLOAT) AS score
  FROM bd
),
br AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC)::INTEGER AS rank
  FROM bs
)
SELECT query_id, neighbor_id, score, rank FROM br WHERE rank <= 5
ORDER BY query_id, rank""",
)
def ann_byte_vector_topk(spark, sf_dir):
    """KnnByteVectorQuery's scoring surface: int8 vectors under the byte
    DOT_PRODUCT similarity (VectorUtil.dotProductScore:384 —
    0.5f + dot/(dim * 2^15)); exact top-k, integer dots, one float32
    normalization. dim = 64 -> denom 2097152."""
    from lucene_spark.pipeline import quantization as qz

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bv = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(127.0)).cast("int"),
        ).alias("bvec"),
    )
    return qz.byte_vector_topk(
        bv, bv.filter(F.col("vec_id") < 8), dim=64, k=5,
        similarity="dot_product",
    )


# ---- text analysis ---------------------------------------------------------


@register(
    "text_token_stats",
    """SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z0-9_]+'))::BIGINT AS n_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_subwords,
       length(text)::BIGINT AS n_chars
FROM documents ORDER BY doc_id""",
)
def text_token_stats(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st = text.token_stats(docs, text_col="text")
    return st.select(
        "doc_id",
        *[F.col(c).cast("long").alias(c) for c in ("n_ws_tokens", "n_tokens", "n_subwords", "n_chars")],
    )


@register(
    "text_quality_scores",
    """WITH q_base AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[a-z0-9_]+'))::BIGINT AS n_tokens,
         coalesce(list_sum(list_transform(regexp_extract_all(text, '[a-z0-9_]+'),
                           t -> length(t))), 0)::BIGINT AS tok_chars,
         len(list_filter(regexp_extract_all(text, '[a-z0-9_]+'),
             t -> t IN ('the','a','of','to','in','and','is','it')))::BIGINT AS n_stop
  FROM documents
),
q_r AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens > 0 THEN CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS mean_token_len,
         CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio
  FROM q_base
)
SELECT doc_id, n_tokens, mean_token_len, stopword_ratio,
       0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
     + 0.3 * greatest(0.0, 1.0 - abs(mean_token_len - 5.0) / 10.0)
     + 0.3 * (1.0 - abs(stopword_ratio - 0.2)) AS quality
FROM q_r ORDER BY doc_id""",
)
def text_quality_scores(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qs = text.quality_scores(docs, text_col="text")
    return qs.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_token_len",
        "stopword_ratio",
        "quality",
    )


_LANG_VALUES = ", ".join(
    f"('{lang}', '{w}')"
    for lang, words in text.LANG_PROFILES.items()
    for w in words
)


@register(
    "text_language_id",
    f"""WITH li_prof(lang, tok) AS (VALUES {_LANG_VALUES}),
li_toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9_]+')) AS tok FROM documents
),
li_hits AS (
  SELECT t.doc_id, p.lang, count(*)::BIGINT AS hits
  FROM li_toks t JOIN li_prof p USING (tok) GROUP BY t.doc_id, p.lang
),
li_best AS (
  SELECT h.doc_id, m.best_hits, min(h.lang) AS pred_lang
  FROM (SELECT doc_id, max(hits) AS best_hits FROM li_hits GROUP BY doc_id) m
  JOIN li_hits h ON h.doc_id = m.doc_id AND h.hits = m.best_hits
  GROUP BY h.doc_id, m.best_hits
)
SELECT d.doc_id, coalesce(b.pred_lang, 'und') AS pred_lang,
       coalesce(b.best_hits, 0)::BIGINT AS best_hits
FROM documents d LEFT JOIN li_best b USING (doc_id) ORDER BY d.doc_id""",
)
def text_language_id(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    li = text.language_id(docs, text_col="text")
    return li.select("doc_id", "pred_lang", F.col("best_hits").cast("long").alias("best_hits"))


@register(
    "text_fingerprints",
    f"""WITH fp_tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9_]+')) AS tok,
         unnest(generate_series(1, len(regexp_extract_all(text, '[a-z0-9_]+')))) - 1 AS pos
  FROM documents
),
fp AS (
  SELECT doc_id, bit_xor({_H("tok || '@' || pos")}) AS fingerprint
  FROM fp_tok GROUP BY doc_id
)
SELECT d.doc_id, coalesce(fp.fingerprint, 0) AS fingerprint
FROM documents d LEFT JOIN fp USING (doc_id) ORDER BY d.doc_id""",
)
def text_fingerprints(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text.fingerprints(docs, text_col="text")


# ---- benchmark decontamination (GPT-3/Gopher 13-gram protocol) -------------

# benchmark table = every 37th doc (a held-out eval sample drawn from the
# same distribution); the oracle rebuilds the full 13-gram overlap join in
# SQL.  Self-contained: a benchmark doc trivially contaminates itself, and
# true near-verbatim duplicates of benchmark docs get flagged too.
_DCN_CTES = f"""
dcn_toks AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9_]+') AS tk FROM documents),
dcn_g AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 13
              THEN list_transform(generate_series(1, len(tk)-12),
                                  i -> array_to_string(tk[i:i+12], ' '))
              ELSE [array_to_string(tk, ' ')] END AS gs
  FROM dcn_toks
),
dcn_ex AS (SELECT doc_id, unnest(gs) AS g FROM dcn_g),
dcn_h AS (SELECT DISTINCT doc_id, {_H("g")} AS gh FROM dcn_ex),
dcn_bench AS (SELECT doc_id AS bench_id, gh FROM dcn_h WHERE doc_id % 37 = 0),
dcn_hits AS (
  SELECT t.doc_id,
         count(DISTINCT t.gh) AS n_hits,
         count(DISTINCT b.bench_id) AS n_bench_docs
  FROM dcn_h t JOIN dcn_bench b USING (gh)
  GROUP BY t.doc_id
)
""".strip()


@register(
    "decontaminate_13gram",
    f"""WITH {_DCN_CTES}
SELECT d.doc_id,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_bench_docs, 0) AS n_bench_docs,
       (CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END) AS keep
FROM documents d LEFT JOIN dcn_hits h USING (doc_id) ORDER BY d.doc_id""",
)
def decontaminate_13gram(spark, sf_dir):
    """13-gram exact-match decontamination (the GPT-3/Gopher protocol):
    benchmark-side grams broadcast, training grams never shuffle; the
    per-doc report left-joins back so every doc carries its keep flag."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    rep = decontam.contamination_report(docs, bench, text_col="text", n=13)
    return (
        docs.select("doc_id")
        .join(rep, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce(F.col("n_bench_docs"), F.lit(0))
            .cast("long")
            .alias("n_bench_docs"),
            F.when(F.col("n_hits").isNull(), 1).otherwise(0).alias("keep"),
        )
    )


# ---- paragraph-level dedup --------------------------------------------------

# the synthetic corpus is single-line; the pair plants paragraph breaks at
# every ' table ' token (both sides replicate the replace), which yields
# plenty of cross-document exact-duplicate paragraphs in the token soup
_PARA_T_SQL = "replace(coalesce(text, ''), ' table ', chr(10) || chr(10))"


@register(
    "paragraph_dedup_firstseen",
    f"""WITH pdoc AS (
  SELECT doc_id, {_PARA_T_SQL} AS t FROM documents
),
px AS (
  SELECT doc_id,
         unnest(string_split(t, chr(10) || chr(10))) AS para,
         unnest(generate_series(1, len(string_split(t, chr(10) || chr(10))))) - 1 AS pos
  FROM pdoc
),
pr AS (
  SELECT doc_id, para, pos,
         CASE WHEN len(trim(para)) >= 1
              THEN row_number() OVER (PARTITION BY trim(para)
                                      ORDER BY doc_id, pos)
              ELSE 1 END AS rn
  FROM px
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN rn = 1 THEN para END,
                           chr(10) || chr(10) ORDER BY pos), '') AS text_dedup,
       count(*)::BIGINT AS n_paragraphs,
       sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END)::BIGINT AS n_removed
FROM pr GROUP BY doc_id ORDER BY doc_id""",
)
def paragraph_dedup_firstseen(spark, sf_dir):
    """Sub-document exact dedup (the Gopher/RefinedWeb paragraph pass):
    repeated paragraphs survive only at their corpus-wide first
    (doc_id, pos) occurrence; one uniform-key shuffle elects winners.
    The oracle replays the election with an independent window."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.expr(_PARA_T_SQL).alias("text")
    )
    return dedup.paragraph_dedup(docs, min_chars=1)


# ---- PII scrubbing ----------------------------------------------------------

# the synthetic corpus carries no PII, so the pair plants a deterministic
# contact line per doc (both sides replicate the concat) and the scrub
# must find + redact exactly those planted spans
_PII_SUFFIX_SQL = (
    "coalesce(text, '') || ' contact user' || doc_id "
    "|| '@example.com or 10.0.' || (doc_id % 200) || '.7 now'"
)


@register(
    "scrub_pii_counts",
    f"""WITH pii_in AS (
  SELECT doc_id, {_PII_SUFFIX_SQL} AS t FROM documents
),
pii_email AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))::BIGINT AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<PII>', 'g') AS t2
  FROM pii_in
),
pii_ip AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t2, '\\b([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b'))::BIGINT AS n_ipv4,
         regexp_replace(t2, '\\b([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '<PII>', 'g') AS t3
  FROM pii_email
)
SELECT doc_id, t3 AS text_scrubbed, n_email, n_ipv4
FROM pii_ip ORDER BY doc_id""",
)
def scrub_pii_counts(spark, sf_dir):
    """C4-style PII redaction: planted emails + IPv4s are found, counted
    and replaced entirely JVM-side (regexp codegen, no shuffle); the
    oracle replays the same progressive scrub in DuckDB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.expr(_PII_SUFFIX_SQL).alias("text"),
    )
    return text.scrub_pii(
        docs,
        patterns={
            "email": text.PII_PATTERNS["email"],
            "ipv4": text.PII_PATTERNS["ipv4"],
        },
    )


# ---- domain mixing + sequence packing --------------------------------------

#: mixture rates for the driver pair: one subsampled source, one
#: oversampled (2.25 epochs), everything else at the default 1.0
_MIX_RATES = {"src3": 0.5, "src7": 2.25}


@register(
    "domain_mixture_sample",
    f"""WITH mx AS (
  SELECT doc_id, source,
         {_H("doc_id || ':mix'")} AS h,
         (CASE source WHEN 'src3' THEN 0.5 WHEN 'src7' THEN 2.25
               ELSE 1.0 END) AS rate
  FROM documents
),
mr AS (
  SELECT doc_id, source,
         (floor(rate)::BIGINT
          + CASE WHEN h / 1152921504606846976.0 < rate - floor(rate)
                 THEN 1 ELSE 0 END) AS n_rep
  FROM mx
)
SELECT doc_id, source, unnest(generate_series(0, n_rep::INTEGER - 1))::INTEGER AS epoch
FROM mr WHERE n_rep > 0 ORDER BY doc_id, epoch""",
)
def domain_mixture_sample(spark, sf_dir):
    """Deterministic mixture sampling (Pile/GPT-3 mixture-weight role):
    md5-derived uniforms decide subsample keeps and fractional epochs,
    so the selection is reproducible across partitionings and the oracle
    replays it in closed form. Map-side only (broadcast rate table +
    explode) — the one training-order shuffle belongs to the caller."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mixing.mix_sources(docs, _MIX_RATES).select(
        "doc_id", "source", "epoch"
    )


@register(
    "pack_sequences_128",
    """WITH pt AS (
  SELECT source AS "group", doc_id,
         len(regexp_extract_all(text, '[a-z0-9_]+'))::BIGINT AS n_tokens
  FROM documents
),
pc AS (
  SELECT *,
         coalesce(sum(n_tokens) OVER (PARTITION BY "group" ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_offset
  FROM pt
)
SELECT "group", doc_id, n_tokens, start_offset,
       (start_offset // 128)::BIGINT AS seq_first,
       ((start_offset + greatest(n_tokens - 1, 0)) // 128)::BIGINT AS seq_last,
       ((start_offset + greatest(n_tokens - 1, 0)) // 128
        - start_offset // 128 + 1)::BIGINT AS n_seqs
FROM pc ORDER BY "group", doc_id""",
)
def pack_sequences_128(spark, sf_dir):
    """Concat-and-chunk sequence packing (GPT-style loader assignment):
    one window cumsum per pack group (a single shuffle on the group
    key), integer arithmetic end to end; the oracle is the identical
    window in DuckDB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return packing.pack_sequences(docs, seq_len=128, group_col="source")


# ---- multimodal plumbing ---------------------------------------------------

# mirrors multimodal._make_payload + the REAL BMP decode: dimensions and
# frame count are md5-derived; pixel rows alternate v1 (even rows) and v2,
# so the decoded mean intensity has the closed form
# ((ceil(h/2)*v1 + floor(h/2)*v2) / height) / 255
_MM_CTE = f"""
mm AS (
  SELECT doc_id, {_H("coalesce(text, '')")} AS h FROM documents
),
mm_dims AS (
  SELECT doc_id,
         (16 + h % 240)::INTEGER AS width,
         (16 + (h // 256) % 240)::INTEGER AS height,
         (1 + (h // 65536) % 8)::INTEGER AS n_frames,
         (h % 256)::BIGINT AS v1,
         ((h // 16777216) % 256)::BIGINT AS v2
  FROM mm
),
mm_meta AS (
  SELECT doc_id, width, height, n_frames,
         (CAST(((height + 1) // 2) * v1 + (height // 2) * v2 AS DOUBLE)
          / CAST(height AS DOUBLE)) / 255.0 AS mean_intensity
  FROM mm_dims
)
""".strip()


@register(
    "multimodal_image_meta",
    f"WITH {_MM_CTE}\n"
    "SELECT doc_id, width, height, n_frames, mean_intensity FROM mm_meta ORDER BY doc_id",
)
def multimodal_image_meta(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.attach_payload(docs, text_col="text")
    return multimodal.image_meta(media)


# color-JPEG twin: the payload is a REAL chroma-subsampled (4:2:0)
# three-component baseline JPEG per doc (jpeg.py encodes it; image_meta
# Huffman-decodes the interleaved MCUs, IDCTs, upsamples and converts
# YCbCr->RGB).  Dimensions/frames are md5-exact; the decoded mean is
# lossy, so the pair checks it against the closed-form SOURCE mean with a
# 0.02 tolerance (measured max deviation over the banded-constant
# generator is ~0.005 — every 8x8 block is constant, so only DC
# quantization error survives), and the oracle emits the same exact
# dims + an always-1 flag.
_MMC_CTE = f"""
mmc AS (
  SELECT doc_id, {_H("coalesce(text, '')")} AS h FROM documents
),
mmc_dims AS (
  SELECT doc_id,
         (16 + h % 240)::INTEGER AS width,
         (16 + (h // 256) % 240)::INTEGER AS height,
         (1 + (h // 65536) % 8)::INTEGER AS n_frames
  FROM mmc
)
""".strip()


@register(
    "multimodal_color_jpeg",
    f"WITH {_MMC_CTE}\n"
    "SELECT doc_id, width, height, n_frames, 1 AS mean_ok "
    "FROM mmc_dims ORDER BY doc_id",
)
def multimodal_color_jpeg(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.attach_payload(docs, text_col="text", fmt="jpeg420")
    meta = multimodal.image_meta(media)
    # closed-form SOURCE mean from the deterministic generator: rows are
    # banded in runs of 16 alternating colors c1/c2 (bits 32.. / 44.. of
    # the md5-derived h), so mean = (n1*sum(c1) + (h-n1)*sum(c2)) / (3h*255)
    src = docs.select(
        F.col("doc_id").alias("src_doc_id"),
        F.conv(F.substring(F.md5(F.coalesce(F.col("text"), F.lit(""))), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).select(
        "src_doc_id",
        (F.lit(16) + F.shiftright("h", 8) % 240).alias("src_height"),
        (
            F.shiftright("h", 32) % 256
            + F.shiftright("h", 36) % 256
            + F.shiftright("h", 40) % 256
        ).alias("s1"),
        (
            F.shiftright("h", 44) % 256
            + F.shiftright("h", 48) % 256
            + F.shiftright("h", 52) % 256
        ).alias("s2"),
    ).select(
        "src_doc_id",
        (
            (
                ((F.col("src_height") / 32).cast("long") * 16
                 + F.least(F.col("src_height") % 32, F.lit(16))) * F.col("s1")
                + (
                    F.col("src_height")
                    - ((F.col("src_height") / 32).cast("long") * 16
                       + F.least(F.col("src_height") % 32, F.lit(16)))
                ) * F.col("s2")
            )
            / (F.lit(3.0) * F.col("src_height") * F.lit(255.0))
        ).alias("src_mean"),
    )
    return (
        meta.join(F.broadcast(src), meta.doc_id == src.src_doc_id)
        .select(
            "doc_id",
            "width",
            "height",
            "n_frames",
            (F.abs(F.col("mean_intensity") - F.col("src_mean")) <= 0.02)
            .cast("int")
            .alias("mean_ok"),
        )
    )


# mirrors multimodal._make_audio_payload + the REAL RIFF/WAVE decode:
# sample rate / block length k / repeats m / amplitudes are md5-derived;
# samples are m repeats of (k * a1, k * -a2), so n_samples = 2*k*m,
# peak_abs = greatest(a1, a2), sum_abs = k*m*(a1+a2)
_AU_CTE = f"""
au AS (
  SELECT doc_id, {_H("coalesce(text, '')")} AS h FROM documents
),
au_p AS (
  SELECT doc_id,
         (CASE h % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                     WHEN 2 THEN 22050 ELSE 44100 END)::INTEGER AS sample_rate,
         (2 + (h // 4) % 14)::BIGINT AS k,
         (4 + (h // 64) % 61)::BIGINT AS m,
         (500 + (h // 4096) % 15000)::BIGINT AS a1,
         (300 + (h // 67108864) % 15000)::BIGINT AS a2
  FROM au
)
""".strip()


@register(
    "multimodal_audio_meta",
    f"""WITH {_AU_CTE}
SELECT doc_id, sample_rate, 1 AS n_channels, (2 * k * m)::BIGINT AS n_samples,
       greatest(a1, a2)::INTEGER AS peak_abs, (k * m * (a1 + a2))::BIGINT AS sum_abs,
       CAST(2 * k * m AS DOUBLE) * 1000.0 / CAST(sample_rate AS DOUBLE) AS duration_ms
FROM au_p ORDER BY doc_id""",
)
def multimodal_audio_meta(spark, sf_dir):
    """Audio modality: REAL RIFF/WAVE PCM decode (chunk walk + int16
    samples) as an Arrow-batched mapInPandas; the oracle reproduces the
    decoded metrics in closed form from the deterministic generator."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.attach_audio_payload(docs, text_col="text")
    return multimodal.audio_meta(media)


@register(
    "multimodal_frame_sample",
    f"""WITH {_MM_CTE}
SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, 2))::INTEGER AS frame_idx
FROM mm_meta ORDER BY doc_id, frame_idx""",
)
def multimodal_frame_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.attach_payload(docs, text_col="text")
    return multimodal.sample_frames(media, stride=2)


# ---- composed curation pipeline --------------------------------------------


@register(
    "curation_pipeline",
    f"""WITH RECURSIVE {_LSH_CTES},
cp_edges AS (
  SELECT id_a AS src, id_b AS dst FROM lsh_pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM lsh_pairs
),
cp_reach(node, lab) AS (
  SELECT src, src FROM cp_edges
  UNION
  SELECT e.dst, r.lab FROM cp_reach r JOIN cp_edges e ON e.src = r.node
),
cp_cc AS (SELECT node AS doc_id, min(lab)::BIGINT AS cluster_id FROM cp_reach GROUP BY node),
cp_qb AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[a-z0-9_]+'))::BIGINT AS n_tokens,
         coalesce(list_sum(list_transform(regexp_extract_all(text, '[a-z0-9_]+'),
                           t -> length(t))), 0)::BIGINT AS tok_chars,
         len(list_filter(regexp_extract_all(text, '[a-z0-9_]+'),
             t -> t IN ('the','a','of','to','in','and','is','it')))::BIGINT AS n_stop
  FROM documents
),
cp_q AS (
  SELECT doc_id,
         0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
       + 0.3 * greatest(0.0, 1.0 - abs(
           (CASE WHEN n_tokens > 0 THEN CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) - 5.0) / 10.0)
       + 0.3 * (1.0 - abs(
           (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) - 0.2)) AS quality
  FROM cp_qb
),
cp_ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(coalesce(text, ''))),
cp_prof(lang, tok) AS (VALUES {_LANG_VALUES}),
cp_toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9_]+')) AS tok FROM documents
),
cp_hits AS (
  SELECT t.doc_id, p.lang, count(*)::BIGINT AS hits
  FROM cp_toks t JOIN cp_prof p USING (tok) GROUP BY t.doc_id, p.lang
),
cp_best AS (
  SELECT h.doc_id, min(h.lang) AS pred_lang
  FROM (SELECT doc_id, max(hits) AS best_hits FROM cp_hits GROUP BY doc_id) m
  JOIN cp_hits h ON h.doc_id = m.doc_id AND h.hits = m.best_hits
  GROUP BY h.doc_id
)
SELECT d.doc_id, coalesce(b.pred_lang, 'und') AS pred_lang, q.quality
FROM documents d
JOIN cp_q q USING (doc_id)
JOIN cp_ex e ON e.doc_id = d.doc_id
LEFT JOIN cp_cc c ON c.doc_id = d.doc_id
LEFT JOIN cp_best b ON b.doc_id = d.doc_id
WHERE q.quality >= 0.7 AND (c.cluster_id IS NULL OR c.cluster_id = d.doc_id)
ORDER BY d.doc_id""",
)
def curation_pipeline(spark, sf_dir):
    """The composed training-data curation flow (pipeline/curate.py):
    quality gate >= 0.7, exact dedup keep-min, MinHash-LSH near-dup
    cluster keep-min, language tag — one declarative plan; the oracle
    recomputes all four corpus-global keep rules in SQL and intersects
    them."""
    from lucene_spark.pipeline.curate import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curate_corpus(docs, text_col="text", quality_threshold=0.7)


# ---- Gopher repetition filters (training-data curation; ---------------------
# Rae et al. 2021 §A1.1 — the rule family C4/RefinedWeb/Dolma reuse)

def _rep_gram_cte(name: str, n: int) -> str:
    """CTE pair: per-(doc, gram) counts and the per-doc rollup for one n."""
    return f"""g{name} AS (
  SELECT b.doc_id, b.total_chars,
         array_to_string(b.t[i.i : i.i + {n - 1}], ' ') AS gram,
         list_sum(list_transform(b.t[i.i : i.i + {n - 1}], x -> length(x))) AS gchars
  FROM rep_base b, unnest(generate_series(1, greatest(len(b.t) - {n - 1}, 0))) AS i(i)
  WHERE len(b.t) >= {n}
),
a{name} AS (
  SELECT doc_id, gram, count(*) AS cnt,
         first(gchars) AS gchars, first(total_chars) AS tc
  FROM g{name} GROUP BY doc_id, gram
),
r{name} AS (
  SELECT doc_id,
         max(cnt * gchars) AS top_chars,
         sum(CASE WHEN cnt > 1 THEN cnt * gchars ELSE 0 END) AS dup_chars,
         first(tc) AS tc
  FROM a{name} GROUP BY doc_id
)"""


@register(
    "text_repetition_scores",
    f"""WITH rep_base AS (
  SELECT doc_id,
         regexp_extract_all(text, '[a-z0-9_]+') AS t,
         coalesce(list_sum(list_transform(regexp_extract_all(text, '[a-z0-9_]+'),
                                          x -> length(x))), 0) AS total_chars
  FROM documents
),
{_rep_gram_cte('2', 2)},
{_rep_gram_cte('5', 5)},
rep_lines AS (
  SELECT doc_id,
         len(list_filter(string_split(text, chr(10)), x -> x <> '')) AS n_lines,
         len(list_distinct(list_filter(string_split(text, chr(10)), x -> x <> ''))) AS n_distinct
  FROM documents
)
SELECT b.doc_id,
       CASE WHEN coalesce(r2.tc, 0) > 0
            THEN coalesce(r2.top_chars, 0)::DOUBLE / r2.tc ELSE 0.0 END AS top2_frac,
       CASE WHEN coalesce(r5.tc, 0) > 0
            THEN coalesce(r5.dup_chars, 0)::DOUBLE / r5.tc ELSE 0.0 END AS dup5_frac,
       CASE WHEN l.n_lines > 0
            THEN (l.n_lines - l.n_distinct)::DOUBLE / l.n_lines ELSE 0.0 END AS dup_line_frac
FROM rep_base b
LEFT JOIN r2 USING (doc_id)
LEFT JOIN r5 USING (doc_id)
JOIN rep_lines l USING (doc_id)
ORDER BY b.doc_id""",
)
def text_repetition_scores(spark, sf_dir):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): per doc,
    the characters covered by the most frequent word 2-gram and by all
    duplicated 5-grams as fractions of total token characters
    (overlap-counting variant), plus the duplicate-line fraction. One
    explode + two doc-keyed groupBys; integer counts with one final
    double division, so the DuckDB oracle reproduces the fractions
    bit-for-bit."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = text.repetition_scores(docs, text_col="text", top_ns=(2,), dup_ns=(5,))
    return rep.select(
        "doc_id", "top2_frac", "dup5_frac", "dup_line_frac"
    ).orderBy(F.asc("doc_id"))
