"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame plans (JVM whole-stage codegen; the only
shuffles are the groupBy/join keys noted per function) and every hash is
derived from ``md5`` so a DuckDB oracle can reproduce results bit-exactly:

``h60(s) = bigint(first 15 hex chars of md5(s))``  (60 bits, non-negative)

Scale notes (100 TB corpus):

- exact dedup: one shuffle on sha256 — uniformly distributed, no skew;
- MinHash: shingle explosion is map-side; the signature groupBy key is
  ``(doc_id, perm)`` (dense, uniform); the LSH bucket join only pairs docs
  inside a band bucket, and ``bucket_cap`` drops degenerate mega-buckets
  (the classic guard against quadratic blowup on boilerplate text);
- SimHash: constant 32 rows per (doc, distinct-term) — linear;
- embedding near-dup: quantized int64 dot products (order-independent ⇒
  deterministic across partitionings), LSH-bucketed variant for scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.pipeline.partitioning import spread

__all__ = [
    "exact_duplicate_groups",
    "shingles",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "embedding_near_dup_pairs",
    "duplicate_clusters",
    "paragraph_dedup",
]

TOKEN_RE = "[a-z0-9_]+"


def h60(col: Column) -> Column:
    """60-bit md5-derived hash; DuckDB mirror: ('0x'||substring(md5(s),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


#: Mersenne prime 2^61-1 — the universal-hash modulus for MinHash perms
_MERSENNE61 = (1 << 61) - 1


def _perm_consts(i: int) -> tuple[int, int]:
    """Deterministic per-permutation universal-hash constants
    (a odd < 2^30, b < 2^30), derived from md5 so the DuckDB oracle can
    inline the identical values."""
    import hashlib

    d = hashlib.md5(f"minhash-perm-{i}".encode()).hexdigest()
    a = (int(d[:8], 16) % (1 << 30)) | 1
    b = int(d[8:16], 16) % (1 << 30)
    return a, b


def exact_duplicate_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by content hash: one row per distinct content.

    (content_sha256, n_docs, min_doc_id) — the canonical-representative map
    a dedup pass keeps; ``n_docs > 1`` rows are the duplicate groups.
    One shuffle on sha256 (uniform key, no skew at any scale).
    """
    return (
        docs.select(
            F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("content_sha256"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("content_sha256")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
) -> DataFrame:
    """(doc_id, shingle) — word n-gram shingles; docs shorter than the
    shingle size contribute their whole token stream as one shingle."""
    toks = F.expr(f"regexp_extract_all({text_col}, '{TOKEN_RE}', 0)")
    n = F.size(toks)
    k = shingle_size
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    # ~n_tokens x num_perm rows per doc downstream: spread single-split
    # inputs across cores before the explosion (no-op on real datasets)
    return spread(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """(doc_id, perm, minhash): MinHash signature rows.

    Universal-hashing family over ONE base hash: h = 60-bit md5 prefix of
    the shingle, and perm-i's value is ``(a_i*h + b_i) mod M`` with
    M = 2^61-1 (Mersenne prime) and per-perm constants a_i (odd, <2^30),
    b_i (<2^30) derived from md5("minhash-perm-i"). Multiplication by a
    nonzero a_i mod a prime is a bijection, so the 16 orderings are
    decorrelated (a naive ``h1 + i*h2`` double-hash shares minimizers
    across perms and measured 6x the false-positive band collisions).
    The multiply stays in int64 via the Mersenne identity
    ``x*2^30 ≡ (x & (2^31-1))*2^30 + (x >> 31) (mod M)`` applied to
    ``x = a_i * (h >> 30)``; every intermediate < 2^62.

    vs hashing ``shingle || '#' || i`` per perm this cuts the md5 work 16x
    AND the shuffle volume 16x: the groupBy aggregates ``num_perm``
    independent ``min`` columns map-side (one row per doc per partition
    reaches the exchange), then posexplode restores the
    (doc_id, perm, minhash) row shape. Duplicates in the shingle multiset
    don't affect the min, so no distinct is needed.
    """
    sh = shingles(docs, text_col, id_col, shingle_size)
    h = h60(F.col("shingle"))
    base = sh.select(
        "doc_id",
        F.shiftright(h, 30).alias("hi"),
        h.bitwiseAND(F.lit((1 << 30) - 1)).alias("lo"),
    )

    def g(i: int):
        a, b = _perm_consts(i)
        x = F.lit(a) * F.col("hi")
        folded = F.shiftleft(x.bitwiseAND(F.lit((1 << 31) - 1)), 30) + F.shiftright(
            x, 31
        )
        return (folded + F.lit(a) * F.col("lo") + F.lit(b)) % F.lit(_MERSENNE61)

    mins = base.groupBy("doc_id").agg(
        *[F.min(g(i)).alias(f"m{i}") for i in range(num_perm)]
    )
    return mins.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"m{i}") for i in range(num_perm)])).alias(
            "perm", "minhash"
        ),
    )


def _band_sketches(
    sigs: DataFrame, num_perm: int, bands: int
) -> DataFrame:
    """(doc_id, band, band_hash) — order-independent combine of the band's
    signature values (xor of per-(perm,minhash) hashes), so the result does
    not depend on aggregation order."""
    r = num_perm // bands
    return (
        sigs.withColumn("band", (F.col("perm") / F.lit(r)).cast("int"))
        .withColumn(
            "ph", h60(F.concat_ws(":", F.col("perm"), F.col("minhash")))
        )
        .groupBy("doc_id", "band")
        .agg(F.expr("bit_xor(ph)").alias("band_hash"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that share >=1 LSH band.

    Standard banding: num_perm/bands rows per band; two docs collide on a
    band iff their signatures agree on every row of it. ``bucket_cap``
    drops buckets with more members than the cap (boilerplate guard) —
    at 100 TB this is what keeps the bucket self-join from going quadratic.
    """
    sigs = minhash_signatures(docs, text_col, id_col, num_perm, shingle_size)
    bnd = _band_sketches(sigs, num_perm, bands)
    if bucket_cap is not None:
        from pyspark.sql import Window

        cnt = bnd.groupBy("band", "band_hash").agg(F.count("*").alias("_n"))
        bnd = bnd.join(
            cnt.filter(F.col("_n") <= bucket_cap).select("band", "band_hash"),
            ["band", "band_hash"],
        )
    a = bnd.select("band", "band_hash", F.col("doc_id").alias("id_a"))
    b = bnd.select("band", "band_hash", F.col("doc_id").alias("id_b"))
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    jaccard = |A ∩ B| / |A ∪ B| over distinct shingle sets; the verify
    stage after MinHash LSH. Joins are on (doc_id) / (shingle) — both
    broadcast-able when the candidate set is small relative to the corpus.
    """
    sh = shingles(docs, text_col, id_col, shingle_size).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.withColumnRenamed("doc_id", "id_a")
    b = sh.withColumnRenamed("doc_id", "id_b")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


SIMHASH_BITS = 32


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over term-frequency-weighted tokens.

    bit b is set iff sum over distinct tokens of tf * (+-1 by bit b of the
    token's h60) is >= 0.

    One shuffle computes tf per (doc, distinct token); the 32 per-bit sums
    then aggregate as 32 independent columns with map-side combine — no
    32x bit explode, no second wide shuffle (integer sums are
    order-independent, so results are bit-identical to the exploded
    formulation and the DuckDB oracle needs no change).
    """
    toks = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(f"regexp_extract_all({text_col}, '{TOKEN_RE}', 0)")).alias(
            "tok"
        ),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    base = tf.select("doc_id", "tf", h60(F.col("tok")).alias("th"))
    one = F.lit(1).cast("long")
    sums = base.groupBy("doc_id").agg(
        *[
            F.sum(
                F.col("tf")
                * (F.shiftright(F.col("th"), b).bitwiseAND(one) * F.lit(2) - F.lit(1))
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fingerprint = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return sums.select("doc_id", fingerprint.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within Hamming distance over SimHash.

    Pigeonhole banding: 4 bytes per hash — any pair within distance <= 3
    agrees on >= 1 byte, so candidates = same (byte_idx, byte_value)
    bucket; exact bit_count(xor) filter afterwards.
    """
    sh = simhash(docs, text_col, id_col)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("byte_idx"),
    ).withColumn("byte_val", F.expr("shiftright(simhash, byte_idx * 8) & 255"))
    a = banded.select(
        "byte_idx", "byte_val", F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha")
    )
    b = banded.select(
        "byte_idx", "byte_val", F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb")
    )
    return (
        a.join(b, ["byte_idx", "byte_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding near-dup (shared quantization with pipeline.similarity)
# ---------------------------------------------------------------------------

QUANT = 1 << 20  # 2^20 fixed-point scale: float32 inputs stay exact in double


def quantize(vec_col: Column) -> Column:
    """array<float> -> array<long>, floor(x * 2^20). Exact + order-independent
    integer dot products make cosine bit-deterministic across partitionings
    (and reproducible in a DuckDB oracle)."""
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * F.lit(float(QUANT))).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_from_int(dot: Column, na: Column, nb: Column) -> Column:
    return dot.cast("double") / (
        F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold (brute-force).

    O(n^2/2) comparisons — correct baseline and the oracle shape; at scale
    use ``similarity.hyperplane_bucketed_topk``'s bucketing to prefilter.
    """
    q = spread(emb).select(
        F.col(id_col).alias("id"),
        quantize(F.col(vec_col)).alias("qv"),
    ).withColumn("nsq", int_dot(F.col("qv"), F.col("qv")))
    a = q.select(F.col("id").alias("id_a"), F.col("qv").alias("va"), F.col("nsq").alias("na"))
    b = q.select(F.col("id").alias("id_b"), F.col("qv").alias("vb"), F.col("nsq").alias("nb"))
    return (
        a.join(b, a.id_a < b.id_b)
        .select(
            "id_a",
            "id_b",
            cosine_from_int(
                int_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve candidate-duplicate PAIRS into duplicate CLUSTERS:
    (doc_id, cluster_id) where cluster_id = the smallest doc id in the
    pair-graph's connected component. The step a real dedup pipeline runs
    after LSH/jaccard verification — "keep one representative per cluster"
    is then ``filter(doc_id == cluster_id)`` / an anti-join for the rest.

    Algorithm: min-label propagation to a fixpoint. Each round is one
    shuffle (edge join on the node id) + a min aggregation — the standard
    Spark connected-components shape. Rounds are bounded by the component
    DIAMETER, not its size; near-dup components are shallow (LSH buckets
    emit cliques, chains only appear via borderline bridge docs), so this
    converges in a handful of rounds at any corpus size. Each round's
    result is localCheckpoint'ed: the plan stays O(1) deep instead of
    growing with iterations, and convergence is read off a cheap sum
    aggregate (labels only ever decrease, so an unchanged label sum is a
    fixpoint certificate). Docs that appear in no pair are singletons and
    are not emitted.
    """
    src, dst = F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    edges = pairs.select(src, dst).unionByName(
        pairs.select(
            F.col(b_col).alias("src"), F.col(a_col).alias("dst")
        )
    )
    edges = edges.persist()

    def _sum(df) -> object:
        # one action per round: the lazy localCheckpoint materializes (and
        # caches) while this aggregate runs, so convergence costs no
        # second job
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    prev_sum = _sum(labels)
    if prev_sum is None:  # no pairs at all
        edges.unpersist()
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
    for _ in range(max_iter):
        prop = edges.join(
            labels, edges["src"] == labels["node"], "inner"
        ).select(F.col("dst").alias("node"), F.col("label"))
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        new_sum = _sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iter} rounds — "
            "component diameter exceeds the bound; raise max_iter"
        )
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    min_chars: int = 1,
) -> DataFrame:
    """Cross-document paragraph-level exact dedup (the Gopher /
    RefinedWeb sub-document pass: a boilerplate paragraph repeated across
    pages is removed EVERYWHERE except its first occurrence, while the
    host documents survive).

    Returns (doc_id, text_dedup, n_paragraphs, n_removed): each doc's
    text rebuilt from the paragraphs that are the corpus-wide FIRST
    occurrence of their content, in original order. "First" = smallest
    (doc_id, position) over the md5 hash of the trimmed paragraph —
    deterministic under any partitioning.  Paragraphs shorter than
    ``min_chars`` after trim are kept unconditionally (droppable
    whitespace fragments are not evidence of duplication).

    Shape at scale: one explode (map-side), then exactly TWO shuffles —
    a window over the 60-bit paragraph hash elects first occurrences
    (uniform key, no skew, and no self-join: the election IS the keep
    flag), and the reconstruction groupBy keys on doc_id.  Hash-bucket
    window partitions stay small because equal hashes are equal
    paragraphs — the degenerate giant bucket is exactly the boilerplate
    this pass exists to remove, and it reduces to one winner row.
    """
    from pyspark.sql import Window

    paras = (
        spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), F.lit(sep))
            ).alias("pos", "para"),
        )
        .withColumn("para_t", F.trim(F.col("para")))
    )
    hashed = paras.withColumn(
        "ph",
        F.when(F.length("para_t") >= min_chars, h60(F.col("para_t"))),
    )
    # exempt (null-ph) fragments get a unique surrogate key so they never
    # pool into one null window partition — each is its own singleton
    wkey = F.coalesce(
        F.col("ph"),
        -h60(F.concat_ws(":", F.col("doc_id"), F.col("pos"))) - F.lit(1),
    )
    rn = F.row_number().over(Window.partitionBy(wkey).orderBy("doc_id", "pos"))
    kept = hashed.withColumn(
        "keep", F.col("ph").isNull() | (rn == 1)
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paragraphs"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.concat_ws(
                sep,
                F.transform(
                    F.filter(
                        F.sort_array(
                            F.collect_list(
                                F.when(F.col("keep"), F.struct("pos", "para"))
                            )
                        ),
                        lambda s: s.isNotNull(),
                    ),
                    lambda s: s["para"],
                ),
            ).alias("text_dedup"),
        )
        .select("doc_id", "text_dedup", "n_paragraphs", "n_removed")
    )
