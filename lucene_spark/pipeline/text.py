"""Text-analysis operators for training-data curation.

Everything is built from built-in Spark SQL functions (JVM codegen, no
Python in the hot path) with arithmetic restricted to operations that are
IEEE-deterministic across engines (+ - * / sqrt abs least greatest on
doubles; no transcendentals), so DuckDB oracles reproduce values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.pipeline.dedup import TOKEN_RE, h60

__all__ = [
    "token_stats",
    "quality_scores",
    "LANG_PROFILES",
    "language_id",
    "fingerprints",
]

# a BPE-ish subword pattern: letter runs, digit runs, or single other chars
SUBWORD_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = ("the", "a", "of", "to", "in", "and", "is", "it")


def _toks(text_col: str):
    return F.expr(f"regexp_extract_all({text_col}, '{TOKEN_RE}', 0)")


def token_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc token accounting: whitespace tokens, word tokens, BPE-ish
    subword count, character count."""
    toks = _toks(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_ws_tokens"),
        F.size(toks).alias("n_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{SUBWORD_RE}', 0)")).alias(
            "n_subwords"
        ),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def quality_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document-quality score in [0, 1].

    Components (all rational arithmetic — engine-portable):
    - length prior: min(n_tokens/100, 1)
    - token-shape prior: 1 - |mean_token_len - 5| / 10, clamped to [0,1]
    - stopword prior: 1 - |stop_ratio - 0.2|
    score = 0.4*length + 0.3*shape + 0.3*stop
    """
    toks = _toks(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("tok_chars"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(
            "n_stop"
        ),
    )
    n = F.col("n_tokens").cast("double")
    mean_len = F.when(
        F.col("n_tokens") > 0, F.col("tok_chars").cast("double") / n
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        F.col("n_tokens") > 0, F.col("n_stop").cast("double") / n
    ).otherwise(F.lit(0.0))
    length_c = F.least(n / F.lit(100.0), F.lit(1.0))
    shape_c = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(mean_len - F.lit(5.0)) / F.lit(10.0)
    )
    stop_c = F.lit(1.0) - F.abs(stop_ratio - F.lit(0.2))
    return base.select(
        "doc_id",
        "n_tokens",
        mean_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        (
            F.lit(0.4) * length_c + F.lit(0.3) * shape_c + F.lit(0.3) * stop_c
        ).alias("quality"),
    )


# indicator-token profiles for the n-gram/keyword language-ID heuristic.
# (Demo profiles over the synthetic corpus vocabulary; in production these
# are the top character n-grams per language.)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "fast", "slow", "small", "order"),
    "es": ("data", "line", "part", "sort"),
    "zh": ("spark", "query", "group", "row"),
    "fr": ("table", "scan", "merge", "window"),
    "de": ("hash", "join", "filter", "batch"),
}


def language_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keyword-profile language ID: per-language hit count over the token
    stream, argmax with alphabetical tie-break; 'und' when nothing matches.

    The profile table is tiny → broadcast hash join against the exploded
    token stream; one groupBy (doc_id, lang) shuffle.
    """
    spark = docs.sparkSession
    prof = spark.createDataFrame(
        [(lang, w) for lang, words in LANG_PROFILES.items() for w in words],
        schema="lang string, tok string",
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_toks(text_col)).alias("tok"),
    )
    hits = (
        toks.join(F.broadcast(prof), "tok")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("hits"))
    )
    # deterministic arg-max: max hits, then lexicographically-first lang
    best = (
        hits.groupBy("doc_id")
        .agg(F.max("hits").alias("best_hits"))
        .join(hits, "doc_id")
        .filter(F.col("hits") == F.col("best_hits"))
        .groupBy("doc_id", "best_hits")
        .agg(F.min("lang").alias("pred_lang"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("best_hits", F.lit(0)).alias("best_hits"),
        )
    )


def fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Position-sensitive 60-bit document fingerprint.

    xor over tokens of h60(token '@' position): order-independent aggregate
    of position-tagged hashes — content+order sensitive, yet deterministic
    under any partitioning (the distributed-rolling-hash trick).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_toks(text_col)).alias("pos", "tok"),
    )
    tagged = toks.select(
        "doc_id", h60(F.concat_ws("@", F.col("tok"), F.col("pos"))).alias("ph")
    )
    fp = tagged.groupBy("doc_id").agg(F.expr("bit_xor(ph)").alias("fingerprint"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(fp, "doc_id", "left")
        .select("doc_id", F.coalesce("fingerprint", F.lit(0)).alias("fingerprint"))
    )
