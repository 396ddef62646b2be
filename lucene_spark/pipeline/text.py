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
    "repetition_scores",
    "PII_PATTERNS",
    "scrub_pii",
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


def repetition_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6),
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, the rule
    family C4/RefinedWeb/Dolma re-use): per document,

    - ``top{n}_frac`` for n in ``top_ns``: characters covered by the
      single MOST FREQUENT word n-gram, as a fraction of total token
      characters (gram chars = sum of its tokens' lengths, occurrences
      counted with overlap; ties broken toward the larger covered-char
      product — deterministic);
    - ``dup{n}_frac`` for n in ``dup_ns``: characters covered by all
      n-grams occurring MORE THAN ONCE (each occurrence counted — the
      overlap-counting variant, documented because implementations
      differ here; like the published counting variants, values can
      exceed 1.0 on pathologically repetitive text — threshold filters,
      the consumer of these numbers, are unaffected);
    - ``dup_line_frac``: fraction of newline-separated lines that are
      exact duplicates of an earlier line (0 for single-line text).

    Shape at scale: one explode keyed by doc_id over all requested n at
    once, one partial-aggregating groupBy per (doc, n, gram), one
    per-(doc, n) rollup — every shuffle keyed by doc_id so AQE coalesces
    and nothing is quadratic in document count. All arithmetic is
    integer counts + one final double division (engine-exact), so a
    DuckDB oracle reproduces the fractions bit-for-bit.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    toks = _toks(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
    )

    # one row per (doc, n, gram-start): gram char weight = sum of token
    # lengths in the window (join-free: computed inside the array)
    gram_rows = None
    for n in all_ns:
        g = base.select(
            "doc_id",
            "total_chars",
            F.lit(n).alias("n"),
            F.explode(
                # sequence(1, 0) DESCENDS in Spark, so short docs need an
                # explicit empty-array branch instead of a greatest() clamp
                F.expr(
                    f"CASE WHEN size(toks) >= {n} THEN "
                    f"transform(sequence(1, size(toks) - {n - 1}), "
                    f"i -> struct(array_join(slice(toks, i, {n}), ' ') AS gram, "
                    f"aggregate(slice(toks, i, {n}), 0L, (a, t) -> a + length(t)) AS gchars)) "
                    f"ELSE array() END"
                )
            ).alias("g"),
        ).select("doc_id", "total_chars", "n", "g.gram", "g.gchars")
        gram_rows = g if gram_rows is None else gram_rows.unionByName(g)

    per_gram = gram_rows.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("cnt"),
        F.first("gchars").alias("gchars"),
        F.first("total_chars").alias("total_chars"),
    )
    per_doc_n = per_gram.groupBy("doc_id", "n").agg(
        F.max(F.col("cnt") * F.col("gchars")).alias("top_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.col("gchars")).otherwise(
                F.lit(0)
            )
        ).alias("dup_chars"),
        F.first("total_chars").alias("total_chars"),
    )
    frac = lambda c: F.when(
        F.col("total_chars") > 0,
        c.cast("double") / F.col("total_chars").cast("double"),
    ).otherwise(F.lit(0.0))
    wide = per_doc_n.groupBy("doc_id").agg(
        F.first("total_chars").alias("total_chars"),
        *[
            F.max(
                F.when(F.col("n") == n, F.col("top_chars")).otherwise(F.lit(None))
            ).alias(f"_top{n}")
            for n in top_ns
        ],
        *[
            F.max(
                F.when(F.col("n") == n, F.col("dup_chars")).otherwise(F.lit(None))
            ).alias(f"_dup{n}")
            for n in dup_ns
        ],
    )

    lines = F.expr(f"filter(split({text_col}, '\\n'), x -> x <> '')")
    line_side = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(F.array_distinct(lines)).alias("n_distinct_lines"),
    )
    # docs too short for ANY n-gram have no `wide` row — anchor on the
    # full doc set and coalesce their fractions to 0
    out = line_side.join(wide, "doc_id", "left")
    cols = [F.col("doc_id")]
    cols += [
        F.coalesce(frac(F.col(f"_top{n}")), F.lit(0.0)).alias(f"top{n}_frac")
        for n in top_ns
    ]
    cols += [
        F.coalesce(frac(F.col(f"_dup{n}")), F.lit(0.0)).alias(f"dup{n}_frac")
        for n in dup_ns
    ]
    cols.append(
        F.when(
            F.col("n_lines") > 0,
            (F.col("n_lines") - F.col("n_distinct_lines")).cast("double")
            / F.col("n_lines").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac")
    )
    return out.select(*cols)


#: C4/CCNet-style PII patterns — conservative, curation-grade (recall over
#: precision is the published norm for scrub-before-train); portable
#: between Spark's and DuckDB's regex engines
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}


def scrub_pii(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict | None = None,
    replacement: str = "<PII>",
):
    """PII redaction (the C4-style scrub a pretraining pipeline runs
    before tokenization): each pattern family is replaced by the
    ``replacement`` token, and per-family hit counts are reported so the
    curation report can audit redaction volume.

    Entirely JVM-side (``regexp_replace`` / ``regexp_extract_all`` inside
    whole-stage codegen — no Python, no shuffle: a pure map stage a
    100 TB scan absorbs at scan cost). Patterns apply in dict order to
    the PROGRESSIVELY scrubbed text, and each family's count is measured
    against the same intermediate its replacement saw, so counts and
    replacements always agree (an address inside an already-redacted
    span can't double-count).
    """
    pats = patterns or PII_PATTERNS
    cur = F.coalesce(F.col(text_col), F.lit(""))
    count_cols = []
    for name, rx in pats.items():
        count_cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(rx), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, rx, replacement)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        cur.alias("text_scrubbed"),
        *count_cols,
    )
