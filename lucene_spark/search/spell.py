"""Did-you-mean spell correction over the term dictionary.

The ``DirectSpellChecker`` analog (suggest/.../spell/DirectSpellChecker.java:50):
suggestions come straight from the index's term dictionary — no separate
spelling index — ranked by edit-distance similarity then popularity.

Semantics matched to the reference defaults:

- candidates share the first ``min_prefix`` characters with the query and
  sit within ``max_edits`` (default 2) *optimal-string-alignment* edits —
  Lucene's internal Levenshtein-with-transpositions matrix
  (LuceneLevenshteinDistance.java:44; FuzzyTermsEnum transpositions=true);
- similarity = 1 - edits / min(|query|, |candidate|) in float32
  (FuzzyTermsEnum boost), kept when >= ``accuracy`` (0.5);
- query-frequency gates: by default suggestions only fire for terms NOT in
  the index (SuggestMode.SUGGEST_WHEN_NOT_IN_INDEX), and never for terms
  whose df exceeds ``max_query_frequency`` of maxDoc
  (DirectSpellChecker.java:339-351);
- ``more_popular`` mode keeps only candidates with df strictly above the
  query term's own df (:350);
- result order = (score desc, df desc, term asc) —
  SuggestWordScoreComparator under reverseOrder (:388).

Spark shape: the candidate scan is a codegen-only prefilter over the
``termstats`` table (prefix equality + length window + built-in
``levenshtein`` as a sound OSA lower-bound screen: lev <= 2*osa), so the
exact OSA matrix runs in one Arrow batch stage over a handful of
survivors — the FuzzyTermsEnum-over-FST position. Simplification vs the
reference: distance is computed over the full strings rather than the
post-prefix suffixes; the two agree whenever the optimal alignment keeps
the shared prefix aligned (all practical dictionaries).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["osa_distance", "suggest_similar"]


def osa_distance(a: str, b: str) -> int:
    """Optimal string alignment (restricted Damerau): the reference's cost
    matrix with the adjacent-transposition line
    (LuceneLevenshteinDistance.java:44-104)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0 if n == m else max(n, m)
    prev2 = None
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + cost)
        prev2, prev = prev, cur
    return prev[m]


_OUT_SCHEMA = "term string, score float, df long"


def suggest_similar(
    searcher,
    text: str,
    num_sug: int = 5,
    *,
    max_edits: int = 2,
    min_prefix: int = 1,
    accuracy: float = 0.5,
    max_query_frequency: float = 0.01,
    threshold_frequency: float = 0.0,
    suggest_mode: str = "not_in_index",
) -> DataFrame:
    """Spelling corrections for ``text`` -> (term, score, df) DataFrame.

    ``suggest_mode``: "not_in_index" (default — suggest only when the term
    is absent), "more_popular" (candidates must beat the query's df), or
    "always"."""
    if not 1 <= max_edits <= 2:
        raise ValueError("max_edits must be 1 or 2 (LevenshteinAutomata bound)")
    if suggest_mode not in ("not_in_index", "more_popular", "always"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    idx = searcher.index
    fld = idx.config.field_name
    spark = idx.termstats.sparkSession
    empty = spark.createDataFrame([], _OUT_SCHEMA)

    from lucene_spark.analysis.tokenizer import java_lower

    q = java_lower(text)  # lowerCaseTerms=true default
    if len(q) < 1:
        return empty

    # query-term df: zero jobs when the dictionary is preloaded
    if getattr(searcher, "_stats_all_loaded", False):
        df_q = searcher._stats_memo.get((fld, q), (0, 0))[0]
    else:
        row = (
            idx.termstats.filter(
                (F.col("field") == fld) & (F.col("term") == q)
            )
            .select("df")
            .collect()
        )
        df_q = int(row[0]["df"]) if row else 0
    max_doc = idx.fieldstats[fld].max_doc

    if suggest_mode == "not_in_index" and df_q > 0:
        return empty
    if max_query_frequency >= 1.0:
        if df_q > int(max_query_frequency):
            return empty
    elif df_q > math.ceil(
        # the reference computes the ratio gate in float32
        # (DirectSpellChecker.java:346 `maxQueryFrequency * (float) maxDoc`)
        float(np.float32(max_query_frequency) * np.float32(max_doc))
    ):
        return empty

    docfreq = df_q if suggest_mode == "more_popular" else 0
    if threshold_frequency >= 1.0:
        docfreq = max(docfreq, int(threshold_frequency))
    elif threshold_frequency > 0.0:
        docfreq = max(
            docfreq, int(float(np.float32(threshold_frequency) * np.float32(max_doc))) - 1
        )

    cand = idx.termstats.filter(
        (F.col("field") == fld)
        & (F.col("term") != q)
        & (F.substring("term", 1, min_prefix) == q[:min_prefix])
        & (F.abs(F.length("term") - F.lit(len(q))) <= max_edits)
        & (F.levenshtein(F.col("term"), F.lit(q)) <= 2 * max_edits)
        & (F.col("df") > docfreq)
    ).select("term", "df")

    qlen = len(q)
    acc = np.float32(accuracy)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms = pdf["term"].tolist()
            eds = np.array([osa_distance(q, t) for t in terms], dtype=np.int64)
            mins = np.minimum([len(t) for t in terms], qlen).astype(np.float32)
            scores = np.float32(1.0) - eds.astype(np.float32) / mins
            keep = (eds <= max_edits) & (scores >= acc)
            yield pd.DataFrame(
                {
                    "term": pdf["term"][keep],
                    "score": scores[keep],
                    "df": pdf["df"][keep].astype("int64"),
                }
            )

    return (
        cand.mapInPandas(gen, schema=_OUT_SCHEMA)
        .orderBy(F.desc("score"), F.desc("df"), F.asc("term"))
        .limit(num_sug)
    )
