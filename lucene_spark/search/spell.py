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

__all__ = [
    "osa_distance",
    "suggest_similar",
    "suggest_word_breaks",
    "suggest_word_combinations",
    "SEPARATOR",
]


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


# ---- WordBreakSpellChecker (suggest/spell/WordBreakSpellChecker.java:33) ---

#: place between two input terms to forbid combining them
#: (WordBreakSpellChecker.SEPARATOR_TERM)
SEPARATOR = None


def _df_lookup(searcher, texts: list[str]) -> dict[str, int]:
    """df for each candidate string — zero Spark jobs when the term
    dictionary is preloaded (``preload_stats``), else ONE batched isin
    job (the reference's per-substring ``ir.docFreq`` calls, amortized)."""
    idx = searcher.index
    fld = idx.config.field_name
    uniq = sorted(set(texts))
    if getattr(searcher, "_stats_all_loaded", False):
        memo = searcher._stats_memo
        return {t: memo.get((fld, t), (0, 0))[0] for t in uniq}
    rows = (
        idx.termstats.filter(
            (F.col("field") == fld) & F.col("term").isin(uniq)
        )
        .select("term", "df")
        .collect()
    )
    out = {t: 0 for t in uniq}
    for r in rows:
        out[r["term"]] = int(r["df"])
    return out


def _break_key(words: list[tuple[str, int]], sort_method: str):
    """heapq key — smallest pops first = the reference PQ's least element
    (most words, then lowest max/sum frequency)."""
    freqs = [f for _, f in words]
    metric = max(freqs) if sort_method == "max_freq" else sum(freqs)
    return (-len(words), metric)


def suggest_word_breaks(
    searcher,
    text: str,
    max_suggestions: int = 5,
    *,
    suggest_mode: str = "not_in_index",
    min_suggestion_frequency: int = 1,
    min_break_word_length: int = 1,
    max_changes: int = 1,
    max_evaluations: int = 1000,
    sort_method: str = "max_freq",
) -> list[list[tuple[str, int]]]:
    """Break a run-together term into dictionary words
    (WordBreakSpellChecker.suggestWordBreaks :74): breadth-first bi-sects,
    recursing on the right side of any valid left word up to
    ``max_changes`` breaks, ranked fewest-breaks-first then by
    ``sort_method`` ("max_freq" = NUM_CHANGES_THEN_MAX_FREQUENCY default,
    "sum_freq" = the summed variant). Returns [[(word, df), ...], ...],
    best suggestion first. All candidate-substring dfs resolve in one
    batched lookup, then the reference's recursion runs driver-side."""
    import heapq

    if max_suggestions < 1:
        return []
    if suggest_mode not in ("not_in_index", "more_popular", "always"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    if sort_method not in ("max_freq", "sum_freq"):
        raise ValueError(f"unknown sort_method {sort_method!r}")

    from lucene_spark.analysis.tokenizer import java_lower

    q = java_lower(text)
    # every substring the recursion could ever look up, one batch
    subs = [q[i:j] for i in range(len(q)) for j in range(i + 1, len(q) + 1)]
    dfs = _df_lookup(searcher, subs + [q])

    orig_freq = dfs.get(q, 0)
    if orig_freq > 0 and suggest_mode == "not_in_index":
        return []
    min_freq = min_suggestion_frequency
    if suggest_mode == "more_popular":
        min_freq = orig_freq if orig_freq else 1
    min_len = max(min_break_word_length, 1)

    heap: list = []  # (key, seq, words) — seq keeps heap pops stable
    seq = 0
    evals = 0

    def gen(term: str, number_breaks: int, prefix: list[tuple[str, int]]) -> None:
        nonlocal seq, evals
        if len(term) < min_len * 2:
            return
        valid_left = []
        for i in range(min_len, len(term) - min_len + 1):
            if evals >= max_evaluations:
                return
            evals += 1
            left, right = term[:i], term[i:]
            if dfs.get(left, 0) >= min_freq:
                valid_left.append(i)
                if dfs.get(right, 0) >= min_freq:
                    words = prefix + [(left, dfs[left]), (right, dfs[right])]
                    heapq.heappush(heap, (_break_key(words, sort_method), seq, words))
                    seq += 1
                    if len(heap) > max_suggestions:
                        heapq.heappop(heap)
        if (
            evals >= max_evaluations
            or number_breaks + 1 > max_changes
            or len(heap) >= max_suggestions
        ):
            return
        for i in valid_left:
            left, right = term[:i], term[i:]
            gen(right, number_breaks + 1, prefix + [(left, dfs[left])])
            if evals >= max_evaluations:
                break

    gen(q, 1, [])
    out = []
    while heap:
        out.append(heapq.heappop(heap)[2])
    out.reverse()  # worst pops first; reference fills its array backwards
    return out


def suggest_word_combinations(
    searcher,
    texts: list,
    max_suggestions: int = 5,
    *,
    suggest_mode: str = "not_in_index",
    min_suggestion_frequency: int = 1,
    max_combine_word_length: int = 20,
    max_changes: int = 1,
    max_evaluations: int = 1000,
) -> list[tuple[str, int, list[int]]]:
    """Combine adjacent query terms into one dictionary word
    (WordBreakSpellChecker.suggestWordCombinations :148). ``texts`` may
    contain :data:`SEPARATOR` to forbid joining across it. Returns
    [(combined_word, df, original_term_indexes), ...], fewest-combinations
    first then higher df (CombinationsThenFreqComparator under the PQ)."""
    import heapq

    if max_suggestions < 1:
        return []
    if suggest_mode not in ("not_in_index", "more_popular", "always"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")

    from lucene_spark.analysis.tokenizer import java_lower

    terms = [t if t is SEPARATOR else java_lower(t) for t in texts]
    # batch every df the loops could need: originals + all combinations
    need = [t for t in terms if t is not SEPARATOR]
    for i in range(len(terms) - 1):
        if terms[i] is SEPARATOR:
            continue
        combined = terms[i]
        for j in range(i + 1, min(len(terms), i + 1 + max_changes)):
            if terms[j] is SEPARATOR:
                break
            combined += terms[j]
            if len(combined) > max_combine_word_length:
                break
            need.append(combined)
    dfs = _df_lookup(searcher, need)
    orig = [0 if t is SEPARATOR else dfs.get(t, 0) for t in terms]

    heap: list = []  # (key, seq, (word, df, idxs)); worst pops first
    seq = 0
    evals = 0
    for i in range(len(terms) - 1):
        if terms[i] is SEPARATOR:
            continue
        if len(terms[i]) > max_combine_word_length:
            continue
        max_f = min_f = orig[i] if suggest_mode != "always" else 0
        if suggest_mode == "always":
            max_f, min_f = 0, 2**31 - 1
        combined = terms[i]
        for j in range(i + 1, len(terms)):
            if j - i > max_changes:
                break
            if terms[j] is SEPARATOR:
                break
            combined += terms[j]
            if len(combined) > max_combine_word_length:
                break
            if suggest_mode != "always":
                max_f = max(max_f, orig[j])
                min_f = min(min_f, orig[j])
            cdf = dfs.get(combined, 0)
            if (suggest_mode != "more_popular" or cdf >= max_f) and (
                suggest_mode != "not_in_index" or min_f == 0
            ):
                if cdf >= min_suggestion_frequency:
                    idxs = list(range(i, j + 1))
                    # PQ least = more combinations, then lower df
                    key = (-(len(idxs) - 1), cdf)
                    heapq.heappush(heap, (key, seq, (combined, cdf, idxs)))
                    seq += 1
                    if len(heap) > max_suggestions:
                        heapq.heappop(heap)
            evals += 1
            if evals == max_evaluations:
                break
        if evals == max_evaluations:
            break
    out = []
    while heap:
        out.append(heapq.heappop(heap)[2])
    out.reverse()
    return out
