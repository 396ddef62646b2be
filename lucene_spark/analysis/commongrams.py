"""CommonGramsFilter / CommonGramsQueryFilter — phrase-speed bigrams over
common words (``analysis/common/src/java/.../commongrams/
CommonGramsFilter.java:43`` and ``CommonGramsQueryFilter.java:35``).

Index side (``CommonGrams.apply``): every adjacent pair where either word
is a common word additionally emits the joined bigram ``w1_w2`` as a
posIncr-0 overlap at the first word's position (the reference emits the
gram with positionIncrement 0 right after the first unigram), so norms
discount the grams like every other overlap.

Query side (``common_grams_query``): the CommonGramsQueryFilter
reduction — emit the bigrams, drop every unigram that starts a bigram,
and drop the final unigram when a bigram ends on it. This reproduces all
sixteen s/n-combination fixtures of the reference's
``TestCommonGramsFilter.testCommonGramsQueryFilter`` (replayed in
``tests/test_commongrams.py``).
"""

from __future__ import annotations

__all__ = ["CommonGrams", "common_grams_query"]

SEPARATOR = "_"


class CommonGrams:
    """Index-side expander for FilteredAnalyzer: unigrams pass through,
    common-word bigrams overlay at the first word's position."""

    def __init__(self, common_words):
        self.common = frozenset(common_words)

    def grams(self, terms, positions):
        """-> (extra_terms, extra_positions) for the bigram overlays;
        pairs must be position-adjacent (no holes from dropped tokens)."""
        out_t, out_p = [], []
        for i in range(len(terms) - 1):
            if int(positions[i + 1]) - int(positions[i]) != 1:
                continue
            if terms[i] in self.common or terms[i + 1] in self.common:
                out_t.append(terms[i] + SEPARATOR + terms[i + 1])
                out_p.append(int(positions[i]))
        return out_t, out_p


def common_grams_query(terms, common_words) -> list[str]:
    """CommonGramsQueryFilter.java:35 reduction over a plain token list:
    keep grams; a unigram is dropped when a gram starts at its slot, and
    the last unigram is dropped when a gram ends there."""
    common = frozenset(common_words)
    n = len(terms)
    starts = set()
    grams: dict[int, str] = {}
    for i in range(n - 1):
        if terms[i] in common or terms[i + 1] in common:
            starts.add(i)
            grams[i] = terms[i] + SEPARATOR + terms[i + 1]
    out: list[str] = []
    for i, t in enumerate(terms):
        if i in starts:
            out.append(grams[i])
            continue  # unigram replaced by the gram starting here
        if i == n - 1 and (i - 1) in starts:
            continue  # final unigram consumed by the gram ending on it
        out.append(t)
    return out
