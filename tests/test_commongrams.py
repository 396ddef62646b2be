"""CommonGrams — replays the reference's
``TestCommonGramsFilter.testCommonGramsQueryFilter`` fixture table
(every s/n combination, commongrams/TestCommonGramsFilter.java:100-131)
and pins the index-side overlay semantics + a KeywordRepeat-style
overlay through FilteredAnalyzer."""

import pytest

from lucene_spark.analysis.commongrams import CommonGrams, common_grams_query
from lucene_spark.analysis.filters import FilteredAnalyzer

COMMON = {"of", "the", "s"}

QUERY_CASES = [
    ("brown fox", ["brown", "fox"]),
    ("the fox", ["the_fox"]),
    ("fox of", ["fox_of"]),
    ("of the", ["of_the"]),
    ("the", ["the"]),
    ("foo", ["foo"]),
    ("n n n", ["n", "n", "n"]),
    ("quick brown fox", ["quick", "brown", "fox"]),
    ("n n s", ["n", "n_s"]),
    ("quick brown the", ["quick", "brown_the"]),
    ("n s n", ["n_s", "s_n"]),
    ("quick the brown", ["quick_the", "the_brown"]),
    ("n s s", ["n_s", "s_s"]),
    ("fox of the", ["fox_of", "of_the"]),
    ("s n n", ["s_n", "n", "n"]),
    ("the quick brown", ["the_quick", "quick", "brown"]),
    ("s n s", ["s_n", "n_s"]),
    ("the fox of", ["the_fox", "fox_of"]),
    ("s s n", ["s_s", "s_n"]),
    ("of the fox", ["of_the", "the_fox"]),
]


@pytest.mark.parametrize("text,expected", QUERY_CASES, ids=[c[0] for c in QUERY_CASES])
def test_common_grams_query_filter(text, expected):
    assert common_grams_query(text.split(), COMMON) == expected


def test_common_grams_index_side_overlays():
    a = FilteredAnalyzer(common_grams=CommonGrams(COMMON))
    t, p, n = a.term_position_arrays("the quick brown fox of the")
    got = list(zip(t, [int(x) for x in p]))
    assert got == [
        ("the", 0), ("the_quick", 0), ("quick", 1), ("brown", 2),
        ("fox", 3), ("fox_of", 3), ("of", 4), ("of_the", 4), ("the", 5),
    ]
    assert n == 6  # grams are posIncr-0 overlaps: norms discount them


def test_common_grams_never_bridge_holes():
    cg = CommonGrams(COMMON)
    # positions 0 and 2 are not adjacent (a dropped token between them)
    assert cg.grams(["the", "fox"], [0, 2]) == ([], [])


def test_keyword_repeat_overlay():
    """KeywordRepeatFilter.java:33 shape: original token kept, its stem
    emitted as a same-position overlay (so exact and stemmed forms both
    index)."""
    from lucene_spark.analysis.filters import porter_stem

    a = FilteredAnalyzer(overlay_filters=(lambda t: [porter_stem(t)],))
    t, p, n = a.term_position_arrays("running fox")
    got = set(zip(t, [int(x) for x in p]))
    assert got == {("running", 0), ("run", 0), ("fox", 1)}
    assert n == 2
