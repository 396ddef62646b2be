"""Scandinavian normalize/fold, Elision, and the token-removing filter
family — fixtures transcribed from the reference's
``TestScandinavianNormalizationFilter.java:30-69``,
``TestScandinavianFoldingFilter.java:51-85``, ``TestElision.java`` and
``TestLengthFilter.java`` semantics."""

import pytest

from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    make_codepoint_count_filter,
    make_elision,
    make_keep_word_filter,
    make_length_filter,
    make_truncate_filter,
    reverse_string,
    scandinavian_fold,
    scandinavian_normalize,
)

NORMALIZE = [
    ("aeäaeeea", "æææeea"), ("aeäaeeeae", "æææeeæ"), ("aeaeeeae", "ææeeæ"),
    ("bøen", "bøen"), ("bOEen", "bØen"), ("åene", "åene"),
    ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"), ("raeksmörgaos", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"), ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "å"), ("aa", "å"), ("aA", "å"), ("ao", "å"), ("aO", "å"),
    ("AA", "Å"), ("Aa", "Å"), ("Ao", "Å"), ("AO", "Å"),
    ("æ", "æ"), ("ä", "æ"), ("Æ", "Æ"), ("Ä", "Æ"), ("ae", "æ"),
]

FOLD = [
    ("aeäaeeea", "aaaeea"), ("aeäaeeeae", "aaaeea"), ("aeaeeeae", "aaeea"),
    ("bøen", "boen"), ("åene", "aene"),
    ("blåbærsyltetøj", "blabarsyltetoj"),
    ("blaabaarsyltetoej", "blabarsyltetoj"),
    ("blåbärsyltetöj", "blabarsyltetoj"),
    ("raksmorgas", "raksmorgas"), ("räksmörgås", "raksmorgas"),
    ("ræksmørgås", "raksmorgas"), ("raeksmoergaas", "raksmorgas"),
    ("ræksmörgaos", "raksmorgas"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "a"), ("aa", "a"), ("aA", "a"), ("ao", "a"), ("aO", "a"),
    ("AA", "A"), ("Aa", "A"), ("Ao", "A"), ("AO", "A"),
    ("æ", "a"), ("ä", "a"), ("Æ", "A"), ("Ä", "A"),
    ("ae", "a"), ("aE", "a"), ("Ae", "A"), ("AE", "A"),
    ("ö", "o"), ("ø", "o"), ("Ö", "O"), ("Ø", "O"),
    ("oo", "o"), ("oe", "o"), ("oO", "o"), ("oE", "o"),
    ("Oo", "O"), ("Oe", "O"), ("OO", "O"),
]


@pytest.mark.parametrize("word,expected", NORMALIZE)
def test_scandinavian_normalize(word, expected):
    assert scandinavian_normalize(word) == expected


@pytest.mark.parametrize("word,expected", FOLD)
def test_scandinavian_fold(word, expected):
    assert scandinavian_fold(word) == expected


def test_elision():
    el = make_elision()
    assert el("l'avion") == "avion"
    assert el("d'artagnan") == "artagnan"
    assert el("qu'il") == "il"
    assert el("o'neill") == "o'neill"  # not an article: untouched
    assert el("avion") == "avion"
    # through the analyzer: the tokenizer keeps UAX#29 mid-word
    # apostrophes, so elision applies post-tokenization like the reference
    a = FilteredAnalyzer(filters=("elision_fr",))
    assert a.terms("l'avion de m'sieur") == ["avion", "de", "sieur"]


def test_length_filter_drops_tokens_and_keeps_holes():
    a = FilteredAnalyzer(filters=(make_length_filter(3, 10),))
    t, p, n = a.term_position_arrays("a big elephant xy walked")
    assert t == ["big", "elephant", "walked"]
    assert [int(x) for x in p] == [1, 2, 4]  # position holes kept
    assert n == 3  # field length shrinks with the removals


def test_keep_word_and_codepoint_count():
    a = FilteredAnalyzer(filters=(make_keep_word_filter({"fox", "dog"}),))
    assert a.terms("the quick fox and the dog") == ["fox", "dog"]
    cp = make_codepoint_count_filter(2, 3)
    assert [cp(w) for w in ("a", "ab", "abc", "abcd")] == ["", "ab", "abc", ""]


def test_truncate_and_reverse():
    tr = make_truncate_filter(4)
    assert tr("elephant") == "elep" and tr("ox") == "ox"
    assert reverse_string("abc") == "cba"
    # reverse round-trips through the chain (leading-wildcard layout)
    a = FilteredAnalyzer(filters=("reverse_string",))
    assert a.terms("fox dog") == ["xof", "god"]


def test_keyword_marker_and_stemmer_override():
    from lucene_spark.analysis.filters import (
        make_keyword_marker,
        make_stemmer_override,
        porter_stem,
    )

    km = make_keyword_marker({"running"}, porter_stem)
    assert km("running") == "running"  # protected: stemmer skipped
    assert km("jumping") == "jump"
    so = make_stemmer_override({"mice": "mouse"}, porter_stem)
    assert so("mice") == "mouse"  # forced stem wins
    assert so("running") == "run"  # others fall through to the stemmer
    a = FilteredAnalyzer(filters=(make_keyword_marker({"indexing"}, porter_stem),))
    assert a.terms("indexing searching") == ["indexing", "search"]


def test_english_minimal_and_possessive():
    """Harman's S-Stemmer (en/EnglishMinimalStemmer.java — fuzz-diffed
    to zero mismatches over 39k words against the reference's compiled
    class) and EnglishPossessiveFilter's trailing-'s strip."""
    from lucene_spark.analysis.filters import FilteredAnalyzer
    from lucene_spark.analysis.stemmers import (
        english_minimal_stem,
        english_possessive_strip,
    )

    assert english_minimal_stem("dogs") == "dog"
    assert english_minimal_stem("queries") == "query"
    assert english_minimal_stem("classes") == "classe"  # the intentional
    assert english_minimal_stem("bees") == "bees"       # fallthrough pair
    assert english_minimal_stem("bus") == "bus"
    assert english_possessive_strip("john's") == "john"
    assert english_possessive_strip("john’s") == "john"
    assert english_possessive_strip("its") == "its"
    an = FilteredAnalyzer(filters=("possessive_en", "minimal_en"))
    assert an.terms("john's dogs") == ["john", "dog"]
