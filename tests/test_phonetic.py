"""Phonetic module fixtures — every token-stream expectation in the
reference's ``lucene/analysis/phonetic`` tests replays exactly:

- TestPhoneticFilter.java / TestPhoneticFilterFactory.java:125-205
  (Metaphone, DoubleMetaphone, Soundex, RefinedSoundex, Caverphone2,
  ColognePhonetic, Nysiis — inject true/false)
- TestDoubleMetaphoneFilter.java:30-70 (size 4/8, inject permutations,
  alternate branches, non-convertible passthrough)
- TestDaitchMokotoffSoundexFilter.java:30-44 (branching codes)

plus published algorithm vectors (census Soundex H/W-rule names,
commons-codec Metaphone sentence) pinning the encoders beyond the
reference's short strings.
"""

import pytest

from lucene_spark.analysis.phonetic import (
    caverphone2,
    cologne_phonetic,
    daitch_mokotoff,
    daitch_mokotoff_tokens,
    double_metaphone,
    double_metaphone_tokens,
    metaphone,
    nysiis,
    phonetic_tokens,
    refined_soundex,
    soundex,
)

WORDS = ["aaa", "bbb", "ccc", "easgasg"]
POS = [0, 1, 2, 3]


def _stream(encoder, inject, words=WORDS):
    terms, _ = phonetic_tokens(words, range(len(words)), encoder, inject)
    return terms


# ---- TestPhoneticFilter.testAlgorithms / TestPhoneticFilterFactory ------


def test_phonetic_filter_metaphone():
    assert _stream(metaphone, True) == [
        "A", "aaa", "B", "bbb", "KKK", "ccc", "ESKS", "easgasg",
    ]
    assert _stream(metaphone, False) == ["A", "B", "KKK", "ESKS"]


def test_phonetic_filter_double_metaphone():
    assert _stream(double_metaphone, True) == [
        "A", "aaa", "PP", "bbb", "KK", "ccc", "ASKS", "easgasg",
    ]
    assert _stream(double_metaphone, False) == ["A", "PP", "KK", "ASKS"]


def test_phonetic_filter_soundex():
    assert _stream(soundex, True) == [
        "A000", "aaa", "B000", "bbb", "C000", "ccc", "E220", "easgasg",
    ]
    assert _stream(soundex, False) == ["A000", "B000", "C000", "E220"]


def test_phonetic_filter_refined_soundex():
    assert _stream(refined_soundex, True) == [
        "A0", "aaa", "B1", "bbb", "C3", "ccc", "E034034", "easgasg",
    ]
    assert _stream(refined_soundex, False) == ["A0", "B1", "C3", "E034034"]


def test_phonetic_filter_caverphone2():
    words = ["Darda", "Karleen", "Datha", "Carlene"]
    assert _stream(caverphone2, True, words) == [
        "TTA1111111", "Darda", "KLN1111111", "Karleen",
        "TTA1111111", "Datha", "KLN1111111", "Carlene",
    ]
    assert _stream(caverphone2, False, words) == [
        "TTA1111111", "KLN1111111", "TTA1111111", "KLN1111111",
    ]


def test_phonetic_filter_cologne():
    words = ["Meier", "Schmitt", "Meir", "Schmidt"]
    assert _stream(cologne_phonetic, True, words) == [
        "67", "Meier", "862", "Schmitt", "67", "Meir", "862", "Schmidt",
    ]
    assert _stream(cologne_phonetic, False, words) == ["67", "862", "67", "862"]


def test_phonetic_filter_nysiis():
    words = ["Macintosh", "Knuth", "Bart", "Hurd"]
    assert _stream(nysiis, True, words) == [
        "MCANT", "Macintosh", "NAT", "Knuth", "BAD", "Bart", "HAD", "Hurd",
    ]
    assert _stream(nysiis, False, words) == ["MCANT", "NAT", "BAD", "HAD"]
    assert _stream(nysiis, True) == [
        "A", "aaa", "B", "bbb", "C", "ccc", "EASGAS", "easgasg",
    ]
    assert _stream(nysiis, False) == ["A", "B", "C", "EASGAS"]


# ---- TestDoubleMetaphoneFilter -------------------------------------------


def test_dm_filter_size4_false_inject():
    t, _ = double_metaphone_tokens(["international"], [0], 4, False)
    assert t == ["ANTR"]


def test_dm_filter_size4_true_inject():
    t, p = double_metaphone_tokens(["international"], [0], 4, True)
    assert t == ["international", "ANTR"]
    assert p == [0, 0]


def test_dm_filter_alternate_inject_false():
    t, p = double_metaphone_tokens(["Kuczewski"], [0], 4, False)
    assert t == ["KSSK", "KXFS"]
    assert p == [0, 0]


def test_dm_filter_size8_false_inject():
    t, _ = double_metaphone_tokens(["international"], [0], 8, False)
    assert t == ["ANTRNXNL"]


def test_dm_filter_non_convertible():
    words = ["12345", "#$%@#^%&"]
    t, _ = double_metaphone_tokens(words, [0, 1], 8, True)
    assert t == words
    t, _ = double_metaphone_tokens(words, [0, 1], 8, False)
    assert t == words
    t, _ = double_metaphone_tokens(words + ["hello"], [0, 1, 2], 8, False)
    assert t == words + ["HL"]


# ---- TestDaitchMokotoffSoundexFilter --------------------------------------


def test_daitch_mokotoff_filter():
    want_codes = [
        "000000", "700000", "400000", "450000", "454000", "540000",
        "545000", "500000", "045450",
    ]
    t, _ = daitch_mokotoff_tokens(WORDS, POS, inject=True)
    assert t == [
        "aaa", "000000", "bbb", "700000",
        "ccc", "400000", "450000", "454000", "540000", "545000", "500000",
        "easgasg", "045450",
    ]
    t, p = daitch_mokotoff_tokens(WORDS, POS, inject=False)
    assert t == want_codes
    assert p == [0, 1, 2, 2, 2, 2, 2, 2, 3]


# ---- published algorithm vectors ------------------------------------------


@pytest.mark.parametrize(
    "word,code",
    [
        ("Robert", "R163"), ("Rupert", "R163"), ("Ashcraft", "A261"),
        ("Ashcroft", "A261"), ("Tymczak", "T522"), ("Pfister", "P236"),
        ("Honeyman", "H555"), ("Washington", "W252"), ("Lee", "L000"),
    ],
)
def test_soundex_census_vectors(word, code):
    assert soundex(word) == code


def test_metaphone_sentence():
    words = "the quick brown fox jumped over the lazy dogs".split()
    assert [metaphone(w) for w in words] == [
        "0", "KK", "BRN", "FKS", "JMPT", "OFR", "0", "LS", "TKS",
    ]


@pytest.mark.parametrize(
    "word,primary,alternate",
    [
        ("Smith", "SM0", "XMT"),
        ("Schmidt", "XMT", "SMT"),
        ("Jablonski", "JPLN", "APLN"),
        ("Wright", "RT", "RT"),
        ("Xavier", "SF", "SFR"),
        ("Jose", "HS", "HS"),
        ("school", "SKL", "SKL"),
        ("filipowicz", "FLPT", "FLPF"),
        ("Michael", "MKL", "MXL"),
    ],
)
def test_double_metaphone_branch_vectors(word, primary, alternate):
    assert double_metaphone(word) == primary
    assert double_metaphone(word, alternate=True) == alternate


def test_empty_and_degenerate_terms():
    assert soundex("12345") == ""
    assert nysiis("") == ""
    assert daitch_mokotoff("b") == ["700000"]
    # PhoneticFilter passes empties/digits through unchanged
    t, _ = phonetic_tokens(["", "123"], [0, 1], soundex, False)
    assert t == ["", "123"]


# ---- FilteredAnalyzer integration ------------------------------------------


def test_filtered_analyzer_phonetic_chain():
    from lucene_spark.analysis.filters import FilteredAnalyzer

    a = FilteredAnalyzer(filters=("phonetic_soundex",))
    # "table" and the misspelling "tabel" conflate to one code
    assert a.terms("the table tabel") == ["T000", "T140", "T140"]

    dm = FilteredAnalyzer(filters=("phonetic_double_metaphone",))
    assert dm.terms("international hello 12345") == ["ANTR", "HL", "12345"]
