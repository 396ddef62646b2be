"""ICU normalization/folding replayed against the reference's own filter
test vectors (TestICUFoldingFilter.java / TestICUNormalizer2Filter.java),
token by token, plus the analyzer-chain integration."""

import pytest

from lucene_spark.analysis.icu import icu_fold, icu_normalize

# TestICUFoldingFilter.java:51-86 (tokens after StandardTokenizer)
FOLD_CASES = [
    ("This", "this"),
    ("Ruß", "russ"),
    ("ΜΆΪΟΣ", "μαιοσ"),
    ("Μάϊος", "μαιοσ"),
    ("𐐖", "𐐾"),
    ("ﴳﴺﰧ", "طمطمطم"),
    ("क्‍ष", "कष"),
    ("résumé", "resume"),
    ("résumé", "resume"),
    ("৭০৬", "706"),
    ("đis", "dis"),
    ("cræzy", "craezy"),
    ("ELİF", "elif"),
    ("eli̇f", "elif"),
    ("", ""),
]

# TestICUNormalizer2Filter.java:52-68 (default nfkc_cf normalizer)
NORM_CASES = [
    ("This", "this"),
    ("Ｔｅｓｔ", "test"),
    ("Ruß", "russ"),
    ("ΜΆΪΟΣ", "μάϊοσ"),
    ("Μάϊος", "μάϊοσ"),
    ("𐐖", "𐐾"),
    ("ﴳﴺﰧ", "طمطمطم"),
    ("क्‍ष", "क्ष"),
    ("", ""),
]


@pytest.mark.parametrize("src,want", FOLD_CASES, ids=repr)
def test_fold_vectors(src, want):
    assert icu_fold(src) == want


@pytest.mark.parametrize("src,want", NORM_CASES, ids=repr)
def test_normalize_vectors(src, want):
    assert icu_normalize(src) == want


def test_nfc_nfd_modes():
    assert icu_normalize("é", form="nfc") == "é"
    assert icu_normalize("ﬁ", form="nfkc") == "fi"
    with pytest.raises(ValueError):
        icu_normalize("x", form="bogus")


def test_filter_chain_integration():
    from lucene_spark.analysis.filters import FilteredAnalyzer

    a = FilteredAnalyzer(filters=("icu_folding",))
    # the analyzer lowercases first; the fold then strips the accents
    assert a.terms("Résumé writers") == ["resume", "writers"]
    # identity on plain ASCII — the synthetic corpus path is unchanged
    assert a.terms("table scan merge") == ["table", "scan", "merge"]
