"""Dictionary lemmatization (the morfologik role,
analysis/morfologik/.../MorfologikFilter.java:46): TSV loading, lookup,
and both analysis-chain modes — pure-Python, no Spark needed (the
tokenizer chain is driver-side code shared with the oracle)."""

import pytest

from lucene_spark.analysis.filters import FilteredAnalyzer
from lucene_spark.analysis.lemma import DictionaryLemmatizer

# Polish-shaped sample in the morfologik plain-text input format:
# inflected<TAB>lemma<TAB>tag. 'mamy' is genuinely ambiguous in Polish
# (form of 'mama' the noun AND 'mieć' the verb).
TSV = """
# inflected\tlemma\ttag
domy\tdom\tsubst:pl:nom:m3
domów\tdom\tsubst:pl:gen:m3
domu\tdom\tsubst:sg:gen:m3
mamy\tmama\tsubst:pl:nom:f
mamy\tmieć\tverb:fin:pl:pri
psa\tpies\tsubst:sg:gen:m2
psy\tpies\tsubst:pl:nom:m2
Warszawie\tWarszawa\tsubst:sg:loc:f
"""


@pytest.fixture(scope="module")
def lem():
    return DictionaryLemmatizer.parse_tsv(TSV)


def test_tsv_lookup_and_ambiguity(lem):
    assert lem.lemmas("domy") == ["dom"]
    assert lem.lemmas("mamy") == ["mama", "mieć"]  # file order
    assert lem.lemmas("unknown") == []
    # case folding both sides, like the lowercased token stream
    assert lem.lemmas("warszawie") == ["warszawa"]
    assert lem.interpretations("psa") == [("pies", "subst:sg:gen:m2")]
    with pytest.raises(ValueError, match="inflected"):
        DictionaryLemmatizer.parse_tsv("onlyoneword")


def test_replace_mode_first_lemma(lem):
    an = FilteredAnalyzer(filters=(lem.filter(),))
    assert an.terms("domy domów psa") == ["dom", "dom", "pies"]
    # ambiguous form takes the FIRST interpretation; unknowns pass
    assert an.terms("mamy kota") == ["mama", "kota"]


def test_graph_mode_keeps_surface_and_overlays(lem):
    an = FilteredAnalyzer(overlay_filters=(lem.expander(),))
    terms, pos, n = an.term_position_arrays("mamy domy")
    by_pos = {}
    for t, p in zip(terms, [int(x) for x in pos]):
        by_pos.setdefault(p, set()).add(t)
    # surface forms kept; every interpretation overlays at the position
    assert by_pos[0] == {"mamy", "mama", "mieć"}
    assert by_pos[1] == {"domy", "dom"}
    # norm length counts base tokens only (overlays are posIncr 0)
    assert n == 2


def test_from_dataframe_guard_shape():
    # the guard path without Spark: entries built directly
    lem = DictionaryLemmatizer({"a": [("b", ""), ("b", "dup"), ("c", "")]})
    assert lem.lemmas("a") == ["b", "c"]  # duplicate lemma collapsed
