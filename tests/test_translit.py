"""Rule-based transliteration (ICUTransformFilter.java:60 role): the
ICU transform-rule grammar subset — ordering, contexts, variables,
sets, the '|' cursor, compound passes — plus analyzer integration."""

import pytest

from lucene_spark.analysis.translit import Transliterator


def test_first_matching_rule_wins_in_order():
    t = Transliterator("sch > sh ; ch > tch ; c > k ;")
    assert t("school church cat") == "shool tchurtch kat"


def test_post_context_with_variable_set():
    t = Transliterator("$front = [ei] ; c } $front > s ; c > k ;")
    assert t("cell") == "sell"
    assert t("cat") == "kat"
    assert t("city") == "sity"


def test_pre_context_matches_buffer_not_source():
    # intervocalic s -> z; double s is protected by the left context
    t = Transliterator("[aeiou] { s } [aeiou] > z ;")
    assert t("casa mass base") == "caza mass baze"


def test_identity_rule_protects_a_digraph():
    t = Transliterator("ch > ch ; c > k ;")
    assert t("batch cost") == "batch kost"


def test_cursor_rescans_replacement():
    # x -> y with the cursor BEFORE y, so the next scan sees 'ya'
    t = Transliterator("x > | y ; ya > z ;")
    assert t("xa") == "z"


def test_set_ranges_and_negation():
    t = Transliterator("[a-c] > x ; [^a-z ] > '_' ;")
    assert t("abcdz A9") == "xxxdz __"


def test_quoted_syntax_chars_are_literals():
    t = Transliterator("'>' > gt ; '{' > ob ;")
    assert t(">{") == "gtob"


def test_compound_passes_greek_latin_starter():
    greek = """
    :: NFD ;
    [̀-ͯ] > ;     # strip combining accents after NFD
    :: Lower ;
    θ > th ; χ > ch ; φ > ph ; ψ > ps ;
    α > a ; β > b ; γ > g ; δ > d ; ε > e ;
    ζ > z ; η > e ; ι > i ; κ > k ; λ > l ;
    μ > m ; ν > n ; ξ > x ; ο > o ; π > p ;
    ρ > r ; σ > s ; ς > s ; τ > t ; υ > y ; ω > o ;
    :: NFC ;
    """
    t = Transliterator(greek)
    assert t("Αλφα") == "alpha"
    assert t("θεός") == "theos"
    assert t("ψυχή") == "psyche"


def test_bad_rules_raise():
    with pytest.raises(ValueError):
        Transliterator("a b ;")  # no '>'
    with pytest.raises(ValueError):
        Transliterator("a > b")  # missing ';'
    with pytest.raises(ValueError):
        Transliterator(":: Klingon ;")
    with pytest.raises(ValueError):
        Transliterator("$nope } x > y ;")


def test_nonterminating_cursor_fails_loudly():
    t = Transliterator("a > | a b ;")
    with pytest.raises(RuntimeError):
        t("a")


def test_as_token_filter_in_index(spark):
    from lucene_spark.analysis.filters import FilteredAnalyzer
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import IndexSearcher
    from tests.oracle import OracleIndex

    t = Transliterator("qu > kw ; c > k ;")
    an = FilteredAnalyzer(filters=(t,))
    texts = ["the quick cat", "a calm queue", "plain words"]
    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, content string"
    )
    idx = build_index(
        spark, docs, IndexConfig(doc_id_col="doc_id", docs_per_segment=4, analyzer=an)
    )
    s = IndexSearcher(idx)
    oracle = OracleIndex({i: s_ for i, s_ in enumerate(texts)}, analyzer=an)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in s.search(Q.TermQuery("content", "kwikk"), k=5).collect()
    ]
    assert got == oracle.top_k(oracle.term_scores("kwikk"), 5)
    assert [d for d, _ in got] == [0]


def test_iso9_cyrillic_latin_published_ruleset():
    """A genuinely published full-alphabet ruleset (ISO 9:1995 system A)
    through the transform grammar: Russian + Ukrainian + Serbian letters,
    both cases, reversibility (the standard's defining property — every
    Cyrillic letter maps to a distinct Latin form)."""
    import os

    from lucene_spark.analysis.translit import Transliterator

    path = os.path.join(
        os.path.dirname(__file__), "data", "cyrillic_latin_iso9.txt"
    )
    t = Transliterator(open(path, encoding="utf-8").read())
    cases = {
        "Москва": "Moskva",
        "Щёлково": "Ŝëlkovo",
        "Чайковский": "Čajkovskij",
        "журнал": "žurnal",
        "Київ": "Kiïv",
        "Ђоковић": "Đoković",
        "объём": "obʺëm",
    }
    for src, want in cases.items():
        assert t(src) == want, (src, t(src))
    # reversibility: distinct Cyrillic letters -> distinct outputs
    import re as _re

    rules = open(path, encoding="utf-8").read()
    pairs = _re.findall(r"(\S+)\s*>\s*(\S+)\s*;", rules)
    # reversible per the standard: distinct outputs within each case tier
    # (the hard/soft signs map to CASELESS modifier letters ʺ/ʹ for both
    # cases — the one place ISO 9 folds case, by design)
    lower = [o for s, o in pairs if s.lower() == s]
    upper = [o for s, o in pairs if s.upper() == s and s.lower() != s]
    assert len(lower) == len(set(lower)), "ISO 9 must be reversible"
    assert len(upper) == len(set(upper)), "ISO 9 must be reversible"
    assert len(pairs) >= 90  # full-alphabet scale, both cases
