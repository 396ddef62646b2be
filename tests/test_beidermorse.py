"""Beider-Morse Phonetic Matching engine (the BeiderMorseFilter role,
analysis/phonetic/.../BeiderMorseFilter.java:39): clean-room PhoneticEngine
with language guessing, context-gated rules, language-qualified phoneme
alternatives and approx/exact final tiers over a pluggable ruleset (the
commons-codec bm rule-file shapes). The built-in DEFAULT_RULES is a compact
starter set; the tests pin the engine mechanics and the headline
cross-spelling matches it produces."""

import pytest

from lucene_spark.analysis.beidermorse import (
    DEFAULT_RULES,
    Lang,
    PhoneticEngine,
    Rule,
    Ruleset,
    beider_morse,
    beider_morse_terms,
)

MATCH_PAIRS = [
    ("Schwarz", "Shvarts"),
    ("Weiss", "Vais"),
    ("Meyer", "Maier"),
    ("Cohen", "Kohn"),
    ("Tchaikovsky", "Czajkowski"),
    ("Stein", "Stain"),
    ("Yankel", "Jankel"),
]


@pytest.mark.parametrize("a,b", MATCH_PAIRS)
def test_cross_spelling_pairs_share_a_phoneme(a, b):
    ea = set(beider_morse_terms(a))
    eb = set(beider_morse_terms(b))
    assert ea & eb, (a, ea, b, eb)


def test_unrelated_names_do_not_collide():
    assert not set(beider_morse_terms("Schwarz")) & set(
        beider_morse_terms("Miller"))


def test_language_guessing_narrows_rules():
    # 'tsch' forces german; german ch -> x, so no english tS alternative
    rs = DEFAULT_RULES
    assert rs.guess_languages("tschudi") == frozenset(["german"])
    # 'w' and 'k' strike the romance languages
    assert "french" not in rs.guess_languages("kowalski")


def test_language_qualified_alternatives_filter():
    # spanish 'll' -> j only survives for spanish-guessed names
    terms = beider_morse_terms("llano")  # 'll' + 'ao' guess spanish
    assert any("j" in t or "ja" in t for t in terms)


def test_multi_part_names_emit_grouped_expression():
    enc = beider_morse("d'angelo")
    assert enc.startswith("(") and "-" in enc
    # the filter's ([^()|-]+) matcher finds the inner tokens
    assert beider_morse_terms("d'angelo")


def test_exact_tier_keeps_distinctions_approx_folds():
    approx = set(beider_morse_terms("weber", "approx"))
    exact = set(beider_morse_terms("weber", "exact"))
    # approx folds b->p and vowels; exact keeps the voiced b
    assert any("p" in t for t in approx)
    assert any("b" in t for t in exact)


def test_custom_ruleset_drop_in():
    rs = Ruleset(
        languages=frozenset(["x"]),
        lang_rules=(),
        rules=(Rule("ph", "", "", "f"), Rule("a", "", "", "a"),
               Rule("l", "", "", "l")),
        final_common={"approx": (), "exact": ()},
        final_by_lang={"approx": {}, "exact": {}},
    )
    eng = PhoneticEngine(rs, "approx")
    assert eng.encode("alpha") == "alfa"


def test_overlay_filter_injects_phonemes_at_position():
    from lucene_spark.analysis.beidermorse import beider_morse_terms as bmt
    from lucene_spark.analysis.filters import FilteredAnalyzer

    an = FilteredAnalyzer(overlay_filters=(lambda t: bmt(t),))
    terms, pos, n = an.term_position_arrays("schwarz shvarts")
    assert n == 2
    by_pos = {}
    for t, p in zip(terms, pos.tolist()):
        by_pos.setdefault(p, set()).add(t)
    # the two spellings now share an indexed phoneme at their positions
    assert by_pos[0] & by_pos[1]


def test_bm_file_format_loaders_round_trip():
    """The commons-codec bm data seam: a full ruleset loads from files in
    the published syntax (quoted 4-tuples, //-comments, /*...*/ blocks,
    #include splicing, lang triples) and the assembled Ruleset encodes
    IDENTICALLY to the in-code engine over a name list — proving the
    published tables drop in as data."""
    import os

    from lucene_spark.analysis import beidermorse as bm

    d = os.path.join(os.path.dirname(__file__), "data", "bm")

    def rd(name):
        return open(os.path.join(d, name), encoding="utf-8").read()

    rules = bm.parse_bm_rules(
        rd("ash_rules_any.txt"), include_resolver=lambda n: rd(n)
    )
    assert len(rules) == len(bm._RULES)  # include splices in order
    assert [r.pattern for r in rules] == [r.pattern for r in bm._RULES]
    rs = bm.Ruleset(
        languages=bm.parse_bm_languages(rd("languages.txt")),
        lang_rules=bm.parse_bm_lang(rd("lang.txt")),
        rules=rules,
        final_common={
            "approx": bm.parse_bm_rules(rd("ash_approx_any.txt")),
            "exact": (),
        },
        final_by_lang={"approx": {}, "exact": {}},
    )
    eng_file = bm.PhoneticEngine(rs, rule_type="approx")
    eng_code = bm.PhoneticEngine(bm.DEFAULT_RULES, rule_type="approx")
    for name in ["schwarz", "shvarts", "weiss", "vais", "tchaikovsky",
                 "czajkowski", "jablonski", "giordano", "quint"]:
        assert eng_file.encode(name) == eng_code.encode(name), name
    # error contracts
    with pytest.raises(ValueError, match="include_resolver"):
        bm.parse_bm_rules("#include missing.txt")
    with pytest.raises(ValueError, match="four quoted fields"):
        bm.parse_bm_rules('"a" "b" "c"')
    with pytest.raises(ValueError, match="pattern langs bool"):
        bm.parse_bm_lang("tsch german maybe")
