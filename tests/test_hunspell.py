"""Hunspell engine replayed against the reference's own test fixtures.

Three layers:
1. stemming tables transcribed from the reference's stemmer unit tests
   (TestStemmer/TestCircumfix/TestTwoFold/... — multiset equality);
2. every .good/.wrong spell fixture in the reference test tree
   (TestSpellChecking.java checkSpellCheckerExpectations convention:
   dictionary decoded per its SET charset, word lists always UTF-8);
3. a generation-direction cross-check: every surface form `unmunch`
   produces must spell as correct and must stem back to its root.
"""

from __future__ import annotations

import glob
import os

import pytest

from lucene_spark.analysis.hunspell import Hunspell, HunspellDictionary, unmunch

BASE = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/hunspell/"
)
SIMPLE_BASE = (
    "/root/reference/lucene/analysis.tests/src/test/org/apache/lucene/"
    "analysis/tests/"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference fixtures not available"
)


def _load(aff, dic, base=BASE):
    return Hunspell(HunspellDictionary.load(base + aff, base + dic))


# --- 1. stemming tables (assertStemsTo transcriptions) ---------------------

# TestStemmer.java over simple.aff/simple.dic
SIMPLE_STEMS = {
    "lucene": ["lucene", "lucen"],
    "mahoute": ["mahout"],
    "solr": ["olr"],
    "abcd": [],
    "ab": ["ab"],
    "abc": ["ab"],
    "apach": ["apach"],
    "apache": ["apach"],
    "foo": ["foo", "foo"],
    "food": ["foo"],
    "foos": ["foo"],
    "lucen": ["lucen"],
    "mahout": ["mahout"],
    "moo": ["moo"],
    "mood": ["moo"],
    "olr": ["olr"],
    "abs": [],
    "abe": [],
    "sab": [],
    "sapach": [],
    "sapache": [],
    "apachee": [],
    "sfoo": [],
    "sfoos": [],
    "fooss": [],
    "lucenee": [],
    "solre": [],
}


def test_simple_stemmer_replay():
    h = _load("simple.aff", "simple.dic", base=SIMPLE_BASE)
    for word, want in SIMPLE_STEMS.items():
        assert sorted(h.stems(word)) == sorted(want), word


# per-feature tables from the reference's Test{Circumfix,TwoSuffixes,...}
FEATURE_STEMS = {
    ("circumfix.aff", "circumfix.dic"): {
        "nagy": ["nagy"],
        "nagyobb": ["nagy"],
        "legnagyobb": ["nagy"],
        "legeslegnagyobb": ["nagy"],
        "nagyobbobb": [],
        "legnagy": [],
        "legeslegnagy": [],
    },
    ("twosuffixes.aff", "twosuffixes.dic"): {
        "drink": ["drink"],
        "drinkable": ["drink"],
        "drinks": ["drink"],
        "drinkableable": [],
        "drinkss": [],
    },
    ("twofold.aff", "morph.dic"): {
        "drink": ["drink"],
        "drinkable": ["drink"],
        "drinkables": ["drink"],
        "drinksable": [],
        "drinkableable": [],
        "drinks": [],
    },
    ("fullstrip.aff", "fullstrip.dic"): {"tasty": ["beer"], "as": ["a"], "s": []},
    ("needaffix.aff", "needaffix.dic"): {
        "drink": ["drink"],
        "drinks": ["drink"],
        "walk": [],
        "walks": ["walk"],
        "prewalk": ["walk"],
        "prewalks": ["walk"],
        "test": [],
        "pretest": [],
        "tests": [],
        "pretests": [],
    },
    ("zeroaffix.aff", "zeroaffix.dic"): {"drink": ["drinksierranevada"]},
    ("complexprefix.aff", "complexprefix.dic"): {
        "ptwofoo": ["foo"],
        "poneptwofoo": ["foo"],
        "foosuf": ["foo"],
        "ptwofoosuf": ["foo"],
        "poneptwofoosuf": ["foo"],
        "ponefoo": [],
        "ponefoosuf": [],
        "ptwoponefoo": [],
        "ptwoponefoosuf": [],
    },
    ("flaglong.aff", "flaglong.dic"): {
        "foo": ["foo"],
        "foos": ["foo"],
        "fooss": [],
        "foobogus": [],
    },
    ("flagnum.aff", "flagnum.dic"): {"foo": ["foo"], "foos": ["foo"], "fooss": []},
    ("conv.aff", "conv.dic"): {
        "drink": ["drInk"],
        "drInk": ["drInk"],
        "drInkAble": ["drInk"],
        "drInkABle": ["drInk"],
        "drinkABle": ["drInk"],
    },
    ("ignore.aff", "ignore.dic"): {
        "drink": ["drink"],
        "drinkable": ["drink"],
        "dr'ink-able": ["drink"],
        "drank-able": ["drank"],
        "'-'-'-": [],
    },
    ("escaped.aff", "escaped.dic"): {
        "/": ["/"],
        "works": ["work"],
        "work": ["work"],
        "R2/D2": ["R2/D2", "R2/d2"],
        "R2/D2s": ["R2/D2"],
        "N/A": ["N/A"],
        "N/As": [],
        "/a": ["/a"],
        "//": [],
    },
    ("homonyms.aff", "homonyms.dic"): {"works": ["work", "work"]},
    ("morphalias.aff", "morphalias.dic"): {
        "feet": ["foot"],
        "feetscratcher": ["foot"],
        "work": ["workverb", "worknoun"],
        "works": ["workverb", "worknoun"],
        "notspecial": ["notspecial"],
        "simplenoun": ["simplenoun"],
        "simplenouns": ["simplenoun"],
        "simplenounscratcher": [],
    },
    ("morphdata.aff", "morphdata.dic"): {
        "feet": ["foot"],
        "feetscratcher": ["foot"],
        "work": ["workverb", "worknoun"],
        "works": ["workverb", "worknoun"],
        "notspecial": ["notspecial"],
        "simplenoun": ["simplenoun"],
        "simplenouns": ["simplenoun"],
        "simplenounscratcher": [],
    },
    ("optional-condition.aff", "condition.dic"): {
        "hello": ["hello"],
        "try": ["try"],
        "tried": ["try"],
        "work": ["work"],
        "worked": ["work"],
        "rework": ["work"],
        "reworked": ["work"],
        "retried": [],
        "workied": [],
        "tryed": [],
        "tryied": [],
        "helloed": [],
    },
    ("condition.aff", "condition.dic"): {
        "hello": ["hello"],
        "try": ["try"],
        "tried": ["try"],
        "work": ["work"],
        "worked": ["work"],
        "rework": ["work"],
        "reworked": ["work"],
        "retried": [],
        "workied": [],
        "tryed": [],
        "tryied": [],
        "helloed": [],
    },
}


@pytest.mark.parametrize("files", sorted(FEATURE_STEMS), ids=lambda f: f[0])
def test_feature_stems(files):
    h = _load(*files)
    for word, want in FEATURE_STEMS[files].items():
        assert sorted(h.stems(word)) == sorted(want), word


# --- 2. spell-check fixture replay ------------------------------------------


def _fixture_names():
    names = []
    for good in sorted(glob.glob(BASE + "*.good")):
        name = os.path.basename(good)[:-5]
        if os.path.exists(BASE + name + ".aff") and os.path.exists(
            BASE + name + ".dic"
        ):
            names.append(name)
    return names


@pytest.mark.parametrize("name", _fixture_names())
def test_spell_fixture(name):
    h = _load(name + ".aff", name + ".dic")
    for w in open(BASE + name + ".good", encoding="utf-8").read().splitlines():
        w = w.strip()
        if w:
            assert h.spell(w), f"+{w}"
    wrong = BASE + name + ".wrong"
    if os.path.exists(wrong):
        for w in open(wrong, encoding="utf-8").read().splitlines():
            w = w.strip()
            if w:
                assert not h.spell(w), f"-{w}"


def test_fixture_count_is_complete():
    # every .good fixture in the reference tree replays (no silent skips)
    assert len(_fixture_names()) == 43


# --- 3. suggestion replay (.sug fixtures) ------------------------------------


def _sug_fixture_names():
    names = []
    for sug in sorted(glob.glob(BASE + "*.sug")):
        name = os.path.basename(sug)[:-4]
        if all(
            os.path.exists(BASE + name + ext) for ext in (".aff", ".dic", ".wrong")
        ):
            names.append(name)
    return names


@pytest.mark.parametrize("name", _sug_fixture_names())
def test_suggestions_fixture(name):
    """Exact suggestion lists, in order, for every .wrong word — the
    TestSpellChecking.java suggest() convention (lines of ', '-joined
    suggestions, empty lines dropped)."""
    from lucene_spark.analysis.hunspell_suggest import Suggester

    d = HunspellDictionary.load(BASE + name + ".aff", BASE + name + ".dic")
    sg = Suggester(d)
    lines = []
    for w in open(BASE + name + ".wrong", encoding="utf-8").read().splitlines():
        w = w.strip()
        if w:
            joined = ", ".join(sg.suggest(w))
            if joined:
                lines.append(joined)
    want = open(BASE + name + ".sug", encoding="utf-8").read().strip()
    assert "\n".join(lines) == want


def test_sug_fixture_count_is_complete():
    assert len(_sug_fixture_names()) == 23


# --- 4. generation-direction cross-check ------------------------------------


@pytest.mark.parametrize(
    "files",
    [
        ("simple.aff", "simple.dic"),
        ("circumfix.aff", "circumfix.dic"),
        ("needaffix.aff", "needaffix.dic"),
        ("twosuffixes.aff", "twosuffixes.dic"),
    ],
    ids=lambda f: f[0],
)
def test_unmunch_round_trip(files):
    base = SIMPLE_BASE if files[0] == "simple.aff" else BASE
    d = HunspellDictionary.load(base + files[0], base + files[1])
    h = Hunspell(d)
    forms = unmunch(d)
    assert forms, "unmunch produced nothing"
    for form, roots in forms.items():
        assert h.spell(form), f"generated form not accepted: {form}"
        stems = set(h.stems(form))
        assert stems & roots, f"{form}: stems {stems} miss roots {roots}"


# --- 5. distributed batch suggest -------------------------------------------


def test_suggest_batch_distributed(spark):
    """mapInPandas batch did-you-mean equals the driver-side suggester."""
    from lucene_spark.analysis.hunspell_suggest import Suggester, suggest_batch

    d = HunspellDictionary.load(BASE + "base.aff", BASE + "base.dic")
    sg = Suggester(d)
    words = ["created", "createdd", "rided", "sckool"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.word: (r.is_correct, list(r.suggestions))
           for r in suggest_batch(df, d).collect()}
    for w in words:
        ok = sg.speller.spell(w)
        want = [] if ok else sg.suggest(w)[:5]
        assert got[w] == (ok, want), w
