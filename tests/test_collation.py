"""Collation sort keys (ICUCollationKeyAnalyzer.java:47 role): rule
grammar, strength truncation, numeric collation, and a machine check of
the induced ORDER against the JDK's own java.text.RuleBasedCollator —
the same compiled-reference validation the KStem engine got."""

import shutil
import subprocess

import pytest

from lucene_spark.analysis.collation import (
    CollationKeyAnalyzer,
    RuleBasedCollator,
    collation_key_udf,
)


def test_primary_permutation():
    c = RuleBasedCollator("< c,C < a,A < b,B")
    assert c.sorted(["aa", "ba", "ca"]) == ["ca", "aa", "ba"]


def test_tertiary_case_and_secondary_accent_interleave():
    # UCA level order: all secondaries compare before any tertiary,
    # so the case pair bE sits between be and the accented bé
    c = RuleBasedCollator("< a,A < b,B < e,E ; é,É < f,F")
    assert c.sorted(["bé", "bE", "bÉ", "be"]) == ["be", "bE", "bé", "bÉ"]


def test_contraction_sorts_as_unit():
    c = RuleBasedCollator("< a,A < b,B < c,C < ch < d,D")
    assert c.sorted(["cz", "chz", "da"]) == ["cz", "chz", "da"]
    assert c.compare("cz", "chz") < 0  # ch > c even though 'h' absent


def test_reset_inserts_after_anchor():
    c = RuleBasedCollator("< a,A < b,B < d,D & a < x,X")
    assert c.sorted(["xd", "ad", "bd", "dd"]) == ["ad", "xd", "bd", "dd"]


def test_strength_truncates_levels():
    sec = RuleBasedCollator("< a,A < b,B", strength="secondary")
    assert sec.sort_key("aB") == sec.sort_key("Ab")  # case-insensitive
    pri = RuleBasedCollator("< a,A < e,E ; é,É", strength="primary")
    assert pri.sort_key("é") == pri.sort_key("e")  # accent-insensitive
    ter = RuleBasedCollator("< a,A < b,B")
    assert ter.sort_key("aB") != ter.sort_key("Ab")


def test_numeric_collation_orders_by_value():
    c = RuleBasedCollator(numeric=True)
    got = c.sorted(["NATION_10", "NATION_2", "NATION_0", "NATION_21"])
    assert got == ["NATION_0", "NATION_2", "NATION_10", "NATION_21"]
    # leading zeros are insignificant at every strength (documented)
    assert c.sort_key("a007b") == c.sort_key("a7b")


def test_untailored_chars_sort_after_tailored_band():
    c = RuleBasedCollator("< z,Z < a,A")
    # 'm' is untailored -> default band, after every tailored element
    assert c.sorted(["m", "a", "z"]) == ["z", "a", "m"]


def test_unknown_reset_and_bad_rules_raise():
    with pytest.raises(ValueError):
        RuleBasedCollator("& q < a")
    with pytest.raises(ValueError):
        RuleBasedCollator("a < b")
    with pytest.raises(ValueError):
        RuleBasedCollator("< a", strength="quaternary")


def test_analyzer_hex_terms_preserve_order():
    an = CollationKeyAnalyzer(RuleBasedCollator("< b,B < a,A"))
    assert an.key("ba") < an.key("ab")  # hex strings keep byte order


_JDK_CASES = [
    ("< c,C < a,A < b,B",
     ["ab", "Ab", "ba", "ca", "Ca", "cb", "aa", "bc", "BC", "cc"]),
    ("< a,A < b,B < e,E ; é,É < f,F",
     ["be", "bé", "bE", "bÉ", "ef", "éf", "fa", "fe"]),
    ("< a,A < b,B < c,C < ch < d,D",
     ["cz", "chz", "da", "ca", "cha", "cb", "ab"]),
    ("< a,A < b,B < d,D & a < x,X",
     ["ad", "xd", "bd", "dd", "Xa", "xa", "ax"]),
]

_JAVA_SRC = """
import java.text.RuleBasedCollator;
import java.util.*;
public class CollCheck {
  public static void main(String[] args) throws Exception {
    RuleBasedCollator c = new RuleBasedCollator(args[0]);
    List<String> words = new ArrayList<>();
    Scanner sc = new Scanner(System.in, "UTF-8");
    while (sc.hasNextLine()) { String l = sc.nextLine(); if (!l.isEmpty()) words.add(l); }
    words.sort(c);
    for (String w : words) System.out.println(w);
  }
}
"""


@pytest.fixture(scope="module")
def jdk_sorter(tmp_path_factory):
    if shutil.which("javac") is None:
        pytest.skip("no JDK")
    d = tmp_path_factory.mktemp("collcheck")
    (d / "CollCheck.java").write_text(_JAVA_SRC)
    subprocess.run(["javac", "CollCheck.java"], cwd=d, check=True)

    def run(rules, words):
        p = subprocess.run(
            ["java", "-cp", str(d), "CollCheck", rules],
            input="\n".join(words), capture_output=True, text=True,
        )
        assert p.returncode == 0, p.stderr
        return p.stdout.splitlines()

    return run


@pytest.mark.parametrize("rules,words", _JDK_CASES)
def test_order_matches_jdk_rulebasedcollator(jdk_sorter, rules, words):
    assert RuleBasedCollator(rules).sorted(words) == jdk_sorter(rules, words)


def test_fuzz_order_matches_jdk(jdk_sorter):
    import random

    rules = "< o,O < a,A ; â,Â < n,N < c,C < ch < b,B ; é"
    alpha = ["o", "O", "a", "A", "â", "Â", "n", "N", "c", "C", "b", "B", "é", "ch"]
    for seed in (42, 7, 99):
        random.seed(seed)
        words = list({
            "".join(random.choice(alpha) for _ in range(random.randint(1, 5)))
            for _ in range(400)
        })
        assert RuleBasedCollator(rules).sorted(words) == jdk_sorter(rules, words)


def test_collation_key_udf_sorts_dataframe(spark):
    df = spark.createDataFrame(
        [("NATION_10",), ("NATION_2",), ("NATION_0",)], "name string"
    )
    key = collation_key_udf(numeric=True)
    got = [
        r["name"]
        for r in df.orderBy(key("name")).collect()
    ]
    assert got == ["NATION_0", "NATION_2", "NATION_10"]
