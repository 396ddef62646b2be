"""MemoryIndex (memory/MemoryIndex.java:125 analog) score fidelity.

Scores must equal the independent pure-Python oracle's scores for the
same text as a 1-doc corpus — the exact contract the reference's
MemoryIndex has with a real 1-doc index. No Spark involved.
"""

import numpy as np
import pytest

from lucene_spark.search import query as Q
from lucene_spark.streaming.memory_index import MemoryIndex

from tests.oracle import OracleIndex

TEXT = "the quick brown fox jumps over the lazy dog the fox"


@pytest.fixture()
def mi():
    return MemoryIndex().add_field("text", TEXT)


@pytest.fixture()
def oracle():
    return OracleIndex({0: TEXT})


def test_term_score_matches_oracle(mi, oracle):
    got = mi.search(Q.TermQuery("text", "fox"))
    want = float(oracle.term_scores("fox")[0])
    assert got == pytest.approx(want, abs=0.0), (got, want)
    assert mi.search(Q.TermQuery("text", "absent")) == 0.0


def test_boolean_and_phrase_match_oracle(mi, oracle):
    q = Q.BooleanQuery.of(
        must=[Q.TermQuery("text", "fox")], should=[Q.TermQuery("text", "lazy")]
    )
    want = float(np.float32(oracle.term_scores("fox")[0] + oracle.term_scores("lazy")[0]))
    assert mi.search(q) == pytest.approx(want, rel=1e-6)

    ph = float(oracle.phrase_scores(["quick", "brown"])[0])
    assert mi.search(Q.PhraseQuery("text", ("quick", "brown"))) == pytest.approx(
        ph, rel=1e-6
    )
    assert mi.search(Q.PhraseQuery("text", ("brown", "quick"))) == 0.0


def test_sloppy_phrase_matches_oracle(mi, oracle):
    q = Q.PhraseQuery("text", ("quick", "fox"), slop=2)
    want = float(oracle.sloppy_scores(["quick", "fox"], slop=2)[0])
    assert mi.search(q) == pytest.approx(want, rel=1e-6)


def test_must_not_and_msm(mi):
    q = Q.BooleanQuery.of(
        must=[Q.TermQuery("text", "fox")], must_not=[Q.TermQuery("text", "dog")]
    )
    assert mi.search(q) == 0.0
    q2 = Q.BooleanQuery.of(
        should=[Q.TermQuery("text", "fox"), Q.TermQuery("text", "absent")],
        minimum_should_match=2,
    )
    assert mi.search(q2) == 0.0


def test_dict_queries_constant_score(mi):
    assert mi.search(Q.PrefixQuery("text", "qui")) == 1.0
    assert mi.search(Q.WildcardQuery("text", "l*zy")) == 1.0
    assert mi.search(Q.RegexpQuery("text", "d.g")) == 1.0
    assert mi.search(Q.FuzzyQuery("text", "foxx", max_edits=1)) == 1.0
    assert mi.search(Q.TermRangeQuery("text", "dog", "fox")) == 1.0
    assert mi.search(Q.PrefixQuery("text", "zz")) == 0.0


def test_dismax(mi, oracle):
    a = float(oracle.term_scores("fox")[0])
    b = float(oracle.term_scores("dog")[0])
    q = Q.DisjunctionMaxQuery(
        (Q.TermQuery("text", "fox"), Q.TermQuery("text", "dog")), tie_breaker=0.5
    )
    want = max(a, b) + 0.5 * min(a, b)
    assert mi.search(q) == pytest.approx(want, rel=1e-6)


def test_dismax_tied_clauses_keep_one_max_in_tiebreak():
    """Two clauses scoring EXACTLY equal: the tie-break sum drops ONE max
    occurrence, not every clause tying it (DisjunctionMaxScorer:
    score = max + tie * (sum - max))."""
    mi = MemoryIndex().add_field("text", "fox dog")
    a = mi.search(Q.TermQuery("text", "fox"))
    b = mi.search(Q.TermQuery("text", "dog"))
    assert a == b and a > 0
    q = Q.DisjunctionMaxQuery(
        (Q.TermQuery("text", "fox"), Q.TermQuery("text", "dog")), tie_breaker=0.5
    )
    want = float(np.float32(a + np.float32(0.5) * np.float32((a + b) - a)))
    assert mi.search(q) == pytest.approx(want, abs=0.0)


def test_multi_phrase_absent_alternative_idf_excluded(mi):
    """df=0 slot alternatives contribute no idf (MultiPhraseQuery.java:227
    ts.docFreq() > 0): adding an absent alternative must not change the
    score."""
    base = mi.search(Q.MultiPhraseQuery("text", (("quick",), ("brown",))))
    with_absent = mi.search(
        Q.MultiPhraseQuery("text", (("quick",), ("brown", "zzzabsent")))
    )
    assert base > 0
    assert with_absent == pytest.approx(base, abs=0.0)
