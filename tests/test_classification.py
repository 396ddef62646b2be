"""Classifier unit tests (lucene/classification module analogs).

The driver-contract pairs (classify_knn, classify_naive_bayes) are covered
by the registry replica in tests/test_entry.py; these pin the math on a
tiny hand-built corpus against independent pure-Python recomputations of
KNearestNeighborClassifier.buildListFromTopDocs and
SimpleNaiveBayesClassifier's add-1-smoothed likelihood.
"""

import math

import pytest

from lucene_spark.index.build import IndexConfig, build_index
from lucene_spark.search import query as Q
from lucene_spark.search.classification import knn_classify, naive_bayes_classify
from lucene_spark.search.searcher import IndexSearcher

DOCS = [
    (0, "py", "def main print hello world print"),
    (1, "py", "import os def helper print path"),
    (2, "java", "public static void main string args print"),
    (3, "java", "public class hello world static method"),
    (4, "go", "func main package fmt println hello"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    cfg = IndexConfig(text_col="text", field_name="text", doc_id_col="doc_id")
    idx = build_index(spark, docs, cfg)
    return docs, IndexSearcher(idx)


def test_knn_classify_matches_hand_computation(corpus):
    docs, s = corpus
    k = 4
    out = knn_classify(s, docs, "hello world print", k=k).collect()
    # independent recomputation from the searcher's own top-k
    q = Q.BooleanQuery.of(
        should=[Q.TermQuery("text", t) for t in ("hello", "world", "print")]
    )
    top = s.search(q, k=k).collect()
    lang = {d: l for d, l, _ in DOCS}
    max_score = top[0]["score"]
    boosts, counts = {}, {}
    for r in top:
        c = lang[r["doc_id"]]
        counts[c] = counts.get(c, 0) + 1
        boosts[c] = boosts.get(c, 0.0) + r["score"] / max_score
    sumdoc = sum(counts.values())
    want = {}
    for c in counts:
        raw = boosts[c] / k
        want[c] = round(raw * k / sumdoc if sumdoc < k else raw, 6)
    got = {r["label"]: (r["class_count"], r["score"]) for r in out}
    assert {c: n for c, (n, _) in got.items()} == counts
    for c in counts:
        assert got[c][1] == pytest.approx(want[c], abs=1e-6)
    # ordered best-first
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_knn_classify_sumdoc_correction(corpus):
    """k larger than the match set exercises the sumdoc < k branch
    (KNearestNeighborClassifier.java:228-232)."""
    docs, s = corpus
    out = knn_classify(s, docs, "println", k=10).collect()
    # only doc 4 contains println -> one class, boost=1, score=1/1
    assert len(out) == 1
    assert out[0]["label"] == "go"
    assert out[0]["score"] == pytest.approx(1.0, abs=1e-6)


def test_naive_bayes_matches_hand_computation(corpus):
    docs, s = corpus
    text = "print hello print"  # duplicate word: multiplicity matters
    out = naive_bayes_classify(s, docs, text).collect()

    toks = {d: t.split() for d, _, t in DOCS}
    lang = {d: l for d, l, _ in DOCS}
    classes = sorted({l for _, l, _ in DOCS})
    class_docs = {c: sum(1 for d in lang.values() if d == c) for c in classes}
    n_docs = len(DOCS)
    vocab_pairs = len({(d, w) for d, ws in toks.items() for w in ws})
    avg_unique = vocab_pairs / n_docs
    words = text.split()

    def hits(w, c):
        return sum(1 for d, ws in toks.items() if lang[d] == c and w in ws)

    want = {}
    for c in classes:
        den = avg_unique * class_docs[c] + n_docs
        ll = sum(math.log((hits(w, c) + 1) / den) for w in words)
        want[c] = math.log(class_docs[c]) - math.log(n_docs) + ll
    smax = max(want.values())
    lse = smax + math.log(sum(math.exp(v - smax) for v in want.values()))

    got = {r["label"]: (r["log_score"], r["prob"]) for r in out}
    assert set(got) == set(classes)
    for c in classes:
        assert got[c][0] == pytest.approx(want[c], abs=1e-6)
        assert got[c][1] == pytest.approx(math.exp(want[c] - lse), abs=1e-6)
    assert sum(p for _, p in got.values()) == pytest.approx(1.0, abs=1e-5)
    # ordered best-first
    ls = [r["log_score"] for r in out]
    assert ls == sorted(ls, reverse=True)


def test_classify_empty_text_raises(corpus):
    docs, s = corpus
    with pytest.raises(ValueError):
        knn_classify(s, docs, "   ")
    with pytest.raises(ValueError):
        naive_bayes_classify(s, docs, "...")
