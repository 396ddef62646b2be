"""SloppyPhraseMatcher parity (search/SloppyPhraseMatcher.java:52).

Three layers:
1. the faithful Python matcher reproduces the javadoc's documented
   behaviors (out-of-order matches, traversal asymmetry);
2. the JVM scan fold (spark_fold_expr) equals the faithful matcher on
   randomized position sets including adjusted-position ties;
3. the engine's two paths (JVM fold for 2 distinct terms; applyInPandas
   faithful matcher for the general shape) agree with each other on a
   built index.
"""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.search.sloppy import sloppy_freq, sloppy_matches, spark_fold_expr


def test_javadoc_examples():
    # "a b"~2 on "x a b a y": matched twice, distance 0 and distance 2
    assert sloppy_matches([[1, 3], [2]], 2) == [0, 2]
    # traversal asymmetry documented in the javadoc: "a b c b a"
    a, b, c = [0, 4], [1, 3], [2]
    assert sloppy_matches([a, b, c], 4) == [0, 4, 4]
    assert sloppy_matches([c, b, a], 4) == [4, 0]


def test_exact_match_is_distance_zero():
    assert sloppy_matches([[5], [6]], 0) == [0]
    assert sloppy_matches([[5], [7]], 0) == []   # gap 1 needs slop >= 1
    assert sloppy_matches([[5], [7]], 1) == [1]


def test_out_of_order_within_slop():
    # "b a": b at 0, a at 1 -> adjusted distance 2 (the transposition)
    assert sloppy_matches([[1], [0]], 2) == [2]
    assert sloppy_matches([[1], [0]], 1) == []


def test_repeated_term_phrase():
    # "my my" on "my my": second slot starts advanced (repeat init)
    assert sloppy_matches([[0, 1], [0, 1]], 0, terms=["my", "my"]) == [0]
    # "my my" on a doc with only ONE 'my': no match possible
    assert sloppy_matches([[3], [3]], 2, terms=["my", "my"]) == []


def test_spark_fold_equals_matcher(spark):
    """Randomized equivalence of the JVM fold with the faithful traversal,
    tie patterns included (term_a at p together with term_b at p+1)."""
    random.seed(202)
    cases = []
    for t in range(300):
        univ = list(range(14))
        na, nb = random.randint(1, 6), random.randint(1, 6)
        pa = sorted(random.sample(univ, na))
        pb = sorted(random.sample([u for u in univ if u not in pa], nb))
        slop = random.randint(0, 8)
        cases.append((t, pa, [p - 1 for p in pb], slop,
                      float(sloppy_freq([pa, pb], slop))))
    by_slop = {}
    for t, pa, pb, slop, w in cases:
        by_slop.setdefault(slop, []).append((t, pa, pb, w))
    for slop, rs in by_slop.items():
        df = spark.createDataFrame(
            [(t, pa, pb) for t, pa, pb, _ in rs],
            "t int, pa array<int>, pb array<int>",
        ).withColumn("posu", F.expr("array_sort(array_union(pa, pb))"))
        got = {
            r["t"]: r["fr"]
            for r in df.select(
                "t", F.expr(spark_fold_expr("posu", "pa", "pb", slop)).alias("fr")
            ).collect()
        }
        for t, pa, pb, w in rs:
            assert got[t] == np.float32(w), (t, pa, pb, slop, got[t], w)


def test_engine_paths_agree(spark):
    """search(PhraseQuery slop) [JVM fold] == search(MultiPhraseQuery with
    singleton slots) [general faithful-matcher UDF] on a real index."""
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import IndexSearcher

    texts = [
        "alpha beta gap alpha",             # in-order + extra alpha
        "beta alpha",                       # out-of-order (distance 2)
        "alpha x beta alpha beta",          # mixed, tie pattern at the end
        "alpha alpha beta beta alpha",      # clustered
        "beta gap gap alpha",               # far out-of-order
        "alpha beta alpha beta alpha beta", # dense alternation (ties)
        "gamma delta",                      # no terms
        "alpha gap gap gap beta",           # distance 3 in-order
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cfg = IndexConfig(text_col="text", field_name="text", doc_id_col="doc_id")
    idx = build_index(spark, docs, cfg)
    s = IndexSearcher(idx)
    for slop in (0, 1, 2, 3, 5):
        fold = {
            int(r["doc_id"]): r["score"]
            for r in s.scored(Q.PhraseQuery("text", ("alpha", "beta"), slop=slop)).collect()
        }
        udf = {
            int(r["doc_id"]): r["score"]
            for r in s.scored(
                Q.MultiPhraseQuery("text", (("alpha",), ("beta",)), slop=slop)
            ).collect()
        }
        if slop == 0:
            # slop=0 MultiPhrase goes through the exact join path too
            assert set(fold) == set(udf)
            for d in fold:
                assert fold[d] == udf[d]
        else:
            assert fold == udf, (slop, fold, udf)


def test_prunable_disjunction_shape_guard():
    """Multi-field or duplicate-term disjunctions must NOT take the
    single-field pruned plan (its block/weight tables key by bare term)."""
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import _as_prunable_disjunction

    ok = _as_prunable_disjunction(
        Q.BooleanQuery.of(
            should=[Q.TermQuery("text", "a"), Q.TermQuery("text", "b")]
        )
    )
    assert ok is not None
    assert (
        _as_prunable_disjunction(
            Q.BooleanQuery.of(
                should=[Q.TermQuery("title", "a"), Q.TermQuery("body", "a")]
            )
        )
        is None
    )
    assert (
        _as_prunable_disjunction(
            Q.BooleanQuery.of(
                should=[
                    Q.TermQuery("text", "a"),
                    Q.TermQuery("text", "a", boost=2.0),
                ]
            )
        )
        is None
    )


def test_multi_term_repeat_groups_hand_traced():
    """hasMultiTermRpts fixture, hand-traced through the reference
    traversal (SloppyPhraseMatcher.java:505 'hidden collision' example):
    P1={a,b}, P2={b,c}, doc 'a c b' (a:0, c:1, b:2) -> union positions
    P1=[0,2], P2=[1,2]. Slop 0 emits one distance-0 match (a@0, c@1);
    slop>=2 additionally emits the distance-2 tail match."""
    p1, p2 = [0, 2], [1, 2]
    ts = [("a", "b"), ("b", "c")]
    assert sloppy_matches([p1, p2], 0, terms=ts) == [0]
    assert sloppy_matches([p1, p2], 1, terms=ts) == [0]
    assert sloppy_matches([p1, p2], 2, terms=ts) == [0, 2]


def test_multi_term_repeat_degenerate_equals_single_term():
    """A multi-term slot whose extra terms are absent from the doc must
    behave exactly like the (trusted) single-term repeat path, and match
    counts must be monotone in slop."""
    import random

    rnd = random.Random(5)
    for _ in range(500):
        pa = sorted(rnd.sample(range(12), rnd.randint(1, 10)))
        pb = sorted(rnd.sample(range(12), rnd.randint(1, 10)))
        slop = rnd.randint(0, 5)
        assert sloppy_matches([pa, pa], slop, terms=["a", "a"]) == sloppy_matches(
            [pa, pa], slop, terms=[("a",), ("a", "zzz")]
        )
        assert sloppy_matches(
            [pa, pb, pa], slop, terms=["a", "b", "a"]
        ) == sloppy_matches(
            [pa, pb, pa], slop, terms=[("a",), ("b", "zzz"), ("a", "yyy")]
        )
        u = sorted(set(pa) | set(pb))
        ts = [("x", "y"), ("y", "x")]
        counts = [len(sloppy_matches([u, u], s, terms=ts)) for s in range(5)]
        assert counts == sorted(counts)


def test_multi_term_repeat_engine_path(spark):
    """Sloppy MultiPhraseQuery with a term shared across slots (the case
    that used to raise) runs through the engine; a degenerate shared-term
    query (extra terms absent from the corpus) scores identically to the
    single-term-repeat query it reduces to."""
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.searcher import IndexSearcher

    texts = [
        "alpha gamma beta",
        "alpha beta alpha",
        "beta beta alpha gamma",
        "alpha x y beta gamma beta",
        "gamma delta",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cfg = IndexConfig(text_col="text", field_name="text", doc_id_col="doc_id")
    idx = build_index(spark, docs, cfg)
    s = IndexSearcher(idx)
    for slop in (1, 2, 4):
        got = {
            int(r["doc_id"]): r["score"]
            for r in s.scored(
                Q.MultiPhraseQuery(
                    "text", (("alpha",), ("alpha", "zzz")), slop=slop
                )
            ).collect()
        }
        want = {
            int(r["doc_id"]): r["score"]
            for r in s.scored(
                Q.MultiPhraseQuery("text", (("alpha",), ("alpha",)), slop=slop)
            ).collect()
        }
        assert got == want, (slop, got, want)
    # true multi-term repeat: {alpha,beta} then {beta,gamma} — just assert
    # it executes and matches the faithful local matcher on every doc
    from lucene_spark.search.sloppy import sloppy_freq

    res = {
        int(r["doc_id"]): r["score"]
        for r in s.scored(
            Q.MultiPhraseQuery(
                "text", (("alpha", "beta"), ("beta", "gamma")), slop=3
            )
        ).collect()
    }
    expected_docs = set()
    for i, t in enumerate(texts):
        toks = t.split()
        pos = lambda ws: sorted(
            p for p, w in enumerate(toks) if w in ws
        )
        p1, p2 = pos({"alpha", "beta"}), pos({"beta", "gamma"})
        if p1 and p2 and sloppy_freq(
            [p1, p2], 3, terms=[("alpha", "beta"), ("beta", "gamma")]
        ) > 0:
            expected_docs.add(i)
    assert set(res) == expected_docs, (set(res), expected_docs)
