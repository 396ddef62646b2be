"""Minimal-interval algebra + spans layer semantics on a hand-built corpus
(queries/intervals/Intervals.java; queries/spans mapped onto intervals)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.build import IndexConfig, build_index
from lucene_spark.search import intervals as IV, spans as SP
from lucene_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def s(spark):
    texts = [
        (0, "a x b y a b c"),          # a:0,4  b:2,5  c:6
        (1, "b a"),                    # out of order
        (2, "a x x x b"),              # gap 3
        (3, "c c c"),                  # no a/b
        (4, "a b a b"),                # dense
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    idx = build_index(
        spark, docs, IndexConfig(text_col="text", field_name="text", doc_id_col="doc_id")
    )
    return IndexSearcher(idx)


def _rows(df):
    return sorted(
        (int(r["doc_id"]), int(r["start"]), int(r["end"])) for r in df.collect()
    )


def test_ordered_minimal(s):
    got = _rows(IV.matches(s, IV.Ordered(IV.Term("a"), IV.Term("b"))))
    # doc0: a0..b2 dominated by a4..b5? [0,2] and [4,5] — neither contains
    # the other; doc1 has no a-before-b; doc2: [0,4]; doc4: [0,1],[2,3]
    assert got == [(0, 0, 2), (0, 4, 5), (2, 0, 4), (4, 0, 1), (4, 2, 3)]


def test_unordered_includes_reversed(s):
    got = _rows(IV.matches(s, IV.Unordered(IV.Term("a"), IV.Term("b"))))
    assert (1, 0, 1) in got  # "b a" matches unordered


def test_maxgaps_filters(s):
    got = _rows(
        IV.matches(s, IV.MaxGaps(1, IV.Ordered(IV.Term("a"), IV.Term("b"))))
    )
    assert (2, 0, 4) not in got          # 3 gaps
    assert (0, 0, 2) in got              # 1 gap
    assert (4, 0, 1) in got              # 0 gaps


def test_containing_and_contained_by(s):
    big = IV.Unordered(IV.Term("a"), IV.Term("c"))
    got = _rows(IV.matches(s, IV.Containing(big, IV.Term("b"))))
    # doc0: minimal a..c window [4,6] contains b at 5
    assert got == [(0, 4, 6)]
    inner = _rows(IV.matches(s, IV.ContainedBy(IV.Term("b"), big)))
    assert inner == [(0, 5, 5)]


def test_or_minimalizes(s):
    got = _rows(IV.matches(s, IV.Or(IV.Term("a"), IV.Term("b"))))
    # plain union of single positions (never nested)
    assert (0, 0, 0) in got and (0, 2, 2) in got


def test_spans_map_to_intervals(s):
    near = SP.SpanNearQuery(
        (SP.SpanTermQuery("a"), SP.SpanTermQuery("b")), slop=1, in_order=True
    )
    got = {
        (int(r["doc_id"]), int(r["n_spans"]))
        for r in SP.span_count(s, near).collect()
    }
    assert got == {(0, 2), (4, 2)}
    first = SP.SpanFirstQuery(SP.SpanTermQuery("b"), end=3)
    fgot = _rows(SP.span_matches(s, first))
    assert fgot == [(0, 2, 2), (1, 0, 0), (4, 1, 1)]


def test_span_first_nested(s):
    """SpanFirstQuery composes inside SpanNear (MaxEnd is a real
    intervals combinator, not a top-level-only post-filter)."""
    inner = SP.SpanNearQuery(
        (SP.SpanFirstQuery(SP.SpanTermQuery("a"), 2), SP.SpanTermQuery("b")),
        slop=2,
        in_order=True,
    )
    got = _rows(SP.span_matches(s, inner))
    # only 'a' occurrences at position < 2 can anchor the near
    for doc_id, start, end in got:
        assert start < 2


def test_intervals_respect_deletes(s, spark):
    full = _rows(IV.matches(s, IV.Ordered(IV.Term("a"), IV.Term("b"))))
    assert any(d == 0 for d, _, _ in full)
    s.index.deletes = spark.createDataFrame([(0,)], "doc_id long")
    try:
        live = _rows(IV.matches(s, IV.Ordered(IV.Term("a"), IV.Term("b"))))
        assert all(d != 0 for d, _, _ in live)
        assert SP.span_count(
            s, SP.SpanTermQuery("a")
        ).filter("doc_id = 0").count() == 0
    finally:
        s.index.deletes = None


def test_or_dedup_keeps_densest_variant(s):
    """On equal (start, end) intervals from different Or branches, the
    densest (highest wmatch / fewest gaps) variant survives, so MaxGaps
    never rejects a genuinely gap-free match."""
    # a..b [0,2] via Ordered has wmatch 2 (1 gap); the same span via
    # Unordered(a, b, x?) — construct equal spans with different wmatch:
    src = IV.Or(
        IV.Ordered(IV.Term("a"), IV.Term("c")),           # doc0: [4,6] w2
        IV.Unordered(IV.Term("a"), IV.Term("b"), IV.Term("c")),  # doc0: [4,6] w3
    )
    rows = {
        (int(r["doc_id"]), int(r["start"]), int(r["end"])): int(r["wmatch"])
        for r in IV.matches(s, src).collect()
    }
    if (0, 4, 6) in rows:
        assert rows[(0, 4, 6)] == 3
    got = _rows(IV.matches(s, IV.MaxGaps(0, src)))
    assert (0, 4, 6) in got  # w3 over [4,6] has 0 gaps


def test_term_automaton(s, spark):
    """TermAutomatonQuery analog: graph phrases with ANY gaps and synonym
    branches over token positions (sandbox/TermAutomatonQuery.java)."""
    from lucene_spark.search.term_automaton import (
        ANY,
        TermAutomaton,
        automaton_count,
        automaton_matches,
    )

    # corpus (module fixture): doc0 "a x b y a b c", doc2 "a x x x b",
    # doc4 "a b a b"
    # "a ANY b": a at p, anything at p+1, b at p+2
    auto = TermAutomaton(((0, 1, "a"), (1, 2, ANY), (2, 3, "b")), frozenset({3}))
    got = sorted(
        (int(r["doc_id"]), int(r["start"]), int(r["end"]))
        for r in automaton_matches(s, auto).collect()
    )
    assert got == [(0, 0, 2)]  # doc0: a0 x1 b2; doc2 gap too long; doc4 none
    # synonym branch: "a (b|c)"
    auto2 = TermAutomaton(
        ((0, 1, "a"), (1, 2, "b"), (1, 2, "c")), frozenset({2})
    )
    got2 = {
        (int(r["doc_id"]), int(r["n_matches"]))
        for r in automaton_count(s, auto2).collect()
    }
    assert got2 == {(0, 1), (4, 2)}  # doc0: a4 b5; doc4: a0 b1, a2 b3
    # multiple path lengths to accept: "a b" or "a ANY b"
    auto3 = TermAutomaton(
        ((0, 1, "a"), (1, 2, "b"), (1, 3, ANY), (3, 2, "b")), frozenset({2})
    )
    got3 = sorted(
        (int(r["doc_id"]), int(r["start"]), int(r["end"]))
        for r in automaton_matches(s, auto3).collect()
    )
    assert (0, 0, 2) in got3 and (0, 4, 5) in got3 and (4, 0, 1) in got3
    # cyclic automatons are rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        TermAutomaton(((0, 1, "a"), (1, 0, "b")), frozenset({1}))


def test_term_automaton_any_initial_is_anchored(s):
    """An ANY-first automaton must anchor its frontier at the earliest
    term transition (start = term position - wildcard depth) instead of
    materializing every position of every doc: the plan carries no
    position-sequence explode, and the matches equal 'any token, then
    a, then b' — a at p >= 1 with b at p+1."""
    from lucene_spark.search.term_automaton import (
        ANY,
        TermAutomaton,
        automaton_matches,
    )

    auto = TermAutomaton(
        ((0, 1, ANY), (1, 2, "a"), (2, 3, "b")), frozenset({3})
    )
    df = automaton_matches(s, auto)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "sequence(" not in plan  # no corpus-wide position explode
    got = sorted(
        (int(r["doc_id"]), int(r["start"]), int(r["end"])) for r in df.collect()
    )
    # corpus: doc0 "a x b y a b c" -> a4 b5 with y3 before => [3,5];
    # doc4 "a b a b" -> a2 b3 with b1 before => [1,3]; doc1 "b a" no b
    # after a; doc2 gap too long
    assert got == [(0, 3, 5), (4, 1, 3)]
    # chained ANY prefix: ANY ANY a b — depth-2 anchoring
    auto2 = TermAutomaton(
        ((0, 1, ANY), (1, 2, ANY), (2, 3, "a"), (3, 4, "b")), frozenset({4})
    )
    got2 = sorted(
        (int(r["doc_id"]), int(r["start"]), int(r["end"]))
        for r in automaton_matches(s, auto2).collect()
    )
    assert got2 == [(0, 2, 5), (4, 0, 3)]
    # a term-free accepting path cannot be anchored
    auto3 = TermAutomaton(((0, 1, ANY), (1, 2, ANY)), frozenset({2}))
    with pytest.raises(NotImplementedError):
        automaton_matches(s, auto3)


def _py_minimalize(iv):
    """Pure-python replica of _minimalize (same-start shortest / max
    wmatch, drop dominated)."""
    best = {}
    for st, e, w in iv:
        cur = best.get(st)
        if cur is None or (e, -w) < (cur[0], -cur[1]):
            best[st] = (e, w)
    items = sorted((st, e, w) for st, (e, w) in best.items())
    return [
        (st, e, w)
        for st, e, w in items
        if not any(s2 > st and e2 <= e for s2, e2, _ in items)
    ]


def test_unordered_fold_set_exactness_property():
    """The pairwise unordered fold yields the exact minimal-interval SET
    of the n-ary enumeration (a dominated pair window covers a superset
    with any further interval, so dropping it never loses a final
    minimal window) — the property that justified _unordered_nary only
    having to fix wmatch, not the set. Brute-force check over random
    interval algebras."""
    import itertools
    import random

    rnd = random.Random(7)

    def fold(parts):
        out = _py_minimalize(parts[0])
        for p in parts[1:]:
            out = _py_minimalize(
                [
                    (min(a[0], b[0]), max(a[1], b[1]), a[2] + b[2])
                    for a in out
                    for b in p
                ]
            )
        return out

    def nary(parts):
        return _py_minimalize(
            [
                (
                    min(c[0] for c in combo),
                    max(c[1] for c in combo),
                    sum(c[2] for c in combo),
                )
                for combo in itertools.product(*parts)
            ]
        )

    wmatch_diffs = 0
    for _ in range(3000):
        parts = []
        for _ in range(rnd.choice([3, 3, 4])):
            iv = []
            for _ in range(rnd.randint(1, 4)):
                st = rnd.randint(0, 15)
                e = st + rnd.randint(0, 3)
                iv.append((st, e, e - st + 1))
            parts.append(_py_minimalize(iv))
        a, b = fold(parts), nary(parts)
        assert [(x, y) for x, y, _ in a] == [(x, y) for x, y, _ in b]
        if a != b:
            wmatch_diffs += 1
    assert wmatch_diffs > 0  # the fold DOES lose wmatch -> nary path needed


def test_unordered_nary_exact_wmatch(s):
    """n=3 unordered goes through the all-combinations plan: window set
    and wmatch equal the brute-force n-ary enumeration on the fixture
    corpus (doc0 'a x b y a b c': minimal {a,b,c} windows with true max
    wmatch feeding MaxGaps)."""
    df = IV.matches(s, IV.Unordered(IV.Term("a"), IV.Term("b"), IV.Term("c")))
    got = sorted(
        (int(r["doc_id"]), int(r["start"]), int(r["end"]), int(r["wmatch"]))
        for r in df.collect()
    )
    # doc0 positions: a{0,4} b{2,5} c{6}: the combo (a@4, b@5, c@6) gives
    # [4,6], which dominates every wider combo window ([2,6], [0,6], ...);
    # no other doc has all three
    assert got == [(0, 4, 6, 3)]
    # MaxGaps(2) must accept it: width 3, 3 matched -> 0 gaps
    got2 = _rows(
        IV.matches(
            s, IV.MaxGaps(2, IV.Unordered(IV.Term("a"), IV.Term("b"), IV.Term("c")))
        )
    )
    assert got2 == [(0, 4, 6)]


def test_surround_parser_grammar(spark):
    """Surround syntax (queryparser/surround/parser/QueryParser.jj):
    precedence OR<AND<NOT<N<W, infix left-associative distance folds,
    prefix n-ary forms, truncation expansion, boosts, field guard."""
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search import surround
    from lucene_spark.search.searcher import IndexSearcher

    texts = [
        "spark index merge fast",  # index/merge adjacent, ordered
        "index the merge",  # one gap
        "merge index now",  # reversed adjacency
        "index alone here",
        "spark table scan",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    idx = build_index(spark, docs, IndexConfig(doc_id_col="doc_id", docs_per_segment=4))
    s = IndexSearcher(idx)

    def run(q):
        return [(int(r["doc_id"]), float(r["score"])) for r in surround.execute(s, q).collect()]

    assert run("index W merge") == [(0, 1.0)]
    assert run("index 2W merge") == [(0, 1.0), (1, 1.0)]
    assert run("index N merge") == [(0, 1.0), (2, 1.0)]  # unordered adjacency
    assert run("2N(index, merge)") == [(0, 1.0), (1, 1.0), (2, 1.0)]
    assert run("3W(spark, index, merge)") == [(0, 1.0)]  # prefix n-ary
    assert run("index AND spark") == [(0, 2.0)]
    assert run("index NOT spark") == [(1, 1.0), (2, 1.0), (3, 1.0)]
    assert run("mer* W fast") == [(0, 1.0)]  # truncation inside W
    assert run("ind?x W merge") == [(0, 1.0)]
    assert run("zzz* W fast") == []  # empty expansion kills the distance op
    boosted = dict(run("index^3 OR table"))
    assert boosted[4] == 1.0 and boosted[0] == 3.0
    assert run("content: index W merge") == [(0, 1.0)]
    # infix distance with a parenthesized right operand (grammar: infix W
    # takes PrimaryQuery operands, which include groups)
    assert run("index W (merge)") == [(0, 1.0)]
    # OR groups are DistanceSubQuery operands -> SpanOr clauses
    assert run("(index OR table) W merge") == [(0, 1.0)]
    assert run("(merge OR table) W scan") == [(4, 1.0)]
    # operand boosts propagate through distance folds
    assert run("index^3 W merge") == [(0, 3.0)]
    # _DISTOP_NUM is 2-99: '0w'/'1w' are ordinary terms, not operators —
    # so 'a 0w b' is operator-less juxtaposition, a parse error
    with pytest.raises(surround.SurroundParseError):
        surround.parse("index 0w merge")
    assert run("0w OR index")[0][0] in (0, 1, 3)  # '0w' usable as a term
    with pytest.raises(NotImplementedError):
        surround.execute(s, "other: index")
    with pytest.raises(NotImplementedError):  # nested field guard
        surround.execute(s, "(other: index) W merge")
    with pytest.raises(surround.SurroundParseError):
        surround.parse("index AND")  # dangling operator
    with pytest.raises(surround.SurroundParseError):
        surround.parse("(index AND spark) W merge")  # AND is no DistanceSubQuery


def test_token_stream_to_term_automaton(s, spark):
    """TokenStreamToTermAutomatonQuery.java:38: an analyzed stream with
    posIncr-0 overlaps (synonym variants) becomes parallel transitions;
    position holes become ANY transitions; matching accepts either
    variant aligned over consecutive positions."""
    from lucene_spark.search.term_automaton import (
        automaton_matches,
        from_token_stream,
    )

    # synonym overlay: 'x' OR 'b' at position 0, then 'y' — matches
    # doc0 "a x b y a b c": window [2,3] via b,y and [1,?] x..y? x at 1,
    # y at 3 NOT consecutive -> only the b-variant aligns
    auto = from_token_stream([("x", 0), ("b", 0), ("y", 1)])
    got = {
        (r["doc_id"], r["start"], r["end"])
        for r in automaton_matches(s, auto).collect()
    }
    assert got == {(0, 2, 3)}

    # hole between tokens -> ANY transition: a <any> b
    auto2 = from_token_stream([("a", 0), ("b", 2)])
    got2 = {
        (r["doc_id"], r["start"], r["end"])
        for r in automaton_matches(s, auto2).collect()
    }
    direct = {
        (r["doc_id"], r["start"], r["end"])
        for r in automaton_matches(
            s,
            __import__("lucene_spark.search.term_automaton",
                       fromlist=["TermAutomaton"]).TermAutomaton(
                ((0, 1, "a"), (1, 2, None), (2, 3, "b")), frozenset({3})
            ),
        ).collect()
    }
    assert got2 == direct and got2
