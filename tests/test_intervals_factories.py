"""The rest of the Intervals.java factory surface — replays the exact
per-doc interval expectations of the reference's ``TestIntervals``
(``queries/src/test/.../intervals/TestIntervals.java``) over its own
field1/field2 corpus: extend, notContaining, atLeast (minimum-should-
match), before, after, overlapping, prefix, wildcard, plus containedBy
re-pinned against the reference arrays."""

import pytest

from lucene_spark.index.build import IndexConfig, build_index
from lucene_spark.search import intervals as IV
from lucene_spark.search.searcher import IndexSearcher

FIELD1 = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine days old.  Some like it hot, some like it cold, some like it in the pot nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot twelve days old.  Some like it cold, some like it hot, some like it in the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine years old.  Some like it hot, some like it twelve",
    "Porridge is great",
]
FIELD2 = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "a b a c b a b c",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6",
    "the quick brown fox jumps over the lazy dog",
]


def _searcher(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    cfg = IndexConfig(
        text_col="text", field_name="text", doc_id_col="doc_id",
        docs_per_segment=8,
    )
    return IndexSearcher(build_index(spark, df, cfg))


@pytest.fixture(scope="module")
def s1(spark):
    return _searcher(spark, FIELD1)


@pytest.fixture(scope="module")
def s2(spark):
    return _searcher(spark, FIELD2)


def _got(searcher, source):
    out = {}
    for r in IV.matches(searcher, source).collect():
        out.setdefault(int(r["doc_id"]), set()).add(
            (int(r["start"]), int(r["end"]))
        )
    return out


def _want(pairs_per_doc):
    return {
        d: {tuple(p) for p in pairs}
        for d, pairs in pairs_per_doc.items()
        if pairs
    }


def test_extend(s2):
    src = IV.Extend(IV.Term("fox"), 1, 2)
    assert _got(s2, src) == _want({6: [(2, 5)]})


def test_not_containing(s1):
    src = IV.NotContaining(
        IV.Ordered(IV.Term("porridge"), IV.Term("pease")), IV.Term("hot")
    )
    assert _got(s1, src) == _want({1: [(4, 6)], 2: [(1, 3)], 4: [(4, 6)]})


def test_at_least(s1):
    src = IV.AtLeast(
        3,
        IV.Term("porridge"), IV.Term("hot"), IV.Term("twelve"),
        IV.Term("nine"), IV.Term("pease"),
    )
    assert _got(s1, src) == _want({
        1: [(0, 2), (1, 3), (2, 4), (6, 11), (7, 17)],
        2: [(3, 5), (4, 6), (5, 7), (6, 11), (7, 21)],
        4: [(0, 2), (1, 3), (2, 4), (6, 11), (7, 17), (11, 21)],
    })


def test_after(s1):
    src = IV.After(
        IV.Term("porridge"),
        IV.Ordered(IV.Term("pease"), IV.Term("cold")),
    )
    assert _got(s1, src) == _want({
        1: [(7, 7)], 2: [(4, 4), (7, 7)], 4: [(7, 7)],
    })


def test_before(s1):
    src = IV.Before(IV.Term("cold"), IV.Term("twelve"))
    assert _got(s1, src) == _want({2: [(2, 2)], 4: [(5, 5)]})


def test_overlapping(s1):
    src = IV.Overlapping(
        IV.Unordered(IV.Term("hot"), IV.Term("porridge")),
        IV.Unordered(IV.Term("cold"), IV.Term("pease")),
    )
    assert _got(s1, src) == _want({
        1: [(2, 4), (7, 17)], 2: [(5, 7), (7, 21)], 4: [(2, 4)],
    })


def test_prefix(s1):
    src = IV.Prefix("p")
    assert _got(s1, src) == _want({
        1: [(p, p) for p in (0, 1, 3, 4, 6, 7, 10, 27)],
        2: [(p, p) for p in (0, 1, 3, 4, 6, 7, 10)],
        3: [(7, 7)],
        4: [(p, p) for p in (0, 1, 3, 4, 6, 7, 10)],
        5: [(0, 0)],
    })
    assert _got(s1, IV.Prefix("qqq")) == {}


def test_wildcard(s1):
    src = IV.Wildcard("?ot")
    assert _got(s1, src) == _want({
        1: [(p, p) for p in (2, 10, 17, 27)],
        2: [(p, p) for p in (5, 10, 21)],
        3: [(3, 3)],
        4: [(p, p) for p in (2, 10, 17)],
    })


def test_contained_by_reference_arrays(s1):
    src = IV.ContainedBy(
        IV.Term("porridge"),
        IV.Ordered(IV.Term("pease"), IV.Term("cold")),
    )
    assert _got(s1, src) == _want({
        1: [(4, 4), (7, 7)], 2: [(1, 1), (7, 7)], 4: [(4, 4)],
    })


def test_not_contained_by_and_non_overlapping(s1):
    # complement sanity: containedBy(u) ∪ notContainedBy(u) = all porridge
    contained = _got(s1, IV.ContainedBy(
        IV.Term("porridge"), IV.Ordered(IV.Term("pease"), IV.Term("cold"))
    ))
    not_contained = _got(s1, IV.NotContainedBy(
        IV.Term("porridge"), IV.Ordered(IV.Term("pease"), IV.Term("cold"))
    ))
    all_p = _got(s1, IV.Term("porridge"))
    for d, spans in all_p.items():
        assert contained.get(d, set()) | not_contained.get(d, set()) == spans
        assert contained.get(d, set()) & not_contained.get(d, set()) == set()
    # nonOverlapping ∪ overlapping = all source intervals
    ref = IV.Unordered(IV.Term("cold"), IV.Term("pease"))
    srcq = IV.Unordered(IV.Term("hot"), IV.Term("porridge"))
    ov = _got(s1, IV.Overlapping(srcq, ref))
    nov = _got(s1, IV.NonOverlapping(srcq, ref))
    allv = _got(s1, srcq)
    for d, spans in allv.items():
        assert ov.get(d, set()) | nov.get(d, set()) == spans


def test_interval_query_scoring(s1):
    """IntervalScorer.java:66 width discount + the two score functions:
    wider matches contribute 1/(width - minExtent + 1); saturation and
    sigmoid(exp=1) agree at pivot; sigmoid grows with exp."""
    import math

    src = IV.MaxGaps(2, IV.Ordered(IV.Term("pease"), IV.Term("cold")))
    rows = {
        r["doc_id"]: (r["start"], r["end"])
        for r in IV.matches(s1, src).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in IV.interval_query(s1, src, pivot=2.0).collect()
    }
    assert set(got) == set(rows)
    me = IV.min_extent(src)
    assert me == 2
    # recompute one doc by hand
    per_doc = {}
    for r in IV.matches(s1, src).collect():
        w = r["end"] - r["start"] + 1
        per_doc.setdefault(r["doc_id"], 0.0)
        per_doc[r["doc_id"]] += 1.0 / max(w - me + 1, 1)
    for d, f in per_doc.items():
        want = f / (f + 2.0)
        assert math.isclose(got[d], want, rel_tol=1e-6)
    # sigmoid with exp=1 equals saturation; larger exp sharpens
    sat = {
        r["doc_id"]: r["score"]
        for r in IV.interval_query(s1, src, pivot=2.0, mode="sigmoid", exp=1.0).collect()
    }
    for d in got:
        assert math.isclose(sat[d], got[d], rel_tol=1e-6)


@pytest.fixture(scope="module")
def s_multi(spark):
    """Two positioned fields per doc for the fixField cross-field cases."""
    from pyspark.sql import Row

    from lucene_spark.index.build import build_multi_field_index

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, body="alpha beta gamma delta", tags="red green blue"),
            Row(doc_id=1, body="beta alpha", tags="blue red"),
            Row(doc_id=2, body="gamma delta epsilon", tags="green yellow"),
            Row(doc_id=3, body="alpha alpha beta", tags="yellow"),
        ]
    )
    cfgs = [
        IndexConfig(text_col="body", field_name="body", docs_per_segment=8),
        IndexConfig(text_col="tags", field_name="tags", docs_per_segment=8),
    ]
    idx = build_multi_field_index(spark, docs, cfgs, doc_id_col="doc_id")
    return IndexSearcher(idx)


def test_fix_field_reads_the_fixed_field(s_multi):
    """Intervals.fixField (queries/intervals/Intervals.java): the wrapped
    source's intervals come from the FIXED field regardless of the field
    the matches call runs over."""
    fixed = _got(s_multi, IV.FixField("tags", IV.Term("red")))
    direct = {}
    for r in IV.matches(s_multi, IV.Term("red"), field="tags").collect():
        direct.setdefault(int(r["doc_id"]), set()).add(
            (int(r["start"]), int(r["end"]))
        )
    assert fixed == direct == {0: {(0, 0)}, 1: {(1, 1)}}
    # 'red' never occurs in body: without the fix there are no intervals
    assert _got(s_multi, IV.Term("red")) in ({}, dict())


def test_fix_field_composes_across_fields(s_multi):
    """A cross-field ordered source: body:alpha before tags:red in the
    shared position space — doc 0 (alpha@0 < red@0? no: ordered needs
    strictly after) vs doc 1 (alpha@1, red@1) — and fixField inside Or
    unions streams from different fields."""
    src = IV.Ordered(IV.Term("alpha"), IV.FixField("tags", IV.Term("red")))
    got = _got(s_multi, src)
    # doc 0: alpha@0, red@0 -> red does not start AFTER alpha ends -> none
    # doc 1: alpha@1, red@1 -> same -> none... construct a positive case:
    # tags 'green' sits at position 1 in doc 0 (after alpha@0)
    src2 = IV.Ordered(IV.Term("alpha"), IV.FixField("tags", IV.Term("green")))
    got2 = _got(s_multi, src2)
    assert 0 in got2 and got2[0] == {(0, 1)}
    assert got == {}  # the negative case above
    both = _got(
        s_multi,
        IV.Or(IV.Term("epsilon"), IV.FixField("tags", IV.Term("yellow"))),
    )
    # epsilon@2 in body of doc 2; yellow@1 (tags doc 2), yellow@0 (doc 3)
    assert both == {2: {(1, 1), (2, 2)}, 3: {(0, 0)}}
