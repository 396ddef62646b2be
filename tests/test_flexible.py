"""Flexible (standard) query parser: syntax -> node tree -> processor
pipeline -> Q.* builder (queryparser/flexible/standard/
StandardQueryParser.java:116). Parser-level tests need no Spark; the
e2e tests pin that a parsed query scores IDENTICALLY to the directly
constructed Q.* query through the same searcher, and that fn: interval
clauses compose inside booleans as Q.IntervalQuery leaves."""

import pytest

from lucene_spark.search import intervals as IV
from lucene_spark.search import query as Q
from lucene_spark.search.flexible import (
    QueryParseError,
    StandardQueryParser,
)


# ------------------------------------------------------------ parser unit


def test_classic_compat_boolean():
    q = StandardQueryParser().parse("apache AND lucene", "text")
    assert q == Q.BooleanQuery.of(
        must=[Q.TermQuery("text", "apache"), Q.TermQuery("text", "lucene")]
    )


def test_min_should_match_group():
    q = StandardQueryParser().parse("(blue crab fish)@2", "text")
    assert isinstance(q, Q.BooleanQuery)
    assert q.minimum_should_match == 2
    assert [c.occur for c in q.clauses] == [Q.Occur.SHOULD] * 3


def test_min_should_match_rejects_conjunction():
    with pytest.raises(QueryParseError):
        StandardQueryParser().parse("(a AND b)@2", "text")


def test_interval_fn_ordered():
    q = StandardQueryParser().parse("fn:ordered(quick brown fox)", "text")
    assert q == Q.IntervalQuery(
        "text", IV.Ordered(IV.Term("quick"), IV.Term("brown"), IV.Term("fox"))
    )


def test_interval_fn_nested_with_field():
    q = StandardQueryParser().parse(
        "title:fn:maxwidth(5 fn:atLeast(2 quick brown fox))", "text"
    )
    assert q.field == "title"
    assert q.source == IV.MaxWidth(
        5, IV.AtLeast(2, IV.Term("quick"), IV.Term("brown"), IV.Term("fox"))
    )


def test_interval_fn_quoted_phrase_arg():
    q = StandardQueryParser().parse('fn:containing(fn:unordered(a b) "c d")',
                                    "text")
    assert q.source == IV.Containing(
        IV.Unordered(IV.Term("a"), IV.Term("b")), IV.Phrase("c", "d")
    )


def test_interval_fn_unknown_raises():
    with pytest.raises(QueryParseError):
        StandardQueryParser().parse("fn:bogus(a b)", "text")


def test_points_config_turns_ranges_numeric():
    p = StandardQueryParser()
    p.set_points_config({"score": "double", "year": "long"})
    q = p.parse("score:{2.5 TO 7.3}", "text")
    assert q == Q.PointRangeQuery("score", 2.5, 7.3, False, False)
    q2 = p.parse("year:2024", "text")
    assert q2 == Q.PointRangeQuery("year", 2024, 2024, True, True)


def test_open_range_and_match_all():
    p = StandardQueryParser()
    q = p.parse("name:[jones TO *]", "text")
    assert q == Q.TermRangeQuery("name", "jones", None, True, True)
    assert p.parse("*:*", "text") == Q.MatchAllDocsQuery()


def test_multi_field_expansion_with_boosts():
    p = StandardQueryParser()
    p.set_multi_fields(["title", "body"])
    p.set_field_boosts({"title": 2.0})
    q = p.parse("die")
    assert q == Q.BooleanQuery.of(
        should=[
            Q.BoostQuery(Q.TermQuery("title", "die"), 2.0),
            Q.TermQuery("body", "die"),
        ]
    )


def test_leading_wildcard_gate():
    p = StandardQueryParser()
    with pytest.raises(QueryParseError):
        p.parse("*ending", "text")
    p.set_allow_leading_wildcard(True)
    assert p.parse("*ending", "text") == Q.WildcardQuery("text", "*ending")


def test_default_operator_and():
    p = StandardQueryParser()
    p.set_default_operator("AND")
    q = p.parse("a b OR c", "text")
    occ = [c.occur for c in q.clauses]
    assert occ == [Q.Occur.MUST, Q.Occur.MUST, Q.Occur.SHOULD]


def test_phrase_slop_default_applies():
    p = StandardQueryParser()
    p.set_phrase_slop(3)
    q = p.parse('"a b"', "text")
    assert q == Q.PhraseQuery("text", ("a", "b"), slop=3)
    # explicit slop wins
    q2 = p.parse('"a b"~1', "text")
    assert q2.slop == 1


def test_processor_pipeline_is_extensible():
    """The reason the flexible framework exists: inject a custom
    processor (rewrite every term 'colour' -> 'color') and a custom
    builder without subclassing."""
    from lucene_spark.search import flexible as FX

    class BritishProcessor:
        def process(self, node, config):
            def fn(n):
                if isinstance(n, FX.FieldQueryNode) and n.text == "colour":
                    return FX.FieldQueryNode(n.field, "color")
                return n

            return FX._map(node, fn)

    p = StandardQueryParser()
    p.processors.insert(0, BritishProcessor())
    assert p.parse("colour", "text") == Q.TermQuery("text", "color")

    # builder override: terms become constant-score
    p.builders[FX.FieldQueryNode] = lambda n, b, c: Q.ConstantScoreQuery(
        Q.TermQuery(n.field, n.text)
    )
    assert p.parse("colour", "text") == Q.ConstantScoreQuery(
        Q.TermQuery("text", "color")
    )


# ------------------------------------------------------------------- e2e


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search.searcher import IndexSearcher

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = IndexConfig(
        text_col="text", field_name="text", doc_id_col="doc_id",
        docs_per_segment=256,
    )
    return IndexSearcher(build_index(spark, docs, cfg))


def _rows(df):
    return [(r[0], r[1]) for r in df.collect()]


def test_parsed_equals_constructed_bm25(searcher):
    parsed = StandardQueryParser().parse("(sort group dup)@2", "text")
    direct = Q.BooleanQuery.of(
        should=[
            Q.TermQuery("text", "sort"),
            Q.TermQuery("text", "group"),
            Q.TermQuery("text", "dup"),
        ],
        minimum_should_match=2,
    )
    a = _rows(searcher.search(parsed, k=10).select("doc_id", "score"))
    b = _rows(searcher.search(direct, k=10).select("doc_id", "score"))
    assert a == b and a


def test_interval_query_leaf_scores_like_interval_query_fn(searcher):
    """Q.IntervalQuery through search() == intervals.interval_query
    directly (same saturation fold, same top-k)."""
    from pyspark.sql import functions as F

    q = StandardQueryParser().parse("fn:phrase(key value)", "text")
    assert isinstance(q, Q.IntervalQuery)
    a = _rows(searcher.search(q, k=10).select("doc_id", "score"))
    b = _rows(
        IV.interval_query(searcher, IV.Phrase("key", "value"), pivot=1.0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", "score")
    )
    assert a == b and a


def test_interval_clause_composes_in_boolean(searcher):
    """fn: clause AND bm25 clause through one BooleanQuery: every hit
    must match both, and the score is the float32 sum of the parts."""
    import numpy as np

    q = StandardQueryParser().parse(
        "(sort group dup)@2 AND fn:phrase(key value)", "text"
    )
    hits = _rows(searcher.search(q, k=10).select("doc_id", "score"))
    assert hits
    msm = {
        d: s for d, s in _rows(
            searcher.search(
                StandardQueryParser().parse("(sort group dup)@2", "text"),
                k=10_000,
            ).select("doc_id", "score")
        )
    }
    iv = {
        d: s for d, s in _rows(
            searcher.search(
                StandardQueryParser().parse("fn:phrase(key value)", "text"),
                k=10_000,
            ).select("doc_id", "score")
        )
    }
    for d, s in hits:
        assert d in msm and d in iv
        want = np.float32(float(msm[d]) + float(iv[d]))
        assert np.float32(s) == want, (d, s, msm[d], iv[d])
