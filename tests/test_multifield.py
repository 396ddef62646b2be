"""Per-field postings formats via build_multi_field_index
(codecs/perfield/PerFieldPostingsFormat.java:62): one index, several
fields, each with its own IndexOptions level and analysis chain."""

import pytest
from pyspark.sql import Row, functions as F

from lucene_spark.index.build import IndexConfig, build_multi_field_index
from lucene_spark.search import query as Q
from lucene_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def midx(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, body="spark builds an index fast", title="spark index"),
            Row(doc_id=1, body="duckdb checks the oracle", title="oracle check"),
            Row(doc_id=2, body="spark oracle spark", title="spark again"),
        ]
    )
    cfgs = [
        IndexConfig(text_col="body", field_name="body", docs_per_segment=64),
        # per-field format difference: the title field indexes DOCS_AND_FREQS
        # only (no positions) — a different IndexOptions level than body
        IndexConfig(
            text_col="title", field_name="title", docs_per_segment=64,
            with_positions=False,
        ),
    ]
    idx = build_multi_field_index(spark, docs, cfgs, doc_id_col="doc_id")
    return idx, IndexSearcher(idx)


def test_fields_are_isolated(midx):
    idx, s = midx
    body_hits = {r.doc_id for r in s.search(Q.TermQuery("body", "spark"), k=10).collect()}
    title_hits = {r.doc_id for r in s.search(Q.TermQuery("title", "spark"), k=10).collect()}
    assert body_hits == {0, 2}
    assert title_hits == {0, 2}
    # 'check' appears in title field only (body has 'checks')
    assert {r.doc_id for r in s.search(Q.TermQuery("title", "check"), k=10).collect()} == {1}
    assert s.search(Q.TermQuery("body", "check"), k=10).count() == 0


def test_per_field_stats_and_norms(midx):
    idx, s = midx
    assert set(idx.fieldstats) == {"body", "title"}
    assert idx.fieldstats["body"].sum_total_term_freq == 5 + 4 + 3
    assert idx.fieldstats["title"].sum_total_term_freq == 2 + 2 + 2
    # same term, different field stats -> different BM25 scores
    b = s.search(Q.TermQuery("body", "spark"), k=10).collect()
    t = s.search(Q.TermQuery("title", "spark"), k=10).collect()
    assert {r.doc_id for r in b} == {r.doc_id for r in t}
    assert [r.score for r in b] != [r.score for r in t]


def test_cross_field_boolean(midx):
    _, s = midx
    q = Q.BooleanQuery.of(
        must=[Q.TermQuery("body", "oracle")], should=[Q.TermQuery("title", "spark")]
    )
    rows = s.search(q, k=10).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    # doc2 matches both clauses -> must outrank doc1's single clause
    assert rows[0].doc_id == 2


def test_positions_only_where_indexed(midx):
    _, s = midx
    # phrase works on body (positions stored)
    ph = s.search(Q.PhraseQuery("body", ("spark", "builds")), k=10).collect()
    assert [r.doc_id for r in ph] == [0]
    # title blocks carry no position payloads (with_positions=False)
    blocks = s.index.postings.filter(F.col("field") == "title").select("positions").collect()
    assert all(len(r.positions or b"") == 0 for r in blocks)


def test_suggest_family_filters_to_one_field(midx):
    """termstats is field-tagged on multi-field indexes: the suggest
    scans must not return per-field duplicate rows for a term present in
    several fields ('spark' and 'oracle' appear in both body and title)."""
    from lucene_spark.search import extras

    idx, searcher = midx
    rows = extras.suggest_infix(searcher, "park", n=10).collect()
    assert [r["term"] for r in rows] == ["spark"]
    assert len(rows) == 1  # body df only, not one row per field
    by_field = extras.suggest_infix(searcher, "park", n=10, field="title").collect()
    assert [r["term"] for r in by_field] == ["spark"]
    assert extras.suggest(searcher, "orac", n=10).count() == 1
    assert extras.suggest_fuzzy(searcher, "spalk", n=10).count() == 1


def test_analyzing_infix_suggester(spark):
    """Full AnalyzingInfixSuggester lookup semantics
    (suggest/analyzing/AnalyzingInfixSuggester.java:624-717): all tokens
    but the last are exact clauses, the last is a prefix clause matched
    against ANY token (the infix part); a trailing space makes the final
    token exact; allTermsRequired toggles MUST vs SHOULD; rank by weight."""
    from lucene_spark.search.extras import infix_suggest

    sugg = spark.createDataFrame(
        [
            Row(text="a day at the beach", weight=10),
            Row(text="the big bear", weight=30),
            Row(text="the beagle barks", weight=20),
            Row(text="beachfront property", weight=40),
        ]
    )
    # 'the bea' -> exact 'the' AND prefix 'bea' on any token
    rows = infix_suggest(sugg, "the bea", n=5).collect()
    assert [r.suggestion for r in rows] == [
        "the big bear",
        "the beagle barks",
        "a day at the beach",
    ]
    assert [r.weight for r in rows] == [30, 20, 10]
    # trailing space: final token is EXACT (maxEndOffset rule :670)
    rows = infix_suggest(sugg, "the bea ", n=5).collect()
    assert rows == []
    rows = infix_suggest(sugg, "the beach ", n=5).collect()
    assert [r.suggestion for r in rows] == ["a day at the beach"]
    # allTermsRequired=False: SHOULD semantics — any clause hit qualifies
    rows = infix_suggest(sugg, "the beach", n=5, all_terms_required=False).collect()
    assert [r.suggestion for r in rows] == [
        "beachfront property",
        "the big bear",
        "the beagle barks",
        "a day at the beach",
    ]
    # empty key -> no suggestions
    assert infix_suggest(sugg, "   ", n=5).count() == 0
