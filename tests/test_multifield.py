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
