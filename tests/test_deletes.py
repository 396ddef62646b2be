"""Delete / live-docs / update lifecycle (Lucene90LiveDocsFormat,
IndexWriter.updateDocument, tiered-merge delete reclaim semantics)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.build import IndexConfig
from lucene_spark.index.deletes import (
    delete_by_term,
    purge_merge,
    read_deletes,
    update_documents,
)
from lucene_spark.index.segments import build_segmented, load_segments
from lucene_spark.search import query as Q
from lucene_spark.search.searcher import IndexSearcher

SF = "/root/testdata/sf0.001"
CFG = IndexConfig(
    text_col="text", field_name="text", doc_id_col="doc_id", docs_per_segment=128
)


@pytest.fixture()
def idx_dir(spark, tmp_path):
    d = str(tmp_path / "delidx")
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(300)
    build_segmented(spark, docs, CFG, d)
    return d


def test_delete_hides_docs_but_stats_stay(spark, idx_dir):
    idx = load_segments(spark, idx_dir, CFG)
    n = delete_by_term(spark, idx_dir, idx, "text", "dup")
    assert n > 0
    idx2 = load_segments(spark, idx_dir, CFG)
    s2 = IndexSearcher(idx2)
    # deleted docs invisible to matches
    assert s2.matches(Q.TermQuery("text", "dup")).count() == 0
    # stats unchanged until reclaim (Lucene semantics)
    assert idx2.fieldstats["text"].doc_count == idx.fieldstats["text"].doc_count
    # count() falls back to live counting when deletes exist
    assert s2.count(Q.TermQuery("text", "dup")) == 0
    assert s2.count(Q.MatchAllDocsQuery()) == 300 - n


def test_update_documents_replaces(spark, idx_dir):
    idx = load_segments(spark, idx_dir, CFG)
    new = spark.createDataFrame(
        [("zzzupdated zzzupdated text", "en", "src0", 25, 7)],
        schema="text string, lang string, source string, n_chars long, doc_id_src long",
    )
    cfg = IndexConfig(
        text_col="text",
        field_name="text",
        doc_id_col=None,
        order_by=("source", "doc_id_src"),
        docs_per_segment=128,
    )
    n_del = update_documents(spark, idx_dir, idx, cfg, "source", new)
    assert n_del > 0  # every old doc with source=src0 deleted
    idx2 = load_segments(spark, idx_dir, CFG)
    s2 = IndexSearcher(idx2)
    hits = s2.search(Q.TermQuery("text", "zzzupdated"), k=5).collect()
    assert len(hits) == 1
    # all old src0 docs are deleted; the replacement contains no 'spark'
    assert s2.matches(Q.TermQuery("text", "spark")).join(
        idx2.docs.filter(F.col("source") == "src0").select("doc_id"), "doc_id", "semi"
    ).count() == 0


def test_purge_merge_reclaims(spark, idx_dir):
    idx = load_segments(spark, idx_dir, CFG)
    n = delete_by_term(spark, idx_dir, idx, "text", "vector")
    assert n > 0
    merged = purge_merge(spark, idx_dir, CFG)
    assert merged
    idx3 = load_segments(spark, idx_dir, CFG)
    assert idx3.deletes is None or idx3.deletes.count() == 0
    s3 = IndexSearcher(idx3)
    assert s3.matches(Q.TermQuery("text", "vector")).count() == 0
    # stats now reflect the purge: df('vector') gone from termstats
    assert (
        idx3.termstats.filter(F.col("term") == "vector").count() == 0
        or idx3.termstats.filter(F.col("term") == "vector").collect()[0]["df"] == 0
    )

def test_numeric_doc_values_update(spark, idx_dir):
    """IndexWriter.updateNumericDocValue (index/IndexWriter.java:1333):
    change a numeric per-doc column without reindexing; last-epoch wins;
    non-matching docs keep stored values; visible on overlay after
    reload; scoring state untouched."""
    from lucene_spark.index.deletes import (
        apply_dv_updates,
        read_dv_updates,
        update_numeric_doc_values,
    )

    idx = load_segments(spark, idx_dir, CFG)
    q = Q.TermQuery("text", "dup")
    n_dup = IndexSearcher(idx).matches(q).count()
    assert n_dup > 0
    n = update_numeric_doc_values(spark, idx_dir, idx, q, "n_chars", 777)
    assert n == n_dup
    # second update to a subset: last-epoch wins
    n2 = update_numeric_doc_values(
        spark, idx_dir, idx,
        Q.BooleanQuery.of(must=[Q.TermQuery("text", "dup"),
                                Q.TermQuery("text", "table")]),
        "n_chars", 999,
    )
    assert 0 < n2 <= n
    idx2 = apply_dv_updates(
        load_segments(spark, idx_dir, CFG), read_dv_updates(spark, idx_dir)
    )
    s2 = IndexSearcher(idx2)
    matched = {r["doc_id"] for r in IndexSearcher(idx).matches(q).collect()}
    subset = {
        r["doc_id"]
        for r in IndexSearcher(idx)
        .matches(Q.BooleanQuery.of(must=[Q.TermQuery("text", "dup"),
                                         Q.TermQuery("text", "table")]))
        .collect()
    }
    rows = {r["doc_id"]: r["n_chars"] for r in idx2.docs.collect()}
    orig = {r["doc_id"]: r["n_chars"] for r in idx.docs.collect()}
    for d, v in rows.items():
        if d in subset:
            assert v == 999
        elif d in matched:
            assert v == 777
        else:
            assert v == orig[d]
    # scoring unaffected (doc values are not scoring state)
    a = IndexSearcher(idx).search(q, k=5).collect()
    b = s2.search(q, k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
