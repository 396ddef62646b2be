"""CheckIndex-style structural invariants + save/load round-trip."""

import pytest

from lucene_spark.index.build import IndexConfig, build_index, load_index
from lucene_spark.index.checkindex import verify_index
from lucene_spark.search import query as Q
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.testing.corpus import generate_corpus


@pytest.fixture(scope="module")
def idx(spark):
    corpus = spark.createDataFrame(generate_corpus(200, seed=3))
    return build_index(spark, corpus, IndexConfig(docs_per_segment=50))


def test_verify_index_clean(idx):
    report = verify_index(idx)
    assert all(v == 0 for v in report.values()), report


def test_save_load_roundtrip(spark, idx, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    idx.save(d)
    idx2 = load_index(spark, d, idx.config)
    assert idx2.fieldstats == idx.fieldstats
    assert idx2.postings.count() == idx.postings.count()
    s1 = IndexSearcher(idx).search(Q.TermQuery("content", "the"), k=5).collect()
    s2 = IndexSearcher(idx2).search(Q.TermQuery("content", "the"), k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in s1] == [
        (r["doc_id"], r["score"]) for r in s2
    ]
    # lineage + metrics tables exist (resumability/lineage contract)
    assert spark.read.parquet(f"{d}/_lineage").count() > 0
    assert spark.read.parquet(f"{d}/_metrics").count() > 0


def test_deterministic_rebuild(spark):
    corpus = spark.createDataFrame(generate_corpus(120, seed=11))
    a = build_index(spark, corpus, IndexConfig(docs_per_segment=40))
    b = build_index(spark, corpus, IndexConfig(docs_per_segment=40))
    pa = sorted(
        (r["seg_id"], r["term"], r["block_ord"], r["first_doc"], bytes(r["doc_gaps"]))
        for r in a.postings.collect()
    )
    pb = sorted(
        (r["seg_id"], r["term"], r["block_ord"], r["first_doc"], bytes(r["doc_gaps"]))
        for r in b.postings.collect()
    )
    assert pa == pb


def test_invert_modes_bit_identical(spark):
    """The three invert front-ends (Python analyzer / pure-JVM token rows /
    JVM tokenize + Arrow grouping) must produce bit-identical postings,
    doclens and stats — the arrow default is only an execution strategy."""
    corpus = spark.createDataFrame(generate_corpus(300, seed=19)).cache()
    corpus.count()

    def fingerprint(mode):
        cfg = IndexConfig(docs_per_segment=64, invert_mode=mode)
        ix = build_index(spark, corpus, cfg)
        rows = sorted(
            (
                r["seg_id"],
                r["term"],
                r["block_ord"],
                r["num_docs"],
                r["first_doc"],
                r["last_doc"],
                r["max_freq"],
                r["min_norm"],
                r["ttf_block"],
                bytes(r["doc_gaps"]),
                bytes(r["freqs"]),
                bytes(r["norms"]),
                bytes(r["positions"]),
            )
            for r in ix.postings.collect()
        )
        dl = sorted(
            (r["doc_id"], r["length"], r["norm"]) for r in ix.doclens.collect()
        )
        ix.postings.unpersist()
        return rows, dl, ix.fieldstats

    py = fingerprint("python")
    jvm = fingerprint("jvm")
    arrow = fingerprint("arrow")
    assert py == arrow
    assert py == jvm


def test_invert_mode_guard(spark):
    corpus = spark.createDataFrame(generate_corpus(10, seed=2))
    with pytest.raises(ValueError, match="invert_mode"):
        build_index(
            spark,
            corpus,
            IndexConfig(invert_mode="arrow", stopwords=frozenset({"the"})),
        )
