"""Physical-plan quality gates: the plans Catalyst produces must show the
properties the 100 TB design relies on — parquet filter pushdown on the
term dictionary, column pruning on postings scans, broadcast joins for
small dims, and no Python in filter-only paths."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.build import IndexConfig, build_index, load_index
from lucene_spark.search import query as Q
from lucene_spark.search.searcher import IndexSearcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def saved(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cfg = IndexConfig(
        text_col="text", field_name="text", doc_id_col="doc_id", docs_per_segment=256
    )
    idx = build_index(spark, docs, cfg, index_dir=d)
    return idx


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_filter_pushed_to_parquet(saved):
    """A term lookup on the saved index must reach the parquet scan as a
    pushed filter (the .tip/block-tree role of row-group min/max stats —
    postings are saved range-partitioned + sorted by term)."""
    plan = _plan(saved.postings.filter(F.col("term") == "spark"))
    assert "PushedFilters" in plan
    assert "EqualTo(term,spark)" in plan or "EqualTo(term, spark)" in plan


def test_postings_scan_prunes_columns(saved):
    """Decoding freqs-only queries must not read the positions blob
    (ReadSchema shows the projection reaching the scan)."""
    cols = ["term", "first_doc", "doc_gaps", "freqs", "norms"]
    plan = _plan(saved.postings.filter(F.col("term") == "spark").select(cols))
    rs = plan.split("ReadSchema:")[-1].split("\n")[0]
    assert "positions" not in rs, rs


def test_search_plan_has_no_python_in_filter_path(saved):
    """Constant-score dictionary queries (prefix etc.) stay JVM-side:
    no Python evaluation nodes except the postings block decode."""
    s = IndexSearcher(saved)
    plan = _plan(s.matches(Q.PrefixQuery("text", "sc")))
    # exactly one Python stage: the block decoder
    assert plan.count("MapInPandas") == 1


def test_exact_phrase_is_join_based(saved):
    """Exact phrase must lower to equi-joins on (doc_id, start), not a
    per-doc Python matcher (SortMergeJoin/ShuffledHashJoin in the plan)."""
    s = IndexSearcher(saved)
    plan = _plan(s.scored(Q.PhraseQuery("text", ("table", "part"))))
    assert "Join" in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_small_dim_join_broadcasts(spark, saved):
    """Joining the top-k result back to stored fields must broadcast the
    tiny side, not shuffle the corpus."""
    s = IndexSearcher(saved)
    top = s.search(Q.TermQuery("text", "spark"), k=10)
    joined = saved.docs.join(F.broadcast(top), "doc_id")
    assert "BroadcastHashJoin" in _plan(joined)


def test_whole_stage_codegen_covers_scoring(saved):
    """The BM25 score expression must run inside WholeStageCodegen (it is
    built from native float Column ops, not a UDF)."""
    s = IndexSearcher(saved)
    df = s.scored(Q.TermQuery("text", "spark"))
    df.collect()  # finalize the adaptive plan so codegen spans materialize
    plan = _plan(df)
    # '*(n)' prefixes mark WholeStageCodegen stages in the plan string;
    # the scoring Project must carry one
    assert "*(" in plan and "Project [doc_id" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_sloppy_phrase_two_term_plan_is_jvm_side(saved):
    """The two-distinct-term sloppy phrase runs as the JVM scan fold:
    no per-doc Python matcher (FlatMapGroupsInPandas) in the plan — only
    the block decode MapInPandas stage."""
    s = IndexSearcher(saved)
    plan = _plan(s.scored(Q.PhraseQuery("text", ("table", "part"), slop=2)))
    assert "FlatMapGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan


def test_sorted_layout_topk_early_terminates(saved):
    """Index-sort early termination (setIndexSort analog): the sorted-
    layout top-k must carry a LocalLimit directly over the (filtered)
    sorted scan — no global Sort of the full match set — and agree with
    the sort-everything plan."""
    from lucene_spark.search import extras

    s = IndexSearcher(saved)
    extras.optimize_for_sort(saved, "n_chars")
    df = extras.sorted_index_topk(s, Q.TermQuery("text", "line"), "n_chars", k=10)
    plan = _plan(df)
    assert "LocalLimit" in plan or "CollectLimit" in plan
    got = [(int(r["doc_id"]), int(r["n_chars"])) for r in df.collect()]
    m = s.matches(Q.TermQuery("text", "line"))
    want = [
        (int(r["doc_id"]), int(r["n_chars"]))
        for r in saved.docs.join(m, "doc_id", "semi")
        .select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(10)
        .collect()
    ]
    assert got == want


def test_polygon_filter_bbox_pushes_to_parquet(spark, tmp_path):
    """geo.polygon_filter's bounding-box conjuncts are plain comparisons,
    so Catalyst pushes them to the parquet scan (the BKD/Component2D bbox
    short-circuit); the crossing-number sum stays a codegen filter with no
    Python stage anywhere."""
    from lucene_spark.search import geo

    d = str(tmp_path / "pts")
    spark.range(0, 1000).selectExpr(
        "id",
        "CAST((id * 7919) % 18000 AS DOUBLE)/100.0 - 90.0 AS lat",
        "CAST((id * 104729) % 36000 AS DOUBLE)/100.0 - 180.0 AS lon",
    ).write.mode("overwrite").parquet(d)
    pts = spark.read.parquet(d)
    poly = [(0.0, 0.0), (30.0, 40.0), (60.0, 10.0), (50.0, -30.0), (10.0, -40.0)]
    df = pts.filter(geo.polygon_filter(poly))
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(lat" in plan and "LessThanOrEqual(lat" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_classification_plans_are_jvm_side(spark, saved):
    """Both classifiers stay JVM-side after the one decode/search stage:
    no row-at-a-time Python, and the tiny class/word frames join without a
    corpus-wide shuffle of the docs table (broadcast)."""
    from lucene_spark.search.classification import naive_bayes_classify

    s = IndexSearcher(saved)
    docs = saved.docs
    df = naive_bayes_classify(s, docs, "table row part")
    plan = _plan(df)
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_minhash_signature_plan_aggregates_before_explode(spark):
    """The MinHash signature plan must (a) hash each shingle ONCE and fan
    out permutations as int64 arithmetic, and (b) reach its single
    exchange through a partial (map-side) aggregate of the 16 min columns
    — the perm explode happens AFTER the aggregate, so shuffle volume is
    one row per doc, not n_shingles x 16."""
    from lucene_spark.pipeline import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = dedup.minhash_signatures(docs, text_col="text", num_perm=16)
    plan = _plan(sigs)
    # md5 appears in exactly one operator (the hi/lo Project over the
    # shingle — printed once per output column, evaluated once by codegen
    # subexpression elimination); in particular no per-perm md5 operator
    md5_lines = [l for l in plan.splitlines() if "md5" in l.lower()]
    assert len(md5_lines) == 1, plan
    assert "perm" not in md5_lines[0], md5_lines[0]
    # one hash exchange, keyed by doc_id (spread() may add a round-robin
    # exchange on tiny single-split inputs — that one carries raw rows)
    n_hash_ex = plan.count("Exchange hashpartitioning")
    assert n_hash_ex == 1, f"expected 1 hash exchange, got {n_hash_ex}:\n{plan}"
    # map-side combine: a partial_min aggregate runs below the exchange
    assert "partial_min" in plan, plan
    # the Generate (posexplode) sits above the exchange (plan strings
    # print top-down), i.e. the perm fan-out happens post-aggregate
    gen_pos = plan.find("Generate")
    ex_pos = plan.find("Exchange hashpartitioning")
    assert 0 <= gen_pos < ex_pos, plan


def test_simhash_plan_has_no_bit_explode(spark):
    """SimHash must reach its fingerprint through tf + 32 map-side
    aggregated bit-sum columns: one md5 per distinct token, exactly two
    hash exchanges ((doc_id, tok) then doc_id), and no per-bit explode
    between them."""
    from lucene_spark.pipeline import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup.simhash(docs, text_col="text"))
    # the token md5 collapses into the tf-aggregate's result projection
    # (one evaluation per (doc, distinct token) group), so no standalone
    # md5 Project exists — and no per-perm md5 either
    n_hash_ex = plan.count("Exchange hashpartitioning")
    assert n_hash_ex == 2, f"expected 2 hash exchanges, got {n_hash_ex}:\n{plan}"
    # the only Generate is the token explode below BOTH exchanges
    last_ex = plan.rfind("Exchange hashpartitioning")
    gen = plan.find("Generate")
    assert gen > last_ex, plan
