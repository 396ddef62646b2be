"""CheckHits-style explanation parity + quality-harness metrics."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.entry_impl import get_searcher
from lucene_spark.search import query as Q
from lucene_spark.search.explain import explain
from lucene_spark.testing.quality import evaluate_run, mean_average_precision

SF = "/root/testdata/sf0.001"


def test_explanation_recomputes_to_search_score(spark):
    """Every hit's explanation score must equal the collected score exactly
    (CheckHits.java contract)."""
    _, s = get_searcher(spark, SF)
    for q in [
        Q.TermQuery("text", "spark"),
        Q.TermQuery("text", "dup", boost=2.0),
        Q.BooleanQuery.of(
            should=[Q.TermQuery("text", "table"), Q.TermQuery("text", "vector")]
        ),
    ]:
        hits = s.search(q, k=5).collect()
        assert hits
        for r in hits:
            e = explain(s, q, int(r["doc_id"]))
            assert e["matched"]
            assert float(e["score"]) == r["score"], (q, r)


def test_explanation_nonmatch(spark):
    _, s = get_searcher(spark, SF)
    e = explain(s, Q.TermQuery("text", "zzz_not_a_term"), 0)
    assert not e["matched"] and float(e["score"]) == 0.0


def test_quality_metrics_known_values(spark):
    # query 1: rel docs {1,2,4}; run ranks: 1(doc1,rel),2(doc3),3(doc4,rel)
    results = spark.createDataFrame(
        [(1, 1, 1), (1, 3, 2), (1, 4, 3), (2, 9, 1)],
        schema="query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 4), (2, 8)], schema="query_id long, doc_id long"
    )
    m = {r["query_id"]: r for r in evaluate_run(results, qrels, k=3).collect()}
    # AP(q1) = (1/1 + 2/3) / 3
    assert m[1]["ap"] == pytest.approx((1.0 + 2.0 / 3.0) / 3.0)
    assert m[1]["p_at_k"] == pytest.approx(2.0 / 3.0)
    assert m[1]["recall"] == pytest.approx(2.0 / 3.0)
    assert m[2]["ap"] == 0.0
    assert mean_average_precision(results, qrels, k=3) == pytest.approx(
        ((1.0 + 2.0 / 3.0) / 3.0) / 2.0
    )


def test_engine_map_on_golden_queries(spark):
    """End-to-end IR quality: BM25 run vs term-containment qrels — every
    doc containing the query term is relevant, so recall@all must be 1.0
    for k >= df and MAP positive."""
    _, s = get_searcher(spark, SF)
    term = "dup"
    run = (
        s.search(Q.TermQuery("text", term), k=50)
        .withColumn("rank", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        ))
        .select(F.lit(1).alias("query_id"), "doc_id", "rank")
    )
    qrels = (
        s.matches(Q.TermQuery("text", term))
        .select(F.lit(1).alias("query_id"), "doc_id")
    )
    df_term = qrels.count()
    m = evaluate_run(run, qrels, k=10).collect()[0]
    assert m["n_rel"] == df_term
    if df_term <= 50:
        assert m["recall"] == pytest.approx(1.0)
        assert m["ap"] == pytest.approx(1.0)  # all retrieved are relevant


def test_explanation_must_not_excludes(spark):
    """A matching prohibited clause forces matched=False, score 0
    (ReqExclScorer parity — the ADVICE explain fix)."""
    _, s = get_searcher(spark, SF)
    q = Q.BooleanQuery.of(
        must=[Q.TermQuery("text", "spark")],
        must_not=[Q.TermQuery("text", "spark")],  # always self-excluding
    )
    doc_id = int(
        s.matches(Q.TermQuery("text", "spark")).limit(1).collect()[0]["doc_id"]
    )
    e = explain(s, q, doc_id)
    assert e["matched"] is False
    assert float(e["score"]) == 0.0
    # the anti-join plan agrees: the doc is not in the result set
    assert s.scored(q).filter(F.col("doc_id") == doc_id).count() == 0


def test_analyzing_suggest_semantics(spark):
    """AnalyzingSuggester (suggest/analyzing/AnalyzingSuggester.java:100):
    analyzed-prefix completion returns ORIGINAL surface forms by weight;
    PRESERVE_SEP separates "mega corp" from "megacorp"; exactFirst puts
    the exact analyzed match ahead of heavier completions."""
    from lucene_spark.search.extras import analyzing_suggest

    sugg = spark.createDataFrame(
        [
            ("Mega Corp", 10),
            ("megacorp", 50),
            ("Mega Corporation", 30),
            ("megabyte", 5),
            ("other thing", 99),
        ],
        "text string, weight int",
    )

    def texts(df):
        return [r["text"] for r in df.collect()]

    # preserve_sep: "mega c" analyzed = mega<sep>c -> completes the
    # two-token forms only, weight-ranked
    got = texts(analyzing_suggest(sugg, "mega c", preserve_sep=True))
    assert got == ["Mega Corporation", "Mega Corp"]
    # without separators "megac" also completes "megacorp" (heaviest)
    got = texts(analyzing_suggest(sugg, "mega c", preserve_sep=False))
    assert got == ["megacorp", "Mega Corporation", "Mega Corp"]
    # exactFirst: exact analyzed match outranks the heavier completion
    got = texts(analyzing_suggest(sugg, "Mega Corp", preserve_sep=True))
    assert got[0] == "Mega Corp" and "Mega Corporation" in got
    # exact_first off: pure weight order
    got = texts(
        analyzing_suggest(sugg, "Mega Corp", preserve_sep=True, exact_first=False)
    )
    assert got == ["Mega Corporation", "Mega Corp"]
    # case-insensitive analyzed matching returns the cased surface
    got = texts(analyzing_suggest(sugg, "MEGA", preserve_sep=True))
    assert set(got) >= {"Mega Corp", "Mega Corporation"}
