"""Monitor/percolator: standing queries over doc batches and streams
(monitor/Monitor.java:42 semantics)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search import query as Q
from lucene_spark.streaming.monitor import Monitor


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "spark joins tables fast"),
            (1, "slow scans of big tables"),
            (2, "spark streaming window functions"),
            (3, "table part order line"),
        ],
        schema="doc_id long, text string",
    )


def test_term_and_boolean_and_phrase_matching(spark, docs):
    m = Monitor()
    m.register("q_term", Q.TermQuery("text", "spark"))
    m.register(
        "q_and",
        Q.BooleanQuery.of(
            must=[Q.TermQuery("text", "spark"), Q.TermQuery("text", "tables")]
        ),
    )
    m.register(
        "q_msm",
        Q.BooleanQuery.of(
            should=[
                Q.TermQuery("text", "slow"),
                Q.TermQuery("text", "window"),
                Q.TermQuery("text", "order"),
            ],
            minimum_should_match=1,
        ),
    )
    m.register("q_phrase", Q.PhraseQuery("text", ("table", "part")))
    got = {
        (r["query_id"], r["doc_id"]) for r in m.match_batch(docs).collect()
    }
    assert got == {
        ("q_term", 0),
        ("q_term", 2),
        ("q_and", 0),
        ("q_msm", 1),
        ("q_msm", 2),
        ("q_msm", 3),
        ("q_phrase", 3),
    }


def test_unregister_and_empty(spark, docs):
    m = Monitor()
    assert m.match_batch(docs).count() == 0
    m.register("q", Q.TermQuery("text", "spark"))
    m.unregister("q")
    assert m.match_batch(docs).count() == 0


def test_streaming_percolation(spark, docs, tmp_path):
    drop = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    docs.write.mode("overwrite").parquet(drop)
    m = Monitor()
    m.register("q_spark", Q.TermQuery("text", "spark"))
    stream = spark.readStream.schema(docs.schema).parquet(drop)
    q = m.start(stream, sink, ckpt)
    q.awaitTermination(120)
    out = {(r["query_id"], r["doc_id"]) for r in spark.read.parquet(sink).collect()}
    assert out == {("q_spark", 0), ("q_spark", 2)}


def test_must_not_and_mixed_case(spark):
    """ADVICE fixes: (a) doc-side tokenization lowercases + uses the
    analyzer word-break rules; (b) MUST_NOT clauses anti-join matches."""
    docs = spark.createDataFrame(
        [
            (10, "Spark JOINS big.tables Fast"),   # 'spark' via lowering
            (11, "spark but slow"),                # killed by MUST_NOT slow
            (12, "nothing relevant"),
        ],
        schema="doc_id long, text string",
    )
    m = Monitor()
    m.register(
        "q_notslow",
        Q.BooleanQuery.of(
            must=[Q.TermQuery("text", "spark")],
            must_not=[Q.TermQuery("text", "slow")],
        ),
    )
    got = {(r["query_id"], r["doc_id"]) for r in m.match_batch(docs).collect()}
    assert got == {("q_notslow", 10)}


def test_must_plus_should_with_msm(spark):
    """MUST + SHOULD + minimum_should_match combine with AND: the doc
    needs every required term AND >= msm distinct optional terms."""
    docs = spark.createDataFrame(
        [
            (20, "alpha only here"),             # must hit, 0 shoulds
            (21, "alpha with beta"),             # must hit, 1 should
            (22, "beta gamma but no must"),      # 2 shoulds, no must
            (23, "alpha beta gamma"),            # must + 2 shoulds
        ],
        schema="doc_id long, text string",
    )
    m = Monitor()
    m.register(
        "q",
        Q.BooleanQuery.of(
            must=[Q.TermQuery("text", "alpha")],
            should=[Q.TermQuery("text", "beta"), Q.TermQuery("text", "gamma")],
            minimum_should_match=1,
        ),
    )
    got = {(r["query_id"], r["doc_id"]) for r in m.match_batch(docs).collect()}
    assert got == {("q", 21), ("q", 23)}
    # msm=0 with musts: shoulds are optional
    m2 = Monitor()
    m2.register(
        "q0",
        Q.BooleanQuery.of(
            must=[Q.TermQuery("text", "alpha")],
            should=[Q.TermQuery("text", "beta")],
        ),
    )
    got0 = {(r["query_id"], r["doc_id"]) for r in m2.match_batch(docs).collect()}
    assert got0 == {("q0", 20), ("q0", 21), ("q0", 23)}


def test_prefix_and_fuzzy_standing_queries(spark, docs):
    """Presearcher expansion (TermFilteredPresearcher strategy): Prefix and
    Fuzzy standing queries expand against the batch's term dictionary at
    match time — no per-doc Python — and match as 1-of term sets."""
    m = Monitor()
    m.register("q_prefix", Q.PrefixQuery("text", "tab"))     # tables, table
    m.register("q_fuzzy", Q.FuzzyQuery("text", "scan", max_edits=1))  # scans
    m.register("q_term", Q.TermQuery("text", "spark"))
    out = m.match_batch(docs)
    got = {(r["query_id"], r["doc_id"]) for r in out.collect()}
    assert got == {
        ("q_prefix", 0),   # tables
        ("q_prefix", 1),   # tables
        ("q_prefix", 3),   # table
        ("q_fuzzy", 1),    # scans (1 edit)
        ("q_term", 0),
        ("q_term", 2),
    }
    # no per-doc Python anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_wildcard_and_regexp_standing_queries(spark, docs):
    """Wildcard/Regexp standing queries expand through the presearcher as
    anchored regexes over the batch term dictionary (JVM RLike with a
    per-row pattern) — same no-per-doc-Python contract as prefix/fuzzy."""
    m = Monitor()
    m.register("q_wild", Q.WildcardQuery("text", "sp*k"))
    m.register("q_rx", Q.RegexpQuery("text", "tab.e?s?"))
    out = m.match_batch(docs)
    got = {(r["query_id"], r["doc_id"]) for r in out.collect()}
    assert got == {
        ("q_wild", 0), ("q_wild", 2),          # spark
        ("q_rx", 0), ("q_rx", 1), ("q_rx", 3),  # table / tables
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_register_rejects_dialect_specific_regex():
    """Standing regex queries are evaluated by BOTH the JVM (rlike over
    the batch dictionary) and Python (MemoryIndex/explain): constructs
    outside the portable RegExp.java subset are rejected at register
    time instead of diverging or throwing mid-batch."""
    import pytest

    from lucene_spark.streaming.monitor import Monitor

    m = Monitor()
    m.register("ok", Q.RegexpQuery("text", "ta(b|p).le{1,2}"))
    with pytest.raises(ValueError, match="portable"):
        m.register("bad", Q.RegexpQuery("text", "(?P<x>tab).*"))
    with pytest.raises(ValueError):
        m.register("bad2", Q.RegexpQuery("text", "ta[b"))


def test_nested_boolean_standing_query(spark, docs):
    """Complex tier (monitor/QueryAnalyzer.java + CandidateMatcher.java):
    nested booleans presearch through their covering term set and verify
    through MemoryIndex — round 2's NotImplementedError fence lifted."""
    m = Monitor()
    m.register(
        "q_nested",
        Q.BooleanQuery.of(
            must=[
                Q.TermQuery("text", "spark"),
                Q.BooleanQuery.of(
                    should=[
                        Q.TermQuery("text", "tables"),
                        Q.TermQuery("text", "window"),
                    ]
                ),
            ],
            must_not=[Q.TermQuery("text", "slow")],
        ),
    )
    assert "q_nested" in m._complex
    got = {(r["query_id"], r["doc_id"]) for r in m.match_batch(docs).collect()}
    assert got == {("q_nested", 0), ("q_nested", 2)}


def test_sloppy_phrase_standing_query(spark, docs):
    """PhraseQuery with slop > 0 routes to the complex tier (the flat
    tier's consecutive-position join is exact-only)."""
    m = Monitor()
    m.register("q_sloppy", Q.PhraseQuery("text", ("spark", "tables"), slop=1))
    m.register("q_exact", Q.PhraseQuery("text", ("spark", "tables")))
    assert "q_sloppy" in m._complex and "q_exact" not in m._complex
    got = {(r["query_id"], r["doc_id"]) for r in m.match_batch(docs).collect()}
    # doc0 'spark joins tables fast': one gap -> sloppy yes, exact no
    assert got == {("q_sloppy", 0)}


def test_complex_with_multiterm_child_and_dismax(spark, docs):
    m = Monitor()
    m.register(
        "q_mixed",
        Q.BooleanQuery.of(
            must=[Q.PrefixQuery("text", "tab"), Q.TermQuery("text", "order")]
        ),
    )
    m.register(
        "q_dismax",
        Q.DisjunctionMaxQuery(
            queries=(
                Q.TermQuery("text", "streaming"),
                Q.PhraseQuery("text", ("big", "tables")),
            ),
            tie_breaker=0.3,
        ),
    )
    got = {(r["query_id"], r["doc_id"]) for r in m.match_batch(docs).collect()}
    assert got == {
        ("q_mixed", 3),    # 'table part order line'
        ("q_dismax", 2),   # streaming
        ("q_dismax", 1),   # 'big tables'
    }


def test_covering_set_extraction():
    """QueryAnalyzer propagation: conjunction picks ONE child's covering
    set (cheapest), disjunction unions, pure MUST_NOT is ANYTOKEN."""
    from lucene_spark.streaming.monitor import _covering

    conj = Q.BooleanQuery.of(
        must=[
            Q.TermQuery("text", "rare"),
            Q.BooleanQuery.of(
                should=[Q.TermQuery("text", "a"), Q.TermQuery("text", "b")]
            ),
        ]
    )
    terms, pats, anytok = _covering(conj)
    assert terms == frozenset(["rare"]) and not pats and not anytok

    disj = Q.BooleanQuery.of(
        should=[Q.TermQuery("text", "x"), Q.PhraseQuery("text", ("pp", "longest"))]
    )
    terms, pats, anytok = _covering(disj)
    assert terms == frozenset(["x", "longest"]) and not anytok

    pure_not = Q.BooleanQuery.of(must_not=[Q.TermQuery("text", "bad")])
    assert _covering(pure_not)[2] is True

    # a conjunction with an uncoverable child still anchors on the other
    mixed = Q.BooleanQuery.of(
        must=[Q.MatchAllDocsQuery(), Q.TermQuery("text", "anchor")]
    )
    terms, pats, anytok = _covering(mixed)
    assert terms == frozenset(["anchor"]) and not anytok


def test_presearcher_candidate_pair_counts(spark, docs):
    """Round-4: presearcher selectivity evidence is pinned — the
    term-filtered candidate set (distinct (query, doc) pairs sharing at
    least one term) has an exactly predictable size on this fixture,
    and it is a strict subset of |Q| x |D|."""
    m = Monitor()
    m.register("q_spark", Q.TermQuery("text", "spark"))       # docs 0,2
    m.register("q_tables", Q.TermQuery("text", "tables"))     # docs 0,1
    m.register(
        "q_and",
        Q.BooleanQuery.of(
            must=[Q.TermQuery("text", "spark"), Q.TermQuery("text", "window")]
        ),
    )  # candidates: docs 0,2 (spark) + 2 (window) -> pairs {0,2}
    m.register("q_ph", Q.PhraseQuery("text", ("order", "line")))  # doc 3
    m.collect_stats = True
    got = {
        (r["query_id"], int(r["doc_id"]))
        for r in m.match_batch(docs).collect()
    }
    stats = m.last_match_stats
    assert stats is not None
    assert stats["n_queries"] == 4 and stats["n_docs"] == 4
    assert stats["total_pairs"] == 16
    # q_spark: docs 0,2 | q_tables: docs 0,1 | q_and: docs 0,2 | q_ph: doc 3
    assert stats["candidate_pairs"] == 7
    assert stats["candidate_pairs"] < stats["total_pairs"]
    # verification keeps only true matches
    assert got == {
        ("q_spark", 0), ("q_spark", 2),
        ("q_tables", 0), ("q_tables", 1),
        ("q_and", 2),
        ("q_ph", 3),
    }
