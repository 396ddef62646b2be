"""ComplexPhraseQueryParser — replays the reference's
``TestComplexPhraseQuery`` match fixtures (testComplexPhrases,
testSingleTermPhrase, testUnOrderedProximitySearches, testFieldedQuery,
checkBadQuery cases) over the reference test's own 8-doc corpus
(``queryparser/src/test/.../complexPhrase/TestComplexPhraseQuery.java:47``).
The synonym-analyzer cases need MockSynonymAnalyzer and are out of scope
(module docstring)."""

import pytest

from lucene_spark.index.build import IndexConfig, build_index
from lucene_spark.search import complexphrase as CP
from lucene_spark.search.queryparser import QueryParseError
from lucene_spark.search.searcher import IndexSearcher

DOCS = [
    (1, "john smith", "developer"),
    (2, "johathon smith", "developer"),
    (3, "john percival smith", "designer"),
    (4, "jackson waits tom", "project manager"),
    (5, "johny perkins", "orders pizza"),
    (6, "hapax neverson", "never matches"),
    (7, "dog cigar", "just for synonyms"),
    (8, "dogs don't smoke cigarettes", "just for synonyms"),
]


@pytest.fixture(scope="module")
def searchers(spark):
    rows = [(i, name, role, str(i)) for i, name, role in DOCS]
    df = spark.createDataFrame(
        rows, "doc_id long, name string, role string, id string"
    )
    out = {}
    for fld in ("name", "role", "id"):
        cfg = IndexConfig(
            text_col=fld, field_name=fld, doc_id_col="doc_id",
            docs_per_segment=8,
        )
        out[fld] = IndexSearcher(build_index(spark, df, cfg))
    return out


def _matches(searchers, qstr, in_order=True):
    df = CP.execute(
        searchers, qstr, k=10, default_field="name",
        in_order=in_order, fuzzy_prefix_length=1,
    )
    return {int(r["doc_id"]) for r in df.collect()}


CASES = [
    # testComplexPhrases
    ('"john smith"', {1}),
    ('"j*   smyth~"', {1, 2}),
    ('"(jo* -john)  smith"', {2}),
    ('"jo*  smith"~2', {1, 2, 3}),
    ('"jo* [sma TO smZ]" ', {1, 2}),
    ('"john"', {1, 3}),
    ('"(john OR johathon)  smith"', {1, 2}),
    ('"(john OR nosuchword*)  smith"', {1}),
    ('"(jo* -john) smyth~"', {2}),
    ('"john  nosuchword*"', set()),
    # testSingleTermPhrase
    ('"joh*"', {1, 2, 3, 5}),
    ('"joh~"', {1, 3, 5}),
    ('"joh*" "tom"', {1, 2, 3, 4, 5}),
    ('+"j*" +"tom"', {4}),
    ('"jo*" "[sma TO smZ]" ', {1, 2, 3, 5, 8}),
    ('+"j*hn" +"sm*h"', {1, 3}),
    # testFieldedQuery
    ('name:"john smith"', {1}),
    ('name:"j*   smyth~"', {1, 2}),
    ('role:"developer"', {1, 2}),
    ('role:"p* manager"', {4}),
    ('role:de*', {1, 2, 3}),
    ('name:"j* smyth~"~5', {1, 2, 3}),
    ('role:"p* manager" AND name:jack*', {4}),
    ('+role:developer +name:jack*', set()),
    ('name:"john smith"~2 AND role:designer AND id:3', {3}),
]


@pytest.mark.parametrize("qstr,expected", CASES, ids=[c[0] for c in CASES])
def test_complex_phrases(searchers, qstr, expected):
    assert _matches(searchers, qstr) == expected


def test_unordered_proximity(searchers):
    assert _matches(searchers, '"smith jo*"~2', in_order=True) == set()
    assert _matches(searchers, '"smith jo*"~2', in_order=False) == {1, 2, 3}


@pytest.mark.parametrize(
    "bad", ['"jo*  id:1 smith"', '"jo* "smith" "'],
    ids=["mixed-fields-in-phrase", "phrase-inside-phrase"],
)
def test_bad_queries(searchers, bad):
    with pytest.raises((QueryParseError, Exception)):
        df = CP.execute(searchers, bad, k=10, default_field="name")
        df.collect()


def test_expansion_cap(searchers, monkeypatch):
    """An over-broad multi-term slot inside a phrase fails loudly with
    TooManyClauses semantics instead of collecting the dictionary to the
    driver (surround's MAX_BASIC_QUERIES bound applied to complexPhrase)."""
    monkeypatch.setattr(CP, "MAX_PHRASE_EXPANSIONS", 2)
    with pytest.raises(QueryParseError, match="too many terms"):
        CP.execute(searchers, '"jo* smith"', k=10, default_field="name")
    # a slot within the cap still works
    monkeypatch.setattr(CP, "MAX_PHRASE_EXPANSIONS", 1024)
    assert _matches(searchers, '"jo*  smith"') == {1, 2}


def test_memo_expansion_matches_job_expansion(searchers):
    """Round-4: with the whole term dictionary preloaded in driver memory
    (the in-RAM FST position), multi-term slot expansion is zero-job and
    must agree exactly with the Spark-job path for every leaf type the
    fixture grammar produces — including the expansion-cap error."""
    # a SEPARATE searcher over the same index, dictionary preloaded —
    # the un-preloaded fixture searchers keep taking the Spark-job path
    s = IndexSearcher(searchers["name"].index)
    assert s.preload_stats()  # tiny vocab: loads fully
    assert not searchers["name"]._stats_all_loaded
    fast_cases = [
        '"j*   smyth~"', '"jo* [sma TO smZ]" ', '"jo*  smith"~2',
        '"joh~"', '+"j*hn" +"sm*h"',
    ]
    for qstr in fast_cases:
        fast = _matches({"name": s, "role": searchers["role"],
                         "id": searchers["id"]}, qstr)
        want = _matches(searchers, qstr)  # job-path expansion
        assert fast == want, qstr
    # the memo path enforces the same TooManyClauses cap
    import lucene_spark.search.complexphrase as CPmod
    old = CPmod.MAX_PHRASE_EXPANSIONS
    CPmod.MAX_PHRASE_EXPANSIONS = 2
    try:
        with pytest.raises(QueryParseError, match="too many terms"):
            CP.execute({"name": s}, '"jo* smith"', k=10, default_field="name")
    finally:
        CPmod.MAX_PHRASE_EXPANSIONS = old
