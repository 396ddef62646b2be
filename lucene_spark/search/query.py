"""Query AST (the programmatic surface of ``search/Query.java`` subclasses).

Each dataclass mirrors one reference query type (citations inline); the
planner in ``searcher.py`` lowers the AST to DataFrame plans.  v1 exposes the
AST programmatically; the classic query-string parser is a thin later layer
(reference grammar ``queryparser/classic/QueryParser.jj:196-224``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Sequence

__all__ = [
    "Query",
    "Occur",
    "BooleanClause",
    "TermQuery",
    "BooleanQuery",
    "PhraseQuery",
    "MultiPhraseQuery",
    "PrefixQuery",
    "WildcardQuery",
    "RegexpQuery",
    "FuzzyQuery",
    "TermRangeQuery",
    "TermInSetQuery",
    "SynonymQuery",
    "BlendedTermQuery",
    "DisjunctionMaxQuery",
    "ConstantScoreQuery",
    "BoostQuery",
    "MatchAllDocsQuery",
    "MatchNoDocsQuery",
    "PointRangeQuery",
    "FieldExistsQuery",
    "FeatureQuery",
    "KnnFloatVectorQuery",
    "IntervalQuery",
]


class Query:
    """Marker base class."""


class Occur(Enum):
    """BooleanClause occurs (``search/BooleanClause.java``)."""

    MUST = "MUST"
    SHOULD = "SHOULD"
    FILTER = "FILTER"
    MUST_NOT = "MUST_NOT"


@dataclass(frozen=True)
class TermQuery(Query):
    """Exact term, BM25-scored (``search/TermQuery.java:39``)."""

    field: str
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: Occur


@dataclass(frozen=True)
class BooleanQuery(Query):
    """MUST/SHOULD/FILTER/MUST_NOT with minimumNumberShouldMatch
    (``search/BooleanQuery.java:40``)."""

    clauses: tuple[BooleanClause, ...]
    minimum_should_match: int = 0

    @staticmethod
    def of(
        must: Sequence[Query] = (),
        should: Sequence[Query] = (),
        filter: Sequence[Query] = (),
        must_not: Sequence[Query] = (),
        minimum_should_match: int = 0,
    ) -> "BooleanQuery":
        clauses = (
            tuple(BooleanClause(q, Occur.MUST) for q in must)
            + tuple(BooleanClause(q, Occur.SHOULD) for q in should)
            + tuple(BooleanClause(q, Occur.FILTER) for q in filter)
            + tuple(BooleanClause(q, Occur.MUST_NOT) for q in must_not)
        )
        return BooleanQuery(clauses, minimum_should_match)


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Terms at consecutive positions; scored on phrase freq with summed
    term idfs (``search/PhraseQuery.java:71``, ``ExactPhraseMatcher.java:37``)."""

    field: str
    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with term alternatives per position slot
    (``search/MultiPhraseQuery.java:54``). Weight sums idf over every
    alternative of every slot (PhraseWeight allTermStats)."""

    field: str
    slots: tuple[tuple[str, ...], ...]
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class PrefixQuery(Query):
    """Constant-score OR of dictionary terms with prefix
    (``search/PrefixQuery.java:29``; CONSTANT_SCORE rewrite
    ``MultiTermQuery.java:80-103``)."""

    field: str
    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class WildcardQuery(Query):
    """``?``/``*`` wildcard over the term dictionary
    (``search/WildcardQuery.java:38``)."""

    field: str
    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class RegexpQuery(Query):
    """Regex-intersected dictionary terms (``search/RegexpQuery.java:42``)."""

    field: str
    regex: str
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """Terms within Levenshtein distance <= max_edits
    (``search/FuzzyQuery.java:52``)."""

    field: str
    term: str
    max_edits: int = 2
    prefix_length: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """Lexicographic term range (``search/TermRangeQuery.java:37``)."""

    field: str
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """Constant-score term-set membership (``search/TermInSetQuery.java:73``)."""

    field: str
    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Terms scored as ONE pseudo-term: df=max, ttf=sum, per-doc freqs summed
    then a single BM25 evaluation (``search/SynonymQuery.java:52,:211-227``)."""

    field: str
    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """Terms scored as a disjunction with BLENDED statistics: every term's
    df is lifted to the max df across the blend before weighting, then the
    per-term scores combine dismax-style (``search/BlendedTermQuery.java:47``,
    DisjunctionMaxRewrite with tie_breaker=1.0 == BooleanRewrite sum)."""

    field: str
    terms: tuple[str, ...]
    tie_breaker: float = 0.01
    boost: float = 1.0


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """High/low document-frequency term split
    (``queries/CommonTermsQuery.java:55``): terms whose df exceeds the
    cutoff — ``max_term_frequency`` itself when >= 1, else
    ``ceil(max_term_frequency * maxDoc)`` — form the (cheap, optional)
    high-frequency group; the rest are the required low-frequency group.
    Rewrites to a nested BooleanQuery at search time exactly as
    ``buildQuery`` does (CommonTermsQuery.java:214): the low group joins
    the outer query as MUST, the high group as SHOULD, and when no
    low-frequency term exists the high group is upgraded to a
    conjunction (unless a high minimum-should-match is set)."""

    field: str
    terms: tuple[str, ...]
    max_term_frequency: float = 0.01
    high_freq_occur: Occur = Occur.SHOULD
    low_freq_occur: Occur = Occur.MUST
    low_freq_min_should_match: int = 0
    high_freq_min_should_match: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """score = max(clauses) + tie_breaker * sum(others)
    (``search/DisjunctionMaxQuery.java:44``)."""

    queries: tuple[Query, ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Wrapped query matches, fixed score (``search/ConstantScoreQuery.java:28``)."""

    query: Query
    boost: float = 1.0


@dataclass(frozen=True)
class BoostQuery(Query):
    """score * boost (``search/BoostQuery.java:29``)."""

    query: Query
    boost: float


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    """(``search/MatchAllDocsQuery.java:23``) — constant score 1*boost."""

    boost: float = 1.0


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    """(``search/MatchNoDocsQuery.java:23``)."""


@dataclass(frozen=True)
class PointRangeQuery(Query):
    """Numeric range on a docs-table column; BKD analog is parquet min/max
    pruning (``search/PointRangeQuery.java:54``). Constant-score."""

    column: str
    lower: float | int | None
    upper: float | int | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class PointInSetQuery(Query):
    """Numeric set membership on a docs-table column
    (``search/PointInSetQuery.java:59`` — the query behind
    IntPoint/LongPoint ``newSetQuery``). The reference merge-intersects
    the sorted value set with BKD leaves; Catalyst compiles the IN-list
    predicate to a pushed-down parquet filter. Constant-score."""

    column: str
    values: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class FieldExistsQuery(Query):
    """Docs with a non-null value (``search/FieldExistsQuery.java:41``)."""

    column: str
    boost: float = 1.0


@dataclass(frozen=True)
class FeatureQuery(Query):
    """Static-signal scoring via a feature value carried as a custom term
    frequency (``document/FeatureField.java:106``,
    ``index/IndexOptions.java:52-56`` DOCS_AND_CUSTOM_FREQS). The engine
    stores features as a (doc_id, feature, value:float) side table
    (InvertedIndex.features). Scoring functions mirror FeatureField's:

    - ``log``:        boost * ln(scale + S)
    - ``saturation``: boost * S / (S + pivot)
    - ``sigmoid``:    boost * S^exp / (S^exp + pivot^exp)

    with S = the doc's feature value, all float32 at the end. Composes
    with BM25 queries as a SHOULD clause (the recommended ranking-signal
    pattern in FeatureField's javadoc)."""

    field: str
    feature: str
    function: str = "saturation"
    pivot: float = 1.0
    exp: float = 1.0
    boost: float = 1.0


@dataclass(frozen=True)
class KnnFloatVectorQuery(Query):
    """k nearest neighbors of `vector` over the index's vector column
    (``search/KnnFloatVectorQuery.java:40``). With a `filter`, only docs
    matching it are eligible, and the engine scores the filter set
    EXACTLY — the reference's exact-search fallback when the filter set
    is small relative to k·visit-limit (``AbstractKnnVectorQuery.java:89``);
    pass ``approximate=True`` to force the LSH-bucketed scale path
    instead (deterministic hyperplane buckets, candidate-join not
    all-pairs). Rewrites to the k scored docs, like Lucene's rewrite to a
    DocAndScoreQuery. Scores are fixed-point cosine similarities
    (quantized to 2^20 so a SQL oracle reproduces them bit-exactly)."""

    field: str
    vector: tuple[float, ...]
    k: int = 10
    filter: Query | None = None
    approximate: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class IntervalQuery(Query):
    """Scored interval query (``queries/intervals/IntervalQuery.java:51``):
    a first-class Query leaf over an ``intervals.IntervalsSource``, so
    interval clauses compose inside BooleanQuery like any other clause
    (the position the flexible parser's ``fn:`` syntax requires). The
    score is the saturation/sigmoid fold of per-doc interval frequency
    (``IntervalScoreFunction.java:26-40``); ``boost`` multiplies the
    weight. ``field`` documents intent — the searcher evaluates sources
    against its own postings field, which must match."""

    field: str
    source: object  # intervals.IntervalsSource (kept untyped: no cycle)
    pivot: float = 1.0
    mode: str = "saturation"
    exp: float = 1.0
    boost: float = 1.0
