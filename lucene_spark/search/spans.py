"""Span queries (``lucene/queries/src/java/org/apache/lucene/queries/spans/``)
as a thin layer over the minimal-interval algebra.

The reference deprecates spans in favor of intervals (the two packages
compute the same positional containment/adjacency relations; intervals
with minimal-interval semantics supersede span enumeration). We expose the
classic span surface mapped onto ``search/intervals.py`` sources:

- ``SpanTermQuery(t)``            -> Term(t)                (SpanTermQuery.java)
- ``SpanNearQuery(clauses, slop, in_order)`` -> Ordered/Unordered +
  MaxGaps(slop)                                            (SpanNearQuery.java)
- ``SpanFirstQuery(match, end)``  -> intervals with end < `end`
                                                           (SpanFirstQuery.java)
- ``SpanOrQuery(clauses)``        -> Or(...)               (SpanOrQuery.java)
- ``SpanNotQuery(incl, excl)``    -> NonOverlapping         (SpanNotQuery.java)
- ``SpanContainingQuery(big, little)`` -> Containing       (SpanContainingQuery.java)
- ``SpanWithinQuery(big, little)``     -> ContainedBy      (SpanWithinQuery.java)

``span_matches`` returns the per-doc minimal span set; ``span_count`` the
per-doc span counts (the SpanCollector surface for scoring/highlighting).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search import intervals as IV

__all__ = [
    "SpanQuery",
    "SpanTermQuery",
    "SpanNearQuery",
    "SpanFirstQuery",
    "SpanOrQuery",
    "SpanNotQuery",
    "SpanPositionRangeQuery",
    "SpanContainingQuery",
    "SpanWithinQuery",
    "span_matches",
    "span_count",
]


class SpanQuery:
    """Marker base class."""


@dataclass(frozen=True)
class SpanTermQuery(SpanQuery):
    term: str


@dataclass(frozen=True)
class SpanNearQuery(SpanQuery):
    clauses: tuple[SpanQuery, ...]
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class SpanFirstQuery(SpanQuery):
    match: SpanQuery
    end: int


@dataclass(frozen=True)
class SpanPositionRangeQuery(SpanQuery):
    """Spans fully inside [start, end) (``SpanPositionRangeQuery.java:28``)."""

    match: SpanQuery
    start: int = 0
    end: int = 2**31 - 1


@dataclass(frozen=True)
class SpanOrQuery(SpanQuery):
    clauses: tuple[SpanQuery, ...]


@dataclass(frozen=True)
class SpanNotQuery(SpanQuery):
    """Spans of ``include`` overlapping no span of ``exclude``
    (``SpanNotQuery.java:38`` with pre/post = 0)."""

    include: SpanQuery
    exclude: SpanQuery


@dataclass(frozen=True)
class SpanContainingQuery(SpanQuery):
    big: SpanQuery
    little: SpanQuery


@dataclass(frozen=True)
class SpanWithinQuery(SpanQuery):
    big: SpanQuery
    little: SpanQuery


def _to_intervals(q: SpanQuery) -> IV.IntervalsSource:
    if isinstance(q, SpanTermQuery):
        return IV.Term(q.term)
    if isinstance(q, SpanNearQuery):
        subs = [_to_intervals(c) for c in q.clauses]
        inner = IV.Ordered(*subs) if q.in_order else IV.Unordered(*subs)
        return IV.MaxGaps(q.slop, inner)
    if isinstance(q, SpanOrQuery):
        return IV.Or(*[_to_intervals(c) for c in q.clauses])
    if isinstance(q, SpanNotQuery):
        return IV.NonOverlapping(
            _to_intervals(q.include), _to_intervals(q.exclude)
        )
    if isinstance(q, SpanContainingQuery):
        return IV.Containing(_to_intervals(q.big), _to_intervals(q.little))
    if isinstance(q, SpanWithinQuery):
        return IV.ContainedBy(_to_intervals(q.little), _to_intervals(q.big))
    if isinstance(q, SpanPositionRangeQuery):
        return IV.PositionRange(q.start, q.end, _to_intervals(q.match))
    if isinstance(q, SpanFirstQuery):
        # SpanPositionRangeQuery position gate — composable, so nested
        # SpanFirst inside near/or/containing works too
        return IV.MaxEnd(q.end, _to_intervals(q.match))
    raise NotImplementedError(type(q).__name__)


def span_matches(searcher, q: SpanQuery) -> DataFrame:
    """(doc_id, start, end, wmatch) minimal spans of `q`."""
    return IV.matches(searcher, _to_intervals(q))


def span_count(searcher, q: SpanQuery) -> DataFrame:
    """(doc_id, n_spans) for docs with >= 1 span."""
    return (
        span_matches(searcher, q)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"))
    )
