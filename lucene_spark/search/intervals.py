"""Minimal-interval algebra (``lucene/queries/.../intervals/Intervals.java``).

Every source yields, per doc, a set of MINIMAL intervals ``[start, end]``
over token positions — no interval of the same source properly contains
another (the minimality contract of ``IntervalIterator``; algebra after
Clarke & Cormack's GC-lists, which the reference package implements).

Combinators (all plain DataFrame plans — position joins + window
minimalization, no Python):

- ``Term(t)``         one-position intervals (``Intervals.term``)
- ``Ordered(a, b, …)``   sub-intervals in order, non-overlapping: each
  next interval starts after the previous ends (``Intervals.ordered``);
  n-ary = left fold of the binary combinator
- ``Unordered(a, b)``  minimal windows containing one interval of each,
  overlap allowed (``Intervals.unordered``); n >= 3 sources take the
  exact all-combinations plan (``_unordered_nary``) — interval set AND
  wmatch match the reference's n-ary enumeration (the pairwise fold
  already gives the exact SET; property-tested, see
  tests/test_intervals_spans.py)
- ``MaxGaps(n, src)``  keep intervals with ≤ n internal gaps; gaps =
  width − matched-token count (``Intervals.maxgaps``)
- ``MaxWidth(n, src)`` keep intervals of width ≤ n (``Intervals.maxwidth``)
- ``Containing(big, small)``    big intervals containing a small one
  (``Intervals.containing``)
- ``ContainedBy(small, big)``   small intervals inside a big one
  (``Intervals.containedBy``)
- ``Or(a, b, …)``      union, re-minimalized (``Intervals.or``)
- ``Phrase(t1, t2, …)`` consecutive terms (``Intervals.phrase``)

``matches(searcher, source)`` returns (doc_id, start, end, wmatch) where
wmatch = number of matched token positions inside the interval (carried
so MaxGaps is exact for term-leaf algebras).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "IntervalsSource",
    "Term",
    "Ordered",
    "Unordered",
    "Phrase",
    "FixField",
    "MaxGaps",
    "MaxWidth",
    "MaxEnd",
    "Containing",
    "ContainedBy",
    "Or",
    "matches",
    "count_intervals",
]


class IntervalsSource:
    """Marker base class."""


@dataclass(frozen=True)
class Term(IntervalsSource):
    term: str


@dataclass(frozen=True)
class Ordered(IntervalsSource):
    sources: tuple[IntervalsSource, ...]

    def __init__(self, *sources: IntervalsSource):
        object.__setattr__(self, "sources", tuple(sources))


@dataclass(frozen=True)
class Unordered(IntervalsSource):
    sources: tuple[IntervalsSource, ...]

    def __init__(self, *sources: IntervalsSource):
        object.__setattr__(self, "sources", tuple(sources))


@dataclass(frozen=True)
class Phrase(IntervalsSource):
    terms: tuple[str, ...]

    def __init__(self, *terms: str):
        object.__setattr__(self, "terms", tuple(terms))


@dataclass(frozen=True)
class FixField(IntervalsSource):
    """Intervals.fixField(field, source)
    (queries/intervals/Intervals.java): reads the wrapped source's
    intervals from ``field`` instead of the field the enclosing
    query/matches call runs over, letting one interval tree combine
    sources across fields (position streams are comparable because both
    fields index the same document with the same position counter
    semantics)."""

    field: str
    source: IntervalsSource


@dataclass(frozen=True)
class MaxGaps(IntervalsSource):
    max_gaps: int
    source: IntervalsSource


@dataclass(frozen=True)
class MaxWidth(IntervalsSource):
    max_width: int
    source: IntervalsSource


@dataclass(frozen=True)
class MaxEnd(IntervalsSource):
    """Intervals ending before `end` — the SpanFirstQuery /
    SpanPositionRangeQuery position gate as a composable source."""

    end: int
    source: IntervalsSource


@dataclass(frozen=True)
class PositionRange(IntervalsSource):
    """Intervals lying fully inside [start, end) — the
    SpanPositionRangeQuery gate (``SpanPositionRangeQuery.java:28``:
    span.start >= start and span.end < end, composable like MaxEnd)."""

    start: int
    end: int
    source: IntervalsSource


@dataclass(frozen=True)
class Containing(IntervalsSource):
    big: IntervalsSource
    small: IntervalsSource


@dataclass(frozen=True)
class ContainedBy(IntervalsSource):
    small: IntervalsSource
    big: IntervalsSource


@dataclass(frozen=True)
class Or(IntervalsSource):
    sources: tuple[IntervalsSource, ...]

    def __init__(self, *sources: IntervalsSource):
        object.__setattr__(self, "sources", tuple(sources))


@dataclass(frozen=True)
class NonOverlapping(IntervalsSource):
    """Minuend intervals that overlap NO subtrahend interval
    (``Intervals.nonOverlapping``; the relation SpanNotQuery with
    pre/post = 0 computes, ``queries/spans/SpanNotQuery.java:38``)."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource


@dataclass(frozen=True)
class NotContaining(IntervalsSource):
    """Minuend intervals containing NO subtrahend interval
    (``Intervals.notContaining``)."""

    minuend: IntervalsSource
    subtrahend: IntervalsSource


@dataclass(frozen=True)
class NotContainedBy(IntervalsSource):
    """Small intervals lying inside NO big interval
    (``Intervals.notContainedBy``)."""

    small: IntervalsSource
    big: IntervalsSource


@dataclass(frozen=True)
class Before(IntervalsSource):
    """Source intervals that end before the start of some reference
    interval (``Intervals.before``: containedBy the per-reference
    window [0, ref.start-1], OffsetIntervalsSource)."""

    source: IntervalsSource
    reference: IntervalsSource


@dataclass(frozen=True)
class After(IntervalsSource):
    """Source intervals that start after the end of some reference
    interval (``Intervals.after``)."""

    source: IntervalsSource
    reference: IntervalsSource


@dataclass(frozen=True)
class Overlapping(IntervalsSource):
    """Source intervals overlapping at least one reference interval
    (``Intervals.overlapping``)."""

    source: IntervalsSource
    reference: IntervalsSource


@dataclass(frozen=True)
class Extend(IntervalsSource):
    """Each interval padded to [max(0, start-before), end+after]
    (``Intervals.extend``, ExtendedIntervalsSource — no
    re-minimalization, like the reference)."""

    source: IntervalsSource
    before: int
    after: int


@dataclass(frozen=True)
class AtLeast(IntervalsSource):
    """Minimal windows containing at least ``min_match`` of the sources
    (``Intervals.atLeast``, MinimumShouldMatchIntervalsSource): the union
    of Unordered over every min_match-subset, re-minimalized."""

    min_match: int
    sources: tuple[IntervalsSource, ...]

    def __init__(self, min_match: int, *sources: IntervalsSource):
        object.__setattr__(self, "min_match", min_match)
        object.__setattr__(self, "sources", tuple(sources))


@dataclass(frozen=True)
class Prefix(IntervalsSource):
    """One-position intervals of every dictionary term with this prefix
    (``Intervals.prefix``)."""

    prefix: str


@dataclass(frozen=True)
class Wildcard(IntervalsSource):
    """One-position intervals of every dictionary term matching the
    ``*``/``?`` pattern (``Intervals.wildcard``)."""

    pattern: str


def _minimalize(df: DataFrame) -> DataFrame:
    """Drop intervals properly containing another interval of the set.

    Same-start duplicates keep the shortest; then an interval is dominated
    iff some later-starting interval ends at or before its end (running
    min of `end` over strictly-greater starts, one window pass).
    """
    # same-start dedup keeps the shortest interval; on equal (start, end)
    # keep the HIGHEST wmatch (fewest internal gaps) so MaxGaps over an Or
    # of overlapping variants never rejects the denser match
    dedup = (
        df.groupBy("doc_id", "start")
        .agg(F.min(F.struct(F.col("end"), (-F.col("wmatch")).alias("nw"))).alias("_m"))
        .select(
            "doc_id",
            "start",
            F.col("_m.end").alias("end"),
            (-F.col("_m.nw")).alias("wmatch"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.desc("start"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dominated = F.min("end").over(w)
    return (
        dedup.withColumn("_dom", dominated)
        .filter(F.col("_dom").isNull() | (F.col("_dom") > F.col("end")))
        .drop("_dom")
    )


def _term_df(searcher, term: str, field: str | None = None) -> DataFrame:
    field = field or searcher.index.config.field_name
    return (
        searcher._decoded(field, F.col("term") == term, with_positions=True)
        .select("doc_id", F.explode("positions").alias("p"))
        .select(
            "doc_id",
            F.col("p").alias("start"),
            F.col("p").alias("end"),
            F.lit(1).alias("wmatch"),
        )
    )


def _multi_term_df(searcher, term_pred, field: str | None = None) -> DataFrame:
    """One-position intervals of every dictionary term matching the
    predicate (the multi-term interval sources)."""
    field = field or searcher.index.config.field_name
    return (
        searcher._decoded(field, term_pred, with_positions=True)
        .select("doc_id", F.explode("positions").alias("p"))
        .select(
            "doc_id",
            F.col("p").alias("start"),
            F.col("p").alias("end"),
            F.lit(1).alias("wmatch"),
        )
    )


def _ordered2(a: DataFrame, b: DataFrame) -> DataFrame:
    """Binary ordered: for each a-interval, the earliest-ending b-interval
    starting after a ends; then minimalize (OrderedIntervalsSource)."""
    bb = b.select(
        F.col("doc_id").alias("doc_id"),
        F.col("start").alias("bs"),
        F.col("end").alias("be"),
        F.col("wmatch").alias("bw"),
    )
    j = a.join(bb, "doc_id").filter(F.col("bs") > F.col("end"))
    cand = (
        j.groupBy("doc_id", "start", "end", "wmatch")
        .agg(
            F.min(F.struct(F.col("be"), (-F.col("bw")).alias("nbw"))).alias("_b")
        )
        .select(
            "doc_id",
            "start",
            F.col("_b.be").alias("end"),
            (F.col("wmatch") - F.col("_b.nbw")).alias("wmatch"),
        )
    )
    return _minimalize(cand)


def _unordered2(a: DataFrame, b: DataFrame) -> DataFrame:
    """Binary unordered: minimal covering windows of one interval of each
    (overlap allowed, UnorderedIntervalsSource)."""
    bb = b.select(
        F.col("doc_id").alias("doc_id"),
        F.col("start").alias("bs"),
        F.col("end").alias("be"),
        F.col("wmatch").alias("bw"),
    )
    j = a.join(bb, "doc_id")
    cand = j.select(
        "doc_id",
        F.least(F.col("start"), F.col("bs")).alias("start"),
        F.greatest(F.col("end"), F.col("be")).alias("end"),
        (F.col("wmatch") + F.col("bw")).alias("wmatch"),
    )
    return _minimalize(cand)


def _unordered_nary(parts: list[DataFrame]) -> DataFrame:
    """Exact n-ary unordered (UnorderedIntervalsSource, n >= 3): ALL
    combinations of one interval per source, covering window per combo,
    max wmatch per (start, end), then minimalize.

    The pairwise left fold already yields the EXACT minimal interval SET
    (a dominated pair window covers a superset with any third interval,
    so its loss is always dominated — property-tested against brute-force
    n-ary enumeration over 20k random interval algebras in
    tests/test_intervals_spans.py). What the fold can lose is wmatch: a
    dropped intermediate tuple may realize the same final window with
    MORE matched tokens, and wmatch drives MaxGaps. This path keeps every
    combination alive until the final window, so wmatch is the true max.
    Cost: candidate rows = prod(per-doc interval counts) per doc — the
    price of tuple-exactness in one declarative plan (the reference's PQ
    walk is linear but sequential, MaxGaps over n>=3 unordered sources is
    a rare query shape)."""
    j = parts[0].select(
        "doc_id",
        F.col("start").alias("s0"),
        F.col("end").alias("e0"),
        F.col("wmatch").alias("w0"),
    )
    for i, p in enumerate(parts[1:], 1):
        j = j.join(
            p.select(
                "doc_id",
                F.col("start").alias(f"s{i}"),
                F.col("end").alias(f"e{i}"),
                F.col("wmatch").alias(f"w{i}"),
            ),
            "doc_id",
        )
    n = len(parts)
    start = F.least(*[F.col(f"s{i}") for i in range(n)])
    end = F.greatest(*[F.col(f"e{i}") for i in range(n)])
    wm = F.col("w0")
    for i in range(1, n):
        wm = wm + F.col(f"w{i}")
    cand = (
        j.select("doc_id", start.alias("start"), end.alias("end"), wm.alias("wmatch"))
        .groupBy("doc_id", "start", "end")
        .agg(F.max("wmatch").alias("wmatch"))
    )
    return _minimalize(cand)


def _build(searcher, src: IntervalsSource, field: str | None = None) -> DataFrame:
    if isinstance(src, Term):
        return _term_df(searcher, src.term, field=field)
    if isinstance(src, Phrase):
        return _build(
            searcher,
            MaxGaps(0, Ordered(*[Term(t) for t in src.terms])),
            field=field,
        )
    if isinstance(src, FixField):
        # Intervals.fixField (queries/intervals/Intervals.java): read the
        # wrapped source's intervals from src.field regardless of the
        # field the enclosing query runs over — the cross-field source.
        return _build(searcher, src.source, field=src.field)
    if isinstance(src, Ordered):
        parts = [_build(searcher, s, field=field) for s in src.sources]
        out = parts[0]
        for p in parts[1:]:
            out = _ordered2(out, p)
        return out
    if isinstance(src, Unordered):
        parts = [_build(searcher, s, field=field) for s in src.sources]
        if len(parts) <= 2:
            out = parts[0]
            for p in parts[1:]:
                out = _unordered2(out, p)
            return out
        return _unordered_nary(parts)
    if isinstance(src, MaxGaps):
        inner = _build(searcher, src.source, field=field)
        gaps = (F.col("end") - F.col("start") + 1) - F.col("wmatch")
        return inner.filter(gaps <= src.max_gaps)
    if isinstance(src, MaxWidth):
        inner = _build(searcher, src.source, field=field)
        return inner.filter(F.col("end") - F.col("start") + 1 <= src.max_width)
    if isinstance(src, MaxEnd):
        inner = _build(searcher, src.source, field=field)
        return inner.filter(F.col("end") < src.end)
    if isinstance(src, PositionRange):
        inner = _build(searcher, src.source, field=field)
        return inner.filter(
            (F.col("start") >= src.start) & (F.col("end") < src.end)
        )
    if isinstance(src, Containing):
        big = _build(searcher, src.big, field=field)
        small = _build(searcher, src.small, field=field).select(
            "doc_id", F.col("start").alias("ss"), F.col("end").alias("se")
        )
        return big.join(
            small,
            (big["doc_id"] == small["doc_id"])
            & (F.col("ss") >= big["start"])
            & (F.col("se") <= big["end"]),
            "left_semi",
        )
    if isinstance(src, ContainedBy):
        small = _build(searcher, src.small, field=field)
        big = _build(searcher, src.big, field=field).select(
            F.col("doc_id").alias("doc_id"),
            F.col("start").alias("bs"),
            F.col("end").alias("be"),
        )
        return small.join(
            big,
            (small["doc_id"] == big["doc_id"])
            & (small["start"] >= F.col("bs"))
            & (small["end"] <= F.col("be")),
            "left_semi",
        )
    if isinstance(src, Or):
        # collapse pure-Term children into ONE postings scan/decode:
        # a parser-expanded wildcard slot (complexphrase "s*" -> hundreds
        # of SpanTerms -> Or) would otherwise union hundreds of separate
        # decode subplans. Row-identical: each (doc, pos) of each term
        # yields one single-position interval either way.
        term_children = [s for s in src.sources if isinstance(s, Term)]
        other = [s for s in src.sources if not isinstance(s, Term)]
        parts: list[DataFrame] = []
        if len(term_children) > 1:
            terms = sorted({t.term for t in term_children})
            parts.append(_multi_term_df(searcher, F.col("term").isin(terms), field=field))
        elif term_children:
            parts.append(_term_df(searcher, term_children[0].term, field=field))
        parts.extend(_build(searcher, s, field=field) for s in other)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return _minimalize(out)
    if isinstance(src, NonOverlapping):
        minu = _build(searcher, src.minuend, field=field)
        sub = _build(searcher, src.subtrahend, field=field).select(
            "doc_id", F.col("start").alias("xs"), F.col("end").alias("xe")
        )
        # anti-join on overlap: [start,end] ∩ [xs,xe] ≠ ∅
        return minu.join(
            sub,
            (minu["doc_id"] == sub["doc_id"])
            & (F.col("xs") <= minu["end"])
            & (F.col("xe") >= minu["start"]),
            "left_anti",
        )
    if isinstance(src, NotContaining):
        minu = _build(searcher, src.minuend, field=field)
        sub = _build(searcher, src.subtrahend, field=field).select(
            "doc_id", F.col("start").alias("xs"), F.col("end").alias("xe")
        )
        return minu.join(
            sub,
            (minu["doc_id"] == sub["doc_id"])
            & (F.col("xs") >= minu["start"])
            & (F.col("xe") <= minu["end"]),
            "left_anti",
        )
    if isinstance(src, NotContainedBy):
        small = _build(searcher, src.small, field=field)
        big = _build(searcher, src.big, field=field).select(
            "doc_id", F.col("start").alias("xs"), F.col("end").alias("xe")
        )
        return small.join(
            big,
            (small["doc_id"] == big["doc_id"])
            & (small["start"] >= F.col("xs"))
            & (small["end"] <= F.col("xe")),
            "left_anti",
        )
    if isinstance(src, Before):
        a = _build(searcher, src.source, field=field)
        ref = _build(searcher, src.reference, field=field).select(
            "doc_id", F.col("start").alias("xs")
        )
        return a.join(
            ref,
            (a["doc_id"] == ref["doc_id"]) & (F.col("xs") > a["end"]),
            "left_semi",
        )
    if isinstance(src, After):
        a = _build(searcher, src.source, field=field)
        ref = _build(searcher, src.reference, field=field).select(
            "doc_id", F.col("end").alias("xe")
        )
        return a.join(
            ref,
            (a["doc_id"] == ref["doc_id"]) & (F.col("xe") < a["start"]),
            "left_semi",
        )
    if isinstance(src, Overlapping):
        a = _build(searcher, src.source, field=field)
        ref = _build(searcher, src.reference, field=field).select(
            "doc_id", F.col("start").alias("xs"), F.col("end").alias("xe")
        )
        return a.join(
            ref,
            (a["doc_id"] == ref["doc_id"])
            & (F.col("xs") <= a["end"])
            & (F.col("xe") >= a["start"]),
            "left_semi",
        )
    if isinstance(src, Extend):
        inner = _build(searcher, src.source, field=field)
        return inner.select(
            "doc_id",
            F.greatest(F.lit(0), F.col("start") - src.before).alias("start"),
            (F.col("end") + src.after).alias("end"),
            "wmatch",
        )
    if isinstance(src, AtLeast):
        from itertools import combinations

        n, subs = src.min_match, src.sources
        if not (1 <= n <= len(subs)):
            raise ValueError("atLeast: need 1 <= min_match <= len(sources)")
        if n == 1:
            return _build(searcher, Or(*subs), field=field)
        parts = [
            _build(searcher, Unordered(*combo), field=field)
            for combo in combinations(subs, n)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return _minimalize(out)
    if isinstance(src, Prefix):
        return _multi_term_df(
            searcher, F.col("term").startswith(src.prefix), field=field
        )
    if isinstance(src, Wildcard):
        import re as _re

        rx = (
            "^"
            + _re.escape(src.pattern).replace("\\*", ".*").replace("\\?", ".")
            + "$"
        )
        return _multi_term_df(searcher, F.col("term").rlike(rx), field=field)
    raise NotImplementedError(type(src).__name__)


def matches(searcher, source: IntervalsSource, field: str | None = None) -> DataFrame:
    """(doc_id, start, end, wmatch) minimal intervals of `source`,
    live docs only (deletes anti-joined, like searcher.matches)."""
    return searcher._live(_build(searcher, source, field=field))


def count_intervals(searcher, source: IntervalsSource) -> DataFrame:
    """(doc_id, n_intervals) — one row per doc with >= 1 interval."""
    return (
        matches(searcher, source)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_intervals"))
    )


# ---------------------------------------------------------------------------
# IntervalQuery — intervals as a SCORED query
# (queries/intervals/IntervalQuery.java:51 + IntervalScorer.java:66 +
# IntervalScoreFunction.java:26)
# ---------------------------------------------------------------------------


def min_extent(src: IntervalsSource) -> int:
    """The source's minimum possible interval width (IntervalsSource
    .minExtent()) — the unit the scorer's width discount is relative to."""
    if isinstance(src, (Term, Prefix, Wildcard)):
        return 1
    if isinstance(src, Phrase):
        return len(src.terms)
    if isinstance(src, (Ordered, Unordered)):
        return sum(min_extent(s) for s in src.sources)
    if isinstance(src, Or):
        return min(min_extent(s) for s in src.sources)
    if isinstance(src, AtLeast):
        from itertools import combinations

        return min(
            sum(min_extent(s) for s in combo)
            for combo in combinations(src.sources, src.min_match)
        )
    if isinstance(src, (MaxGaps, MaxWidth, MaxEnd)):
        return min_extent(src.source)
    if isinstance(src, PositionRange):
        return min_extent(src.source)
    if isinstance(src, Extend):
        return min_extent(src.source) + src.before + src.after
    if isinstance(src, (NonOverlapping, NotContaining)):
        return min_extent(src.minuend)
    if isinstance(src, NotContainedBy):
        return min_extent(src.small)
    if isinstance(src, Containing):
        return min_extent(src.big)
    if isinstance(src, ContainedBy):
        return min_extent(src.small)
    if isinstance(src, (Before, After, Overlapping)):
        return min_extent(src.source)
    raise NotImplementedError(type(src).__name__)


def interval_query(
    searcher,
    source: IntervalsSource,
    pivot: float = 1.0,
    weight: float = 1.0,
    mode: str = "saturation",
    exp: float = 1.0,
) -> DataFrame:
    """Score docs by interval frequency: each interval contributes
    1 / max(width - minExtent + 1, 1) (IntervalScorer.java:66 — wider
    matches count less), folded through the saturation
    (weight * freq / (freq + pivot)) or sigmoid
    (weight * freq^exp / (freq^exp + pivot^exp)) score function
    (IntervalScoreFunction.java:26-40). The per-doc freq accumulates in
    double (the reference accumulates float32 in iteration order; exact-
    extent sources like Phrase produce integer freqs where the two agree
    bit-for-bit — the driver entry uses one)."""
    if pivot <= 0 or exp <= 0:
        raise ValueError("pivot and exp must be > 0")
    me = min_extent(source)
    m = matches(searcher, source)
    contrib = 1.0 / F.greatest(
        (F.col("end") - F.col("start") + 1 - me + 1).cast("double"), F.lit(1.0)
    )
    freq = m.groupBy("doc_id").agg(F.sum(contrib).alias("freq"))
    f = F.col("freq")
    if mode == "saturation":
        score = F.lit(float(weight)) * (f / (f + float(pivot)))
    elif mode == "sigmoid":
        fp = F.pow(f, float(exp))
        score = F.lit(float(weight)) * (fp / (fp + float(pivot) ** float(exp)))
    else:
        raise ValueError(f"unknown score function {mode!r}")
    return freq.select("doc_id", score.cast("float").alias("score"))
