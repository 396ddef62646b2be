"""ComplexPhraseQueryParser — phrases with embedded wildcards / fuzzies /
ranges / boolean groups (``queryparser/complexPhrase/
ComplexPhraseQueryParser.java:61``).

Architecture mirrors the reference: the classic parser's quoted-text
factory (``QueryParser._field_query`` here, ``getFieldQuery`` there,
ComplexPhraseQueryParser.java:85) records each quoted region as an opaque
``ComplexPhrase`` node in the surrounding boolean AST; at execution each
phrase's contents are parsed as a normal query whose top-level clause
sequence becomes the slot sequence of a span-near
(ComplexPhraseQuery.rewrite, :258):

- bare term           -> span term
- multi-term leaf     -> SpanOr over the matching dictionary terms; an
  empty expansion inserts a can't-match dummy slot so "fred smithe*"
  cannot match on "fred" alone (:305-316)
- boolean group       -> or-list / not-list fold (addComplexPhraseClause,
  :364): SpanOr of the positives, wrapped in SpanNot when the group
  carries MUST_NOT children
- single term/multi-term contents -> the plain (non-positional) query
  (:261-264)
- top-level MUST_NOT slots -> SpanNot(positives-near, all-near) with the
  slop widened by the number of negatives (:331-358)

Mixing fields inside one phrase and phrases inside phrases raise, like
the reference's checkBadQuery cases. Matching parity: every expectation
in ``TestComplexPhraseQuery.testComplexPhrases`` /
``testSingleTermPhrase`` / ``testUnOrderedProximitySearches`` /
``testFieldedQuery`` replays over the reference test's own 8-doc corpus
in ``tests/test_complexphrase.py`` (the synonym-analyzer cases need the
MockSynonymAnalyzer and are out of scope).

Scoring note: the reference scores rewritten phrases through span-near
weights; here matching is span-exact and ranking uses the surround
module's convention — score = minimal-span count (plain clauses
contribute a constant 1) — documented simplification, same top-level
match sets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace as _dc_replace

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search import query as Q
from lucene_spark.search import spans as SP
from lucene_spark.search.queryparser import QueryParseError, QueryParser

__all__ = ["ComplexPhrase", "ComplexPhraseQueryParser", "execute"]

_DUMMY = "\x00Dummy clause because no terms found - must match nothing"

_MULTI_TERM = (
    Q.PrefixQuery,
    Q.WildcardQuery,
    Q.FuzzyQuery,
    Q.TermRangeQuery,
    Q.RegexpQuery,
)


@dataclass(frozen=True)
class ComplexPhrase(Q.Query):
    """One quoted region, parsed lazily at execution (the reference's
    ComplexPhraseQuery, :211)."""

    field: str
    contents: str
    slop: int = 0
    in_order: bool = True


class ComplexPhraseQueryParser(QueryParser):
    def __init__(
        self,
        default_field: str,
        analyzer=None,
        in_order: bool = True,
        fuzzy_prefix_length: int = 0,
        default_operator: str = "OR",
    ):
        super().__init__(default_field, analyzer, default_operator)
        self.in_order = in_order
        self.fuzzy_prefix_length = fuzzy_prefix_length

    def _field_query(self, field: str, body: str, slop: int) -> Q.Query:
        return ComplexPhrase(field, body, slop, self.in_order)


# ---- phrase rewrite ---------------------------------------------------------


def _check_single_field(q: Q.Query, field: str, phrase: str) -> None:
    if isinstance(q, (ComplexPhrase, Q.PhraseQuery, Q.MultiPhraseQuery)):
        raise QueryParseError(
            f"phrases inside phrases: {phrase!r}"
            if isinstance(q, (ComplexPhrase, Q.PhraseQuery))
            else phrase
        )
    f = getattr(q, "field", None)
    if f is not None and f != field:
        raise QueryParseError(
            f"mixed fields inside phrase {phrase!r}: {f!r} != {field!r}"
        )
    if isinstance(q, Q.BooleanQuery):
        for c in q.clauses:
            _check_single_field(c.query, field, phrase)
    for attr in ("query",):
        sub = getattr(q, attr, None)
        if isinstance(sub, Q.Query):
            _check_single_field(sub, field, phrase)


#: expansion cap per multi-term slot inside a quoted phrase — the
#: BooleanQuery.TooManyClauses / BasicQueryFactory bound (default 1024)
MAX_PHRASE_EXPANSIONS = 1024


def _lev_within(a: str, b: str, k: int) -> bool:
    """Levenshtein(a, b) <= k, banded DP with early exit."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            best = min(best, cur[j])
        if best > k:
            return False
        prev = cur
    return prev[-1] <= k


def _expand_from_memo(searcher, field: str, q: Q.Query) -> list[str] | None:
    """Zero-job expansion against the preloaded term dictionary
    (``preload_stats`` puts the whole vocabulary in driver memory — the
    position Lucene's in-RAM FST occupies, so wildcard rewrite inside a
    quoted phrase costs no Spark job at serving time). None when the
    dictionary is not fully loaded or the leaf type is unsupported."""
    if not getattr(searcher, "_stats_all_loaded", False):
        return None
    if isinstance(q, Q.PrefixQuery):
        match = lambda t: t.startswith(q.prefix)  # noqa: E731
    elif isinstance(q, Q.WildcardQuery):
        rx = re.compile(
            re.escape(q.pattern).replace("\\*", ".*").replace("\\?", ".") + "$"
        )
        match = lambda t: rx.match(t) is not None  # noqa: E731
    elif isinstance(q, Q.RegexpQuery):
        rx = re.compile("(" + q.regex + ")$")
        match = lambda t: rx.match(t) is not None  # noqa: E731
    elif isinstance(q, Q.FuzzyQuery):
        pre = q.term[: q.prefix_length] if q.prefix_length > 0 else ""
        match = lambda t: t.startswith(pre) and _lev_within(  # noqa: E731
            t, q.term, q.max_edits
        )
    elif isinstance(q, Q.TermRangeQuery):
        lo = q.lower.lower() if q.lower is not None else None
        hi = q.upper.lower() if q.upper is not None else None

        def match(t):
            if lo is not None and (t < lo or (t == lo and not q.include_lower)):
                return False
            if hi is not None and (t > hi or (t == hi and not q.include_upper)):
                return False
            return True

    else:
        return None
    out = []
    for (fld, t) in searcher._stats_memo:
        if fld == field and match(t):
            out.append(t)
            if len(out) > MAX_PHRASE_EXPANSIONS:
                raise QueryParseError(
                    f"too many terms ({len(out)}+) match {type(q).__name__} "
                    f"inside a complex phrase; the cap is "
                    f"{MAX_PHRASE_EXPANSIONS} (TooManyClauses semantics)"
                )
    return sorted(out)


def _expand(searcher, field: str, q: Q.Query) -> list[str]:
    """Dictionary expansion of a multi-term leaf (the reference's
    indexSearcher.rewrite of each clause, :285) — same predicates the
    searcher's own constant-score paths use. Served from the preloaded
    driver dictionary (zero Spark jobs) when available."""
    memo = _expand_from_memo(searcher, field, q)
    if memo is not None:
        return memo
    ts = searcher.index.termstats.filter(F.col("field") == field)
    if isinstance(q, Q.PrefixQuery):
        pred = F.col("term").startswith(q.prefix)
    elif isinstance(q, Q.WildcardQuery):
        rx = (
            "^"
            + re.escape(q.pattern).replace("\\*", ".*").replace("\\?", ".")
            + "$"
        )
        pred = F.col("term").rlike(rx)
    elif isinstance(q, Q.RegexpQuery):
        pred = F.col("term").rlike("^(" + q.regex + ")$")
    elif isinstance(q, Q.FuzzyQuery):
        pred = F.levenshtein(F.col("term"), F.lit(q.term)) <= q.max_edits
        if q.prefix_length > 0:
            pred = pred & F.col("term").startswith(q.term[: q.prefix_length])
    elif isinstance(q, Q.TermRangeQuery):
        pred = F.lit(True)
        lo = q.lower.lower() if q.lower is not None else None
        hi = q.upper.lower() if q.upper is not None else None
        if lo is not None:
            pred = pred & (
                F.col("term") >= lo if q.include_lower else F.col("term") > lo
            )
        if hi is not None:
            pred = pred & (
                F.col("term") <= hi if q.include_upper else F.col("term") < hi
            )
    else:  # pragma: no cover
        raise QueryParseError(f"unknown multi-term type {type(q).__name__}")
    # Cap the driver-side collect like surround's BasicQueryFactory bound
    # (surround.py MAX_BASIC_QUERIES; query/BasicQueryFactory.java default
    # maxBasicQueries 1024): on an identifier-heavy vocabulary a slot like
    # "s*" would otherwise collect millions of terms to the driver.  Lucene's
    # ComplexPhraseQueryParser hits the same wall via
    # IndexSearcher.getMaxClauseCount — fail loudly, never silently truncate.
    terms = [
        r["term"]
        for r in ts.filter(pred)
        .select("term")
        .limit(MAX_PHRASE_EXPANSIONS + 1)
        .collect()
    ]
    if len(terms) > MAX_PHRASE_EXPANSIONS:
        raise QueryParseError(
            f"too many terms ({len(terms)}+) match {type(q).__name__} inside "
            f"a complex phrase; the cap is {MAX_PHRASE_EXPANSIONS} "
            "(TooManyClauses semantics)"
        )
    return sorted(terms)


def _or_of(terms: list[str]) -> SP.SpanQuery:
    if not terms:
        return SP.SpanTermQuery(_DUMMY)
    if len(terms) == 1:
        return SP.SpanTermQuery(terms[0])
    return SP.SpanOrQuery(tuple(SP.SpanTermQuery(t) for t in terms))


def _group_to_span(searcher, field: str, bq: Q.BooleanQuery, phrase: str):
    """addComplexPhraseClause (:364): positives fold into one SpanOr,
    negatives wrap it in SpanNot."""
    ors: list[SP.SpanQuery] = []
    nots: list[SP.SpanQuery] = []
    for c in bq.clauses:
        chosen = nots if c.occur is Q.Occur.MUST_NOT else ors
        sub = c.query
        while isinstance(sub, (Q.BoostQuery, Q.ConstantScoreQuery)):
            sub = sub.query
        if isinstance(sub, Q.TermQuery):
            chosen.append(SP.SpanTermQuery(sub.term))
        elif isinstance(sub, _MULTI_TERM):
            terms = _expand(searcher, field, sub)
            chosen.extend(SP.SpanTermQuery(t) for t in terms) if terms else (
                chosen.append(SP.SpanTermQuery(_DUMMY))
            )
        elif isinstance(sub, Q.BooleanQuery):
            inner = _group_to_span(searcher, field, sub, phrase)
            if inner is not None:
                chosen.append(inner)
        elif isinstance(sub, Q.MatchNoDocsQuery):
            chosen.append(SP.SpanTermQuery(_DUMMY))
        else:
            raise QueryParseError(
                f"unknown query type in phrase {phrase!r}: {type(sub).__name__}"
            )
    if not ors:
        return None
    soq = ors[0] if len(ors) == 1 else SP.SpanOrQuery(tuple(ors))
    if not nots:
        return soq
    snq = nots[0] if len(nots) == 1 else SP.SpanOrQuery(tuple(nots))
    return SP.SpanNotQuery(soq, snq)


def _set_fuzzy_prefix(q: Q.Query, n: int) -> Q.Query:
    if n <= 0:
        return q
    if isinstance(q, Q.FuzzyQuery):
        return _dc_replace(q, prefix_length=n)
    if isinstance(q, Q.BooleanQuery):
        return Q.BooleanQuery(
            tuple(
                Q.BooleanClause(_set_fuzzy_prefix(c.query, n), c.occur)
                for c in q.clauses
            ),
            q.minimum_should_match,
        )
    return q


def rewrite_phrase(searcher, cp: ComplexPhrase, fuzzy_prefix_length: int = 0):
    """-> ("plain", Q.Query) for single-leaf contents, else
    ("span", SP.SpanQuery) — ComplexPhraseQuery.rewrite (:258)."""
    # the contents re-parse uses the COMPLEX parser, like the reference's
    # parsePhraseElements (:234) — nested quotes become ComplexPhrase
    # nodes that _check_single_field rejects
    inner = ComplexPhraseQueryParser(
        cp.field, searcher_analyzer(searcher)
    ).parse(cp.contents)
    inner = _set_fuzzy_prefix(inner, fuzzy_prefix_length)
    _check_single_field(inner, cp.field, cp.contents)
    if isinstance(inner, (Q.TermQuery, Q.MatchNoDocsQuery) + _MULTI_TERM):
        if isinstance(inner, Q.TermRangeQuery):
            # endpoint analysis (the reference's getRangeQuery normalizes
            # bounds through the analyzer; the corpus terms are lowercase)
            inner = _dc_replace(
                inner,
                lower=inner.lower.lower() if inner.lower is not None else None,
                upper=inner.upper.lower() if inner.upper is not None else None,
            )
        return "plain", inner
    if not isinstance(inner, Q.BooleanQuery):
        raise QueryParseError(
            f"unknown query type in phrase {cp.contents!r}: "
            f"{type(inner).__name__}"
        )
    slots: list[SP.SpanQuery] = []
    negative = []
    for c in inner.clauses:
        sub = c.query
        while isinstance(sub, (Q.BoostQuery, Q.ConstantScoreQuery)):
            sub = sub.query
        negative.append(c.occur is Q.Occur.MUST_NOT)
        if isinstance(sub, Q.TermQuery):
            slots.append(SP.SpanTermQuery(sub.term))
        elif isinstance(sub, _MULTI_TERM):
            slots.append(_or_of(_expand(searcher, cp.field, sub)))
        elif isinstance(sub, Q.BooleanQuery):
            g = _group_to_span(searcher, cp.field, sub, cp.contents)
            slots.append(g if g is not None else SP.SpanTermQuery(_DUMMY))
        elif isinstance(sub, Q.MatchNoDocsQuery):
            slots.append(SP.SpanTermQuery(_DUMMY))
        else:
            raise QueryParseError(
                f"unknown query type in phrase {cp.contents!r}: "
                f"{type(sub).__name__}"
            )
    n_neg = sum(negative)
    if n_neg == 0:
        return "span", SP.SpanNearQuery(tuple(slots), cp.slop, cp.in_order)
    positives = tuple(s for s, neg in zip(slots, negative) if not neg)
    include = (
        positives[0]
        if len(positives) == 1
        else SP.SpanNearQuery(positives, cp.slop + n_neg, cp.in_order)
    )
    exclude = SP.SpanNearQuery(tuple(slots), cp.slop, cp.in_order)
    return "span", SP.SpanNotQuery(include, exclude)


def searcher_analyzer(searcher):
    cfg = searcher.index.config
    return getattr(cfg, "analyzer", None)


# ---- execution --------------------------------------------------------------


def _searcher_for(searchers, field: str):
    if isinstance(searchers, dict):
        if field not in searchers:
            raise QueryParseError(f"no index for field {field!r}")
        return searchers[field]
    return searchers


def _leaf_field(q: Q.Query, default: str) -> str:
    return getattr(q, "field", None) or getattr(q, "column", None) or default


def _exec_node(searchers, q: Q.Query, default_field: str,
               fuzzy_prefix_length: int) -> DataFrame:
    """-> (doc_id, score:double); score = span count for phrase leaves,
    1.0 for plain leaves, sums across boolean clauses."""
    if isinstance(q, ComplexPhrase):
        s = _searcher_for(searchers, q.field)
        kind, rewritten = rewrite_phrase(s, q, fuzzy_prefix_length)
        if kind == "plain":
            return s.matches(rewritten).select(
                "doc_id", F.lit(1.0).alias("score")
            )
        return (
            SP.span_count(s, rewritten)
            .select("doc_id", F.col("n_spans").cast("double").alias("score"))
        )
    if isinstance(q, Q.BooleanQuery):
        required: list[DataFrame] = []
        optional: list[DataFrame] = []
        negated: list[DataFrame] = []
        for c in q.clauses:
            part = _exec_node(searchers, c.query, default_field,
                              fuzzy_prefix_length)
            if c.occur is Q.Occur.MUST_NOT:
                negated.append(part)
            elif c.occur in (Q.Occur.MUST, Q.Occur.FILTER):
                required.append(part)
            else:
                optional.append(part)
        if required:
            out = required[0]
            for p in required[1:]:
                out = (
                    out.alias("l")
                    .join(p.alias("r"), "doc_id")
                    .select(
                        "doc_id",
                        (F.col("l.score") + F.col("r.score")).alias("score"),
                    )
                )
            # optionals add score on the required match set
            for p in optional:
                out = (
                    out.alias("l")
                    .join(p.alias("r"), "doc_id", "left_outer")
                    .select(
                        "doc_id",
                        (
                            F.col("l.score")
                            + F.coalesce(F.col("r.score"), F.lit(0.0))
                        ).alias("score"),
                    )
                )
        else:
            u = optional[0]
            for p in optional[1:]:
                u = u.unionByName(p)
            out = u.groupBy("doc_id").agg(F.sum("score").alias("score"))
        for p in negated:
            out = out.join(p.select("doc_id"), "doc_id", "left_anti")
        return out
    if isinstance(q, (Q.BoostQuery, Q.ConstantScoreQuery)):
        return _exec_node(searchers, q.query, default_field,
                          fuzzy_prefix_length)
    # plain leaf (term / multi-term / anything searcher.matches handles)
    s = _searcher_for(searchers, _leaf_field(q, default_field))
    return s.matches(q).select("doc_id", F.lit(1.0).alias("score"))


def scored(searchers, text: str, default_field: str | None = None,
           in_order: bool = True, fuzzy_prefix_length: int = 0,
           analyzer=None) -> DataFrame:
    """Parse + plan a complex-phrase query -> UNRANKED (doc_id, score).

    The pre-top-k plan, exposed so ``IndexSearcher.search_many`` can batch
    N parsed queries into one ranked Spark job (per-query driver
    scheduling, not decode volume, bounds sequential QPS — BENCH.md)."""
    if default_field is None:
        if isinstance(searchers, dict):
            raise ValueError("default_field required with a searcher dict")
        default_field = searchers.index.config.field_name
    qp = ComplexPhraseQueryParser(
        default_field, analyzer, in_order=in_order,
        fuzzy_prefix_length=fuzzy_prefix_length,
    )
    ast = qp.parse(text)
    return _exec_node(searchers, ast, default_field, fuzzy_prefix_length)


def execute(searchers, text: str, k: int = 10, default_field: str | None = None,
            in_order: bool = True, fuzzy_prefix_length: int = 0,
            analyzer=None) -> DataFrame:
    """Parse + run a complex-phrase query -> top-k (doc_id, score)."""
    return (
        scored(searchers, text, default_field, in_order,
               fuzzy_prefix_length, analyzer)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
