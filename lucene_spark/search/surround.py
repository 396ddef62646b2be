"""The surround query language: span proximity operators as text.

``queryparser/surround`` (parser grammar ``surround/parser/QueryParser.jj``,
javadoc :64-:72): infix and prefix boolean + proximity operators over
span queries —

- ``a W b`` / ``a 3W b``  ordered distance (distance 1 by default, 2-99
  with a numeric prefix); ``N`` the unordered twin;
- ``AND``/``OR``/``NOT`` (case-insensitive) with precedence
  OR < AND < NOT < N < W (tightest), infix forms left-associative;
- prefix forms ``AND(a, b, c)`` / ``OR(...)`` / ``3W(a, b, c)`` /
  ``20N(...)`` — the n-ary spellings;
- parenthesized groups, ``field:`` prefixes, ``term*`` / ``te?m``
  truncation (SrndPrefixQuery/SrndTruncQuery), quoted terms, ``^boost``.

Semantics mapped onto this engine:

- distance subtrees become ``spans.SpanNearQuery`` chains with
  slop = distance - 1 (DistanceQuery.java:96 ``new SpanNearQuery(...,
  getOpDistance() - 1, ordered)``); infix chains fold left-associatively
  exactly like the grammar (NQuery/WQuery productions);
- truncated terms expand against the term dictionary at execution into a
  ``SpanOrQuery``; a distance operand that expands to nothing makes the
  whole distance query match nothing (DistanceQuery.java:83-90);
- AND/OR/NOT combine the sub-results' doc sets (intersection / union /
  exclusion);
- ranking simplification vs the reference: surround's rewritten span
  queries score through the full Similarity; here a doc's score is
  boost * (minimal span count) — the ``span_count`` surface — which
  preserves the proximity-frequency ordering. BM25-scored terms remain
  available through the classic parser.

Only the index's configured field is searchable; a different ``field:``
prefix raises.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search import spans as SP

__all__ = ["parse", "execute", "SurroundParseError"]


class SurroundParseError(ValueError):
    pass


#: expansion cap per truncated term — the TooManyBasicQueries bound
#: (query/BasicQueryFactory.java; default maxBasicQueries 1024)
MAX_BASIC_QUERIES = 1024


# ---- AST (boolean layer above the span layer) ------------------------------


@dataclass(frozen=True)
class _Bool:
    op: str  # "and" | "or" | "not"
    clauses: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class _Span:
    q: object  # spans.SpanQuery with possible _Trunc leaves
    boost: float = 1.0


@dataclass(frozen=True)
class _Trunc:
    """A truncated term (``pre*`` / ``te?m``) awaiting dictionary
    expansion (SrndTruncQuery.java / SrndPrefixQuery.java)."""

    pattern: str


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<colon>:)
      | (?P<carat>\^(?P<boost>\d+(?:\.\d+)?))
      | (?P<quoted>"(?:[^"\\]|\\["\\])+")
      | (?P<word>[^\s(),:^"]+)
    )""",
    re.VERBOSE,
)

#: the grammar's _DISTOP_NUM allows only 2-99; bare W/N mean distance 1,
#: and "0w"/"1w" are ordinary terms (QueryParser.jj token _DISTOP_NUM)
_DIST_RE = re.compile(r"^([2-9]|[1-9][0-9])?([WwNn])$")


def _lex(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise SurroundParseError(f"cannot lex at: {text[pos:]!r}")
            break
        pos = m.end()
        for kind in ("lparen", "rparen", "comma", "colon", "quoted", "word"):
            if m.group(kind):
                out.append((kind, m.group(kind)))
                break
        else:
            out.append(("boost", m.group("boost")))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0
        #: every field: prefix seen anywhere (incl. nested groups and
        #: prefix-operator argument lists) — validated by execute()
        self.fields_seen: list[str] = []

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str):
        k, v = self.next()
        if k != kind:
            raise SurroundParseError(f"expected {kind}, got {k}:{v!r}")
        return v

    # precedence: OR < AND < NOT < N < W < primary (grammar productions)
    def fields_query(self):
        # field: prefixes — accepted, validated at execution
        fields = []
        while (
            self.peek()[0] == "word"
            and self.toks[self.i + 1][0] == "colon"
        ):
            fields.append(self.next()[1])
            self.next()
        self.fields_seen.extend(fields)
        q = self.or_query()
        return (fields, q) if fields else ([], q)

    def or_query(self):
        q = self.and_query()
        clauses = [q]
        while self.peek() == ("word", "OR") or (
            self.peek()[0] == "word" and self.peek()[1].upper() == "OR"
        ):
            self.next()
            clauses.append(self.and_query())
        return clauses[0] if len(clauses) == 1 else _Bool("or", tuple(clauses))

    def and_query(self):
        clauses = [self.not_query()]
        while self.peek()[0] == "word" and self.peek()[1].upper() == "AND":
            self.next()
            clauses.append(self.not_query())
        return clauses[0] if len(clauses) == 1 else _Bool("and", tuple(clauses))

    def not_query(self):
        clauses = [self.n_query()]
        while self.peek()[0] == "word" and self.peek()[1].upper() == "NOT":
            self.next()
            clauses.append(self.n_query())
        return clauses[0] if len(clauses) == 1 else _Bool("not", tuple(clauses))

    def _dist_level(self, letter: str, inner):
        # infix distance is BINARY and left-associative (WQuery/NQuery);
        # a distance token AFTER an operand is always infix — the prefix
        # form ("3W(a,b)") only occurs where a primary is expected, so
        # 'a W (b)' parses as infix with a parenthesized right operand
        q = inner()
        while True:
            k, v = self.peek()
            m = _DIST_RE.match(v) if k == "word" else None
            if not m or m.group(2).upper() != letter:
                return q
            self.next()
            dist = int(m.group(1) or 1)
            rhs = inner()
            q = _fold_near(q, rhs, dist, ordered=(letter == "W"))

    def n_query(self):
        return self._dist_level("N", self.w_query)

    def w_query(self):
        return self._dist_level("W", self.primary)

    def primary(self):
        k, v = self.peek()
        if k == "lparen":
            self.next()
            _, q = self.fields_query()
            self.expect("rparen")
            return self._weights(q)
        if k == "word":
            up = v.upper()
            m = _DIST_RE.match(v)
            if (
                up in ("AND", "OR", "NOT") or m
            ) and self.toks[self.i + 1] == ("lparen", "("):
                self.next()
                args = self._arg_list()
                if up == "AND":
                    return self._weights(_Bool("and", tuple(args)))
                if up == "OR":
                    return self._weights(_Bool("or", tuple(args)))
                if up == "NOT":
                    raise SurroundParseError("NOT has no prefix form")
                dist = int(m.group(1) or 1)
                spans_args = []
                boost = 1.0
                for a in args:
                    sq, b = _require_span(a)
                    spans_args.append(sq)
                    boost *= b
                return self._weights(
                    _Span(
                        SP.SpanNearQuery(
                            tuple(spans_args),
                            slop=dist - 1,
                            in_order=m.group(2).upper() == "W",
                        ),
                        boost,
                    )
                )
            self.next()
            return self._weights(_term(v))
        if k == "quoted":
            self.next()
            body = v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
            return self._weights(_Span(SP.SpanTermQuery(body.lower())))
        raise SurroundParseError(f"unexpected token {k}:{v!r}")

    def _arg_list(self):
        self.expect("lparen")
        args = [self.fields_query()[1]]
        while self.peek()[0] == "comma":
            self.next()
            args.append(self.fields_query()[1])
        self.expect("rparen")
        return args

    def _weights(self, q):
        if self.peek()[0] == "boost":
            import dataclasses

            b = float(self.next()[1])
            if isinstance(q, (_Bool, _Span)):
                q = dataclasses.replace(q, boost=q.boost * b)
        return q


def _term(text: str):
    if "*" in text or "?" in text:
        return _Span(SP.SpanTermQuery(_Trunc(text.lower())))  # type: ignore[arg-type]
    return _Span(SP.SpanTermQuery(text.lower()))


def _require_span(node) -> tuple[SP.SpanQuery, float]:
    """(span query, accumulated boost) for a distance operand. OR groups
    are valid operands (OrQuery implements DistanceSubQuery, OrQuery.java:26
    — they become SpanOr clauses); AND/NOT are not (only OrQuery and terms
    carry DistanceSubQuery in the reference). Operand boosts multiply into
    the enclosing distance query (weights may sit at any level,
    SrndQuery.java:61)."""
    if isinstance(node, _Span):
        return node.q, node.boost
    if isinstance(node, _Bool) and node.op == "or":
        clauses = []
        boost = node.boost
        for c in node.clauses:
            sq, b = _require_span(c)
            clauses.append(sq)
            boost *= b
        return SP.SpanOrQuery(tuple(clauses)), boost
    raise SurroundParseError(
        "distance operators take span or OR operands; AND/NOT subqueries "
        "are not DistanceSubQuery (DistanceQuery.java:83)"
    )


def _fold_near(a, b, dist: int, ordered: bool):
    qa, ba = _require_span(a)
    qb, bb = _require_span(b)
    return _Span(
        SP.SpanNearQuery((qa, qb), slop=dist - 1, in_order=ordered), ba * bb
    )


def parse(text: str):
    """Surround syntax -> (field_names, AST) where field_names includes
    every ``field:`` prefix seen at ANY nesting depth. Raises
    SurroundParseError."""
    p = _Parser(_lex(text))
    _, q = p.fields_query()
    if p.peek()[0] != "eof":
        raise SurroundParseError(f"trailing input at {p.peek()!r}")
    return p.fields_seen, q


# ---- execution -------------------------------------------------------------


def _expand_trunc(searcher, q: SP.SpanQuery) -> SP.SpanQuery | None:
    """Replace _Trunc leaves with SpanOr over matching dictionary terms;
    None = a truncation matched nothing (inside a distance op that kills
    the whole query, DistanceQuery.java:83-90)."""
    if isinstance(q, SP.SpanTermQuery):
        t = q.term
        if isinstance(t, _Trunc):
            rx = "^" + re.escape(t.pattern).replace("\\*", ".*").replace("\\?", ".") + "$"
            fld = searcher.index.config.field_name
            terms = [
                r["term"]
                for r in searcher.index.termstats.filter(
                    (F.col("field") == fld) & F.col("term").rlike(rx)
                )
                .select("term")
                .limit(MAX_BASIC_QUERIES + 1)
                .collect()
            ]
            if len(terms) > MAX_BASIC_QUERIES:
                # fail loudly like BasicQueryFactory -> TooManyBasicQueries
                # rather than silently searching an arbitrary term subset
                raise SurroundParseError(
                    f"too unrestrictive truncation {t.pattern!r}: more than "
                    f"{MAX_BASIC_QUERIES} dictionary terms match"
                )
            if not terms:
                return None
            if len(terms) == 1:
                return SP.SpanTermQuery(terms[0])
            return SP.SpanOrQuery(tuple(SP.SpanTermQuery(t) for t in sorted(terms)))
        return q
    if isinstance(q, SP.SpanNearQuery):
        sub = [_expand_trunc(searcher, c) for c in q.clauses]
        if any(s is None for s in sub):
            return None
        return SP.SpanNearQuery(tuple(sub), slop=q.slop, in_order=q.in_order)
    if isinstance(q, SP.SpanOrQuery):
        sub = [s for s in (_expand_trunc(searcher, c) for c in q.clauses) if s]
        return SP.SpanOrQuery(tuple(sub)) if sub else None
    return q


def _exec_node(searcher, node) -> DataFrame:
    """-> (doc_id, score:double) for one AST node."""
    if isinstance(node, _Span):
        q = _expand_trunc(searcher, node.q)
        if q is None:
            return searcher.index.docs.sparkSession.createDataFrame(
                [], "doc_id long, score double"
            )
        counted = SP.span_count(searcher, q)
        return counted.select(
            "doc_id", (F.col("n_spans").cast("double") * node.boost).alias("score")
        )
    assert isinstance(node, _Bool)
    parts = [_exec_node(searcher, c) for c in node.clauses]
    if node.op == "or":
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        out = u.groupBy("doc_id").agg(F.sum("score").alias("score"))
    elif node.op == "and":
        out = parts[0]
        for p in parts[1:]:
            out = (
                out.alias("l")
                .join(p.alias("r"), "doc_id")
                .select("doc_id", (F.col("l.score") + F.col("r.score")).alias("score"))
            )
    else:  # not: first clause minus the rest (NotQuery.java)
        out = parts[0]
        for p in parts[1:]:
            out = out.join(p.select("doc_id"), "doc_id", "left_anti")
    return out.select("doc_id", (F.col("score") * node.boost).alias("score"))


def execute(searcher, text: str, k: int = 10) -> DataFrame:
    """Parse + run a surround query -> top-k (doc_id, score), score =
    boost-weighted span counts (see module docstring)."""
    fields, ast = parse(text)
    fld = searcher.index.config.field_name
    for f in fields:
        if f != fld:
            raise NotImplementedError(
                f"field {f!r} is not this index's search field {fld!r}"
            )
    return (
        _exec_node(searcher, ast)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
