"""SimpleQueryParser → Query AST — the "never throws" human query syntax.

Mirrors ``queryparser/simple/SimpleQueryParser.java`` (661 lines): a
char-at-a-time state machine that interprets whatever the user typed and
silently ignores syntax errors (unclosed parens/quotes become extraneous
characters, SimpleQueryParser.java:280-287,:335-340).

Syntax (javadoc :49-60):

- ``+`` AND, ``|`` OR, ``-`` NOT (immediately before a token; double
  negation cancels), ``"..."`` phrase with ``~N`` near, trailing ``*``
  prefix, ``term~N`` fuzzy, ``( ... )`` precedence, ``\\`` escape.
- default operator between bare tokens is SHOULD (:140).
- ``parse("*")`` → MatchAllDocs; empty/unusable input → MatchNoDocs
  (:161-175).

Operator precedence is simple right-to-left tree building: whenever the
operation changes, the current tree nests as the first clause of a new
BooleanQuery (buildQueryTree, :449-490). Negation wraps the branch as
``(MUST_NOT branch, SHOULD MatchAllDocs)`` (:453-459).

Multi-field search: ``weights={field: boost}`` expands every produced
token/phrase/prefix/fuzzy query to a SHOULD across fields with per-field
BoostQuery wrapping, simplified when 0/1 clauses remain (:556-645).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
import re

from lucene_spark.analysis.tokenizer import StandardAnalyzer, java_lower
from lucene_spark.search import query as Q

__all__ = [
    "SimpleQueryParser",
    "AND_OPERATOR",
    "NOT_OPERATOR",
    "OR_OPERATOR",
    "PREFIX_OPERATOR",
    "PHRASE_OPERATOR",
    "PRECEDENCE_OPERATORS",
    "ESCAPE_OPERATOR",
    "WHITESPACE_OPERATOR",
    "FUZZY_OPERATOR",
    "NEAR_OPERATOR",
    "ALL_OPERATORS",
]

# feature flags (SimpleQueryParser.java:107-139); -1 enables everything
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

#: LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE — fuzzy edits cap (:414)
_MAX_FUZZINESS = 2

_WS = " \t\n\r"
_INT = re.compile(r"^[+-]?[0-9]+$")  # Integer.parseInt acceptance


@dataclass
class _State:
    """Parse window over the query chars (SimpleQueryParser.java State)."""

    data: str
    index: int
    length: int
    current_op: Q.Occur | None = None
    previous_op: Q.Occur | None = None
    not_count: int = 0
    top: Q.Query | None = None


@dataclass
class SimpleQueryParser:
    """``SimpleQueryParser(field=...)`` or ``SimpleQueryParser(weights=...)``
    for multi-field search with per-field boosts."""

    field: str | None = None
    weights: dict[str, float] | None = None
    analyzer: StandardAnalyzer = dc_field(default_factory=StandardAnalyzer)
    flags: int = ALL_OPERATORS
    default_operator: Q.Occur = Q.Occur.SHOULD

    def __post_init__(self) -> None:
        if self.weights is None:
            if self.field is None:
                raise ValueError("pass field=... or weights={field: boost}")
            self.weights = {self.field: 1.0}
        if self.default_operator not in (Q.Occur.SHOULD, Q.Occur.MUST):
            # setDefaultOperator rejects everything else (:648-653)
            raise ValueError("default operator must be SHOULD or MUST")

    # ------------------------------------------------------------- parse

    def parse(self, query_text: str) -> Q.Query:
        if query_text.strip() == "*":
            return Q.MatchAllDocsQuery()
        state = _State(query_text, 0, len(query_text))
        self._parse_sub_query(state)
        if state.top is None:
            return Q.MatchNoDocsQuery()
        return state.top

    def _parse_sub_query(self, state: _State) -> None:
        flags = self.flags
        while state.index < state.length:
            ch = state.data[state.index]
            if ch == "(" and flags & PRECEDENCE_OPERATORS:
                self._consume_sub_query(state)
            elif ch == ")" and flags & PRECEDENCE_OPERATORS:
                state.index += 1  # extraneous, ignored
            elif ch == '"' and flags & PHRASE_OPERATOR:
                self._consume_phrase(state)
            elif ch == "+" and flags & AND_OPERATOR:
                # ignored when an op is already set or nothing precedes it
                if state.current_op is None and state.top is not None:
                    state.current_op = Q.Occur.MUST
                state.index += 1
            elif ch == "|" and flags & OR_OPERATOR:
                if state.current_op is None and state.top is not None:
                    state.current_op = Q.Occur.SHOULD
                state.index += 1
            elif ch == "-" and flags & NOT_OPERATOR:
                # two '-' in a row negate each other; even whitespace
                # between '-' and the token resets the negation (:233-239)
                state.not_count += 1
                state.index += 1
                continue
            elif ch in _WS and flags & WHITESPACE_OPERATOR:
                state.index += 1
            else:
                self._consume_token(state)
            state.not_count = 0

    # --------------------------------------------------------- consumers

    def _consume_sub_query(self, state: _State) -> None:
        state.index += 1
        start = state.index
        precedence = 1
        escaped = False
        while state.index < state.length:
            if not escaped:
                ch = state.data[state.index]
                if ch == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if ch == "(":
                    precedence += 1
                elif ch == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # no closing paren: the opening one is extraneous (:280-284)
            state.index = start
        elif state.index == start:
            # "()": reset the operation that would have applied (:285-291)
            state.current_op = None
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub_query(sub)
            self._build_query_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        state.index += 1
        start = state.index
        buf: list[str] = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            if not escaped:
                ch = state.data[state.index]
                if ch == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if ch == '"':
                    if (
                        state.length > state.index + 1
                        and state.data[state.index + 1] == "~"
                        and self.flags & NEAR_OPERATOR
                    ):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # unclosed quote is extraneous
        elif state.index == start:
            state.current_op = None  # empty phrase ""
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_query_tree(state, self._new_phrase_query(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            if not escaped:
                ch = state.data[state.index]
                if ch == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and ch == "~" and self.flags & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                # prefix tracks whether the LAST char is an unescaped '*'
                prefix = bool(buf) and ch == "*" and bool(
                    self.flags & PREFIX_OPERATOR
                )
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if not buf:
            return
        if fuzzy:
            token = "".join(buf)
            fuzziness = min(self._parse_fuzziness(state), _MAX_FUZZINESS)
            if fuzziness == 0:
                branch = self._new_default_query(token)
            else:
                branch = self._new_fuzzy_query(token, fuzziness)
        elif prefix:
            branch = self._new_prefix_query("".join(buf[:-1]))
        else:
            branch = self._new_default_query("".join(buf))
        self._build_query_tree(state, branch)

    def _parse_fuzziness(self, state: _State) -> int:
        """Slop/edit distance after ``~``; 0 on anything unparsable
        (SimpleQueryParser.java:495-535: empty → 2, NFE → 0, negative → 0)."""
        if state.data[state.index] != "~":
            return 0
        chars: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                chars.append(state.data[state.index])
        text = "".join(chars)
        if not text:
            return 2  # automatic fuzziness
        if not _INT.match(text):
            return 0
        return max(int(text), 0)

    def _token_finished(self, state: _State) -> bool:
        ch = state.data[state.index]
        flags = self.flags
        return bool(
            (ch == '"' and flags & PHRASE_OPERATOR)
            or (ch == "|" and flags & OR_OPERATOR)
            or (ch == "+" and flags & AND_OPERATOR)
            or (ch in "()" and flags & PRECEDENCE_OPERATORS)
            or (ch in _WS and flags & WHITESPACE_OPERATOR)
        )

    # ------------------------------------------------------ tree building

    def _build_query_tree(self, state: _State, branch: Q.Query | None) -> None:
        if branch is None:
            return
        if state.not_count % 2 == 1:
            # negation: NOT branch, everything else matches (:453-459)
            branch = Q.BooleanQuery(
                (
                    Q.BooleanClause(branch, Q.Occur.MUST_NOT),
                    Q.BooleanClause(Q.MatchAllDocsQuery(), Q.Occur.SHOULD),
                )
            )
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_operator
            # an operation CHANGE nests the current tree one level deeper,
            # which is what makes precedence right-to-left (:471-480)
            if state.previous_op is not state.current_op:
                state.top = Q.BooleanQuery(
                    (Q.BooleanClause(state.top, state.current_op),)
                )
            assert isinstance(state.top, Q.BooleanQuery)
            state.top = Q.BooleanQuery(
                state.top.clauses + (Q.BooleanClause(branch, state.current_op),),
                state.top.minimum_should_match,
            )
            state.previous_op = state.current_op
        state.current_op = None

    # --------------------------------------------------- query factories

    def _across_fields(self, make) -> Q.Query | None:
        """Expand a per-field factory across the weights map as SHOULD
        clauses with boosts, simplified for 0/1 clauses (:556-575,:624-632)."""
        clauses: list[Q.Query] = []
        for fld, boost in self.weights.items():
            q = make(fld)
            if q is None:
                continue
            if boost != 1.0:
                q = Q.BoostQuery(q, boost)
            clauses.append(q)
        if not clauses:
            return None
        if len(clauses) == 1:
            return clauses[0]
        return Q.BooleanQuery.of(should=tuple(clauses))

    def _new_default_query(self, text: str) -> Q.Query | None:
        """QueryBuilder.createBooleanQuery: analyze; one term → TermQuery,
        several → BooleanQuery with the default operator per clause."""

        def make(fld: str) -> Q.Query | None:
            terms = self.analyzer.terms(text)
            if not terms:
                return None
            if len(terms) == 1:
                return Q.TermQuery(fld, terms[0])
            occur = self.default_operator
            return Q.BooleanQuery(
                tuple(Q.BooleanClause(Q.TermQuery(fld, t), occur) for t in terms)
            )

        return self._across_fields(make)

    def _new_fuzzy_query(self, text: str, fuzziness: int) -> Q.Query | None:
        # Analyzer.normalize: lowercase only, no tokenization (:602-607)
        return self._across_fields(
            lambda fld: Q.FuzzyQuery(fld, java_lower(text), max_edits=fuzziness)
        )

    def _new_phrase_query(self, text: str, slop: int) -> Q.Query | None:
        def make(fld: str) -> Q.Query | None:
            terms = self.analyzer.terms(text)
            if not terms:
                return None
            if len(terms) == 1:
                return Q.TermQuery(fld, terms[0])
            return Q.PhraseQuery(fld, tuple(terms), slop=slop)

        return self._across_fields(make)

    def _new_prefix_query(self, text: str) -> Q.Query | None:
        return self._across_fields(
            lambda fld: Q.PrefixQuery(fld, java_lower(text))
        )
