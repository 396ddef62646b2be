"""Monitor / percolator: standing queries matched against a doc stream.

Reference: ``lucene/monitor/.../Monitor.java:42`` — register queries once,
then stream documents through them; a presearcher prunes the query set per
doc batch before full evaluation.

Spark re-expression: registered queries become a broadcast *query-term
table*; each micro-batch is tokenized once (the MemoryIndex analog —
``memory/MemoryIndex.java:199`` builds a one-doc index, we build a
one-BATCH term table) and joined against it:

1. presearch: candidate (query, doc) pairs = queries sharing >= 1 term
   with the doc (the TermFilteredPresearcher strategy);
2. full match: per-query semantics verified on the candidates only
   (AND = all required terms present; phrase = positions consecutive).

Everything is joins over exploded tokens — no per-doc Python query loop
for the flat tier. Arbitrary NESTED queries (boolean-of-boolean, dismax,
sloppy phrases, multi-term children) take the reference's two-stage
architecture instead: ``monitor/QueryAnalyzer.java`` extracts a minimal
*covering* term set per query (a doc matching the query must contain at
least one of them — conjunction picks its cheapest child's set,
disjunction unions its children's), the covering sets presearch exactly
like flat terms, and only the surviving candidate pairs are verified by
``MemoryIndex`` (``monitor/CandidateMatcher.java``'s role) inside one
Arrow-batched ``mapInPandas`` — one MemoryIndex build per candidate DOC,
shared across all its candidate queries. The Python stage therefore sees
``|candidates|`` rows, not ``|docs| x |queries|``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.analysis.sql import sql_tokens
from lucene_spark.search import query as Q

__all__ = ["Monitor"]

#: node types the complex tier can verify (everything MemoryIndex scores)
_VERIFIABLE = (
    Q.TermQuery,
    Q.SynonymQuery,
    Q.PhraseQuery,
    Q.MultiPhraseQuery,
    Q.BooleanQuery,
    Q.DisjunctionMaxQuery,
    Q.BoostQuery,
    Q.ConstantScoreQuery,
    Q.MatchAllDocsQuery,
    Q.MatchNoDocsQuery,
    Q.PrefixQuery,
    Q.WildcardQuery,
    Q.RegexpQuery,
    Q.FuzzyQuery,
    Q.TermInSetQuery,
    Q.TermRangeQuery,
)


def _children(q: Q.Query) -> tuple[Q.Query, ...]:
    if isinstance(q, Q.BooleanQuery):
        return tuple(c.query for c in q.clauses)
    if isinstance(q, Q.DisjunctionMaxQuery):
        return tuple(q.queries)
    if isinstance(q, (Q.BoostQuery, Q.ConstantScoreQuery)):
        return (q.query,)
    return ()


def _validate_tree(q: Q.Query) -> None:
    if not isinstance(q, _VERIFIABLE):
        raise NotImplementedError(
            f"Monitor cannot verify {type(q).__name__} standing queries"
        )
    if isinstance(q, Q.RegexpQuery):
        _check_regexp_portable(q.regex)
    for c in _children(q):
        _validate_tree(c)


def _fields_of(q: Q.Query) -> set[str]:
    out = set()
    f = getattr(q, "field", None)
    if f is not None:
        out.add(f)
    for c in _children(q):
        out |= _fields_of(c)
    return out


#: covering-set result: (terms, patterns, any_token). ``patterns`` rows are
#: (pattern, pkind, edits, plen) and expand against the batch term
#: dictionary exactly like flat-tier Prefix/Fuzzy/Wildcard/Regexp queries.
#: ``any_token`` means no finite covering exists (MatchAll, pure MUST_NOT,
#: TermRange child) — the query presearches to every doc in the batch, like
#: the reference's ANYTOKEN (``TermFilteredPresearcher.java:66``).
_ANY = (frozenset(), frozenset(), True)
_NONE = (frozenset(), frozenset(), False)  # covers nothing: never matches


def _union(parts):
    terms, pats = set(), set()
    for t, p, anytok in parts:
        if anytok:
            return _ANY
        terms |= t
        pats |= p
    return (frozenset(terms), frozenset(pats), False)


def _cover_cost(c) -> tuple:
    """Order candidate coverings: finite beats ANY, terms beat patterns,
    fewer entries beat more (QueryAnalyzer's TermWeightor role)."""
    terms, pats, anytok = c
    return (anytok, len(pats), len(terms))


def _covering(q: Q.Query):
    """Minimal term set such that any matching doc contains >= 1 of them
    (``monitor/QueryAnalyzer.java`` conjunction/disjunction propagation)."""
    if isinstance(q, Q.TermQuery):
        return (frozenset([q.term]), frozenset(), False)
    if isinstance(q, (Q.SynonymQuery, Q.TermInSetQuery)):
        return (frozenset(q.terms), frozenset(), False)
    if isinstance(q, Q.PhraseQuery):
        if not q.terms:
            return _NONE
        # every slot is required — anchor on the longest (rarest-ish) term,
        # the reference's TermWeightor.lengthWeightor default
        return (frozenset([max(q.terms, key=len)]), frozenset(), False)
    if isinstance(q, Q.MultiPhraseQuery):
        if not q.slots:
            return _NONE
        # every slot required: pick the slot with the fewest alternatives,
        # union its alternatives
        slot = min(q.slots, key=len)
        if not slot:
            return _ANY
        return (frozenset(slot), frozenset(), False)
    if isinstance(q, Q.PrefixQuery):
        return (frozenset(), frozenset([(q.prefix, "prefix", 0, 0)]), False)
    if isinstance(q, Q.FuzzyQuery):
        return (
            frozenset(),
            frozenset([(q.term, "fuzzy", int(q.max_edits), int(q.prefix_length))]),
            False,
        )
    if isinstance(q, Q.WildcardQuery):
        from lucene_spark.search.searcher import _wildcard_to_regex

        return (
            frozenset(),
            frozenset([("^" + _wildcard_to_regex(q.pattern) + "$", "regex", 0, 0)]),
            False,
        )
    if isinstance(q, Q.RegexpQuery):
        return (frozenset(), frozenset([("^" + q.regex + "$", "regex", 0, 0)]), False)
    if isinstance(q, (Q.BoostQuery, Q.ConstantScoreQuery)):
        return _covering(q.query)
    if isinstance(q, Q.DisjunctionMaxQuery):
        return _union(_covering(c) for c in q.queries)
    if isinstance(q, Q.MatchNoDocsQuery):
        return _NONE
    if isinstance(q, Q.BooleanQuery):
        required = [
            c.query
            for c in q.clauses
            if c.occur in (Q.Occur.MUST, Q.Occur.FILTER)
        ]
        shoulds = [c.query for c in q.clauses if c.occur is Q.Occur.SHOULD]
        if required:
            best = min((_covering(r) for r in required), key=_cover_cost)
            if not best[2]:
                return best
        # no (coverable) required clause: SHOULD terms are one-of-required
        # whenever the query can match at all (msm defaults to 1 with no
        # MUST/FILTER present — MemoryIndex._boolean mirrors this)
        if shoulds:
            return _union(_covering(s) for s in shoulds)
        return _ANY  # pure MUST_NOT / empty
    # MatchAllDocsQuery, TermRangeQuery (dictionary ranges are not worth a
    # dedicated join kind at standing-query cardinality) — match-all fallback
    return _ANY


def _check_regexp_portable(rx: str) -> None:
    """Reject regex syntax outside the reference's RegExp dialect
    (``util/automaton/RegExp.java`` — literals, ``.``, ``* + ?``, ``|``,
    groups, char classes, ``{n,m}``). Over that subset Java ``rlike``
    (the batch-side evaluator here and the index path in
    ``searcher.py``) and Python ``re`` (MemoryIndex, explain) agree;
    dialect-specific constructs would match different term sets per
    evaluator or throw PatternSyntaxException mid-batch."""
    import re as _re

    try:
        _re.compile(rx)
    except _re.error as e:  # Java-only syntax fails here too
        raise ValueError(f"unsupported regexp syntax {rx!r}: {e}") from e
    for bad in ("(?P", "(?<", "(?#", r"\p", r"\N", r"\Z", r"\A"):
        if bad in rx:
            raise ValueError(
                f"regexp construct {bad!r} is outside the portable "
                "RegExp.java subset (literals, '.', '*', '+', '?', '|', "
                "groups, char classes, '{n,m}') and evaluates "
                "differently across the JVM/Python matchers"
            )


@dataclass(frozen=True)
class _Entry:
    query_id: str
    query: Q.Query


class Monitor:
    """Register queries; match micro-batches of docs against all of them."""

    def __init__(self) -> None:
        self._entries: dict[str, Q.Query] = {}
        #: query_ids verified by MemoryIndex (nested / sloppy / mixed trees)
        self._complex: set[str] = set()
        #: when True, match_batch records presearcher selectivity evidence
        #: in last_match_stats: {"n_queries", "n_docs", "candidate_pairs",
        #: "total_pairs"} — candidate_pairs is the distinct (query, doc)
        #: set the term-filtered presearcher forwards to verification
        #: (TermFilteredPresearcher.java's role: candidates / total is the
        #: number that keeps 10^5 standing queries tractable). Costs extra
        #: count jobs; leave off in production.
        self.collect_stats = False
        self.last_match_stats: dict | None = None

    @staticmethod
    def _is_flat(query: Q.Query) -> bool:
        """True when the pure-JVM flat tier evaluates the query exactly:
        single terms, EXACT phrases, single multi-term patterns, and
        one-level booleans of plain terms."""
        if isinstance(query, Q.TermQuery):
            return True
        if isinstance(query, Q.PhraseQuery):
            return query.slop == 0
        if isinstance(
            query, (Q.PrefixQuery, Q.FuzzyQuery, Q.WildcardQuery, Q.RegexpQuery)
        ):
            return True
        if isinstance(query, Q.BooleanQuery):
            return all(isinstance(c.query, Q.TermQuery) for c in query.clauses)
        return False

    def register(self, query_id: str, query: Q.Query) -> None:
        _validate_tree(query)
        if self._is_flat(query):
            self._complex.discard(query_id)
        else:
            self._complex.add(query_id)
        self._entries[query_id] = query

    def unregister(self, query_id: str) -> None:
        self._entries.pop(query_id, None)
        self._complex.discard(query_id)

    def _query_tables(
        self, spark: SparkSession
    ) -> tuple[DataFrame, DataFrame]:
        """(terms, meta):

        terms — (query_id, term, kind, slot, n_required): kind 'must' |
        'should' | 'phrase' | 'not'; slot = phrase position index;
        n_required = phrase slot count (phrase rows only). 'not' rows
        anti-join candidate pairs.

        meta — (query_id, n_must, msm): per-query requirements for the
        term/boolean family; a doc matches iff it hits all n_must required
        terms AND at least msm distinct SHOULD terms (BooleanQuery
        semantics: msm constrains only when >= 1; pure disjunctions
        require >= 1).
        """
        rows = []
        meta = []
        for qid, q in self._entries.items():
            if qid in self._complex:
                continue  # covering-set presearch + MemoryIndex verify
            if isinstance(
                q, (Q.PrefixQuery, Q.FuzzyQuery, Q.WildcardQuery, Q.RegexpQuery)
            ):
                continue  # expanded per batch in match_batch (presearcher)
            if isinstance(q, Q.TermQuery):
                rows.append((qid, q.term, "must", 0, 0))
                meta.append((qid, 1, 0))
            elif isinstance(q, Q.PhraseQuery):
                for i, t in enumerate(q.terms):
                    rows.append((qid, t, "phrase", i, len(q.terms)))
            elif isinstance(q, Q.BooleanQuery):
                musts = [
                    c.query
                    for c in q.clauses
                    if c.occur in (Q.Occur.MUST, Q.Occur.FILTER)
                ]
                shoulds = [
                    c.query for c in q.clauses if c.occur is Q.Occur.SHOULD
                ]
                nots = [
                    c.query for c in q.clauses if c.occur is Q.Occur.MUST_NOT
                ]
                if any(
                    not isinstance(s, Q.TermQuery) for s in musts + shoulds + nots
                ):
                    # Defensive: register() routes any query with non-term
                    # sub-clauses to the covering-set `_complex` tier before
                    # reaching this flat-term extractor, so this branch is
                    # believed unreachable; it guards future registration paths.
                    raise NotImplementedError("nested boolean in Monitor")
                for s in musts:
                    rows.append((qid, s.term, "must", 0, 0))
                msm = q.minimum_should_match if musts else max(
                    q.minimum_should_match, 1
                )
                if msm >= 1:
                    for s in shoulds:
                        rows.append((qid, s.term, "should", 0, 0))
                for s in nots:
                    rows.append((qid, s.term, "not", 0, 0))
                meta.append((qid, len(musts), msm))
        terms_df = spark.createDataFrame(
            rows, schema="query_id string, term string, kind string, slot int, n_required int"
        )
        meta_df = spark.createDataFrame(
            meta, schema="query_id string, n_must int, msm int"
        )
        return terms_df, meta_df

    def match_batch(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        """(query_id, doc_id) pairs for every registered query matching."""
        if not self._entries:
            return docs.sparkSession.createDataFrame(
                [], schema="query_id string, doc_id long"
            )
        spark = docs.sparkSession
        terms_df, meta_df = self._query_tables(spark)
        # analyzer-consistent doc-side tokenization (lowercase + the
        # StandardAnalyzer word-break regex), all JVM-side
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(sql_tokens(F.col(text_col))).alias("pos", "term"),
        )
        # presearcher expansion for multi-term standing queries
        # (TermFilteredPresearcher.java strategy): Prefix/Fuzzy queries
        # expand against the BATCH's term dictionary at match time — a
        # broadcast theta-join over the distinct batch terms, no per-doc
        # Python — and then behave as 1-of term sets (SHOULD, msm=1).
        pat_rows = []
        pat_meta = []
        for qid, q in self._entries.items():
            if qid in self._complex:
                continue
            if isinstance(q, Q.PrefixQuery):
                pat_rows.append((qid, q.prefix, "prefix", 0, 0))
                pat_meta.append((qid, 0, 1))
            elif isinstance(q, Q.FuzzyQuery):
                pat_rows.append(
                    (qid, q.term, "fuzzy", int(q.max_edits), int(q.prefix_length))
                )
                pat_meta.append((qid, 0, 1))
            elif isinstance(q, (Q.WildcardQuery, Q.RegexpQuery)):
                # both become anchored regexes evaluated JVM-side against
                # the batch term dictionary (RLike with a per-row pattern)
                from lucene_spark.search.searcher import _wildcard_to_regex

                rx = (
                    _wildcard_to_regex(q.pattern)
                    if isinstance(q, Q.WildcardQuery)
                    else q.regex
                )
                pat_rows.append((qid, "^" + rx + "$", "regex", 0, 0))
                pat_meta.append((qid, 0, 1))
        if pat_rows:
            pat_df = spark.createDataFrame(
                pat_rows,
                schema="query_id string, pattern string, pkind string, "
                "edits int, plen int",
            )
            batch_terms = toks.select("term").distinct()
            is_prefix = (F.col("pkind") == "prefix") & F.col("term").startswith(
                F.col("pattern")
            )
            is_fuzzy = (
                (F.col("pkind") == "fuzzy")
                & (F.levenshtein(F.col("term"), F.col("pattern")) <= F.col("edits"))
                & (
                    F.expr(
                        "substring(term, 1, plen) = substring(pattern, 1, plen)"
                    )
                )
            )
            is_regex = (F.col("pkind") == "regex") & F.expr(
                "term rlike pattern"
            )
            expanded = batch_terms.join(
                F.broadcast(pat_df), is_prefix | is_fuzzy | is_regex
            ).select(
                "query_id",
                "term",
                F.lit("should").alias("kind"),
                F.lit(0).alias("slot"),
                F.lit(0).alias("n_required"),
            )
            terms_df = terms_df.unionByName(expanded)
            meta_df = meta_df.unionByName(
                spark.createDataFrame(
                    pat_meta, schema="query_id string, n_must int, msm int"
                )
            )
        qt = F.broadcast(terms_df)
        j = toks.join(qt, "term")
        if self.collect_stats:
            n_docs = docs.count()
            self.last_match_stats = {
                "n_queries": len(self._entries),
                "n_docs": n_docs,
                "candidate_pairs": j.select("query_id", "doc_id")
                .distinct()
                .count(),
                "total_pairs": len(self._entries) * n_docs,
            }
        # term/boolean semantics: ALL required terms present AND >= msm
        # distinct SHOULD terms (the two counts must combine with AND —
        # counting them in one per-kind group would accept either alone)
        flat = (
            j.filter(F.col("kind").isin("must", "should"))
            .groupBy("query_id", "doc_id")
            .agg(
                F.countDistinct(
                    F.when(F.col("kind") == "must", F.col("term"))
                ).alias("n_must_hit"),
                F.countDistinct(
                    F.when(F.col("kind") == "should", F.col("term"))
                ).alias("n_should_hit"),
            )
            .join(F.broadcast(meta_df), "query_id")
            .filter(
                (F.col("n_must_hit") == F.col("n_must"))
                & (F.col("n_should_hit") >= F.col("msm"))
            )
            .select("query_id", "doc_id")
        )
        # phrase semantics: all slots align at some start position
        ph = j.filter(F.col("kind") == "phrase").select(
            "query_id",
            "doc_id",
            "n_required",
            (F.col("pos") - F.col("slot")).alias("start"),
            "slot",
        )
        phrase = (
            ph.dropDuplicates(["query_id", "doc_id", "start", "slot"])
            .groupBy("query_id", "doc_id", "n_required", "start")
            .agg(F.count("*").alias("n_slots"))
            .filter(F.col("n_slots") == F.col("n_required"))
            .select("query_id", "doc_id")
            .distinct()
        )
        out = flat.unionByName(phrase)
        # prohibited-term hits kill the candidate pair (MUST_NOT clauses)
        not_hits = (
            j.filter(F.col("kind") == "not").select("query_id", "doc_id").distinct()
        )
        result = out.join(not_hits, ["query_id", "doc_id"], "left_anti")
        if self._complex:
            result = result.unionByName(
                self._match_complex(docs, toks, text_col=text_col, id_col=id_col)
            )
        return result

    def _match_complex(
        self, docs: DataFrame, toks: DataFrame, text_col: str, id_col: str
    ) -> DataFrame:
        """Nested standing queries: covering-set presearch (QueryAnalyzer /
        TermFilteredPresearcher), then MemoryIndex verification of the
        surviving (query, doc) pairs only (CandidateMatcher). One Arrow
        batch stage; one MemoryIndex per candidate doc shared across its
        candidate queries."""
        spark = docs.sparkSession
        term_rows, pat_rows, any_qids = [], [], []
        entries = {}
        for qid in sorted(self._complex):
            q = self._entries[qid]
            entries[qid] = (q, tuple(sorted(_fields_of(q))) or (text_col,))
            terms, pats, anytok = _covering(q)
            if anytok:
                any_qids.append((qid,))
                continue
            term_rows.extend((qid, t) for t in sorted(terms))
            pat_rows.extend((qid,) + p for p in sorted(pats))
        cands = []
        if term_rows:
            anchors = spark.createDataFrame(
                term_rows, schema="query_id string, term string"
            )
            cands.append(
                toks.join(F.broadcast(anchors), "term").select("query_id", "doc_id")
            )
        if pat_rows:
            pat_df = spark.createDataFrame(
                pat_rows,
                schema="query_id string, pattern string, pkind string, "
                "edits int, plen int",
            )
            cond = (
                ((F.col("pkind") == "prefix") & F.col("term").startswith(F.col("pattern")))
                | (
                    (F.col("pkind") == "fuzzy")
                    & (F.levenshtein(F.col("term"), F.col("pattern")) <= F.col("edits"))
                    & F.expr("substring(term, 1, plen) = substring(pattern, 1, plen)")
                )
                | ((F.col("pkind") == "regex") & F.expr("term rlike pattern"))
            )
            expanded = (
                toks.select("term")
                .distinct()
                .join(F.broadcast(pat_df), cond)
                .select("query_id", "term")
            )
            cands.append(
                toks.join(F.broadcast(expanded), "term").select("query_id", "doc_id")
            )
        doc_cols = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
        )
        if any_qids:
            any_df = spark.createDataFrame(any_qids, schema="query_id string")
            cands.append(
                doc_cols.select("doc_id").crossJoin(F.broadcast(any_df))
                .select("query_id", "doc_id")
            )
        if not cands:
            return spark.createDataFrame([], schema="query_id string, doc_id long")
        cand = cands[0]
        for c in cands[1:]:
            cand = cand.unionByName(c)
        cand_docs = (
            cand.distinct()
            .groupBy("doc_id")
            .agg(F.collect_set("query_id").alias("qids"))
            .join(doc_cols, "doc_id")
        )
        bc = spark.sparkContext.broadcast(entries)

        def verify(batches):
            import pandas as pd

            from lucene_spark.streaming.memory_index import MemoryIndex

            reg = bc.value
            for pdf in batches:
                out_q, out_d = [], []
                for doc_id, qids, text in zip(
                    pdf["doc_id"], pdf["qids"], pdf["_text"]
                ):
                    mi = MemoryIndex()
                    for f in sorted({f for qid in qids for f in reg[qid][1]}):
                        mi.add_field(f, text or "")
                    for qid in qids:
                        if mi.search(reg[qid][0]) > 0.0:
                            out_q.append(qid)
                            out_d.append(int(doc_id))
                yield pd.DataFrame(
                    {
                        "query_id": pd.Series(out_q, dtype="object"),
                        "doc_id": pd.Series(out_d, dtype="int64"),
                    }
                )

        return cand_docs.mapInPandas(verify, schema="query_id string, doc_id long")

    def start(
        self,
        stream_df: DataFrame,
        sink_dir: str,
        checkpoint_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        """Wire a streaming doc source through the monitor; matches append
        to ``sink_dir`` as parquet (query_id, doc_id)."""

        def run_batch(batch_df: DataFrame, epoch_id: int) -> None:
            out = self.match_batch(batch_df, text_col=text_col, id_col=id_col)
            out.write.mode("append").parquet(sink_dir)

        return (
            stream_df.writeStream.foreachBatch(run_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
