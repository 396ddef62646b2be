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

Everything is joins over exploded tokens — no per-doc Python query loop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.analysis.sql import sql_tokens
from lucene_spark.search import query as Q

__all__ = ["Monitor"]


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

    def register(self, query_id: str, query: Q.Query) -> None:
        if not isinstance(
            query,
            (Q.TermQuery, Q.BooleanQuery, Q.PhraseQuery, Q.PrefixQuery,
             Q.FuzzyQuery, Q.WildcardQuery, Q.RegexpQuery),
        ):
            raise NotImplementedError(
                "Monitor supports Term/Boolean/Phrase/Prefix/Fuzzy/Wildcard/"
                f"Regexp queries, got {type(query).__name__}"
            )
        if isinstance(query, Q.RegexpQuery):
            _check_regexp_portable(query.regex)
        self._entries[query_id] = query

    def unregister(self, query_id: str) -> None:
        self._entries.pop(query_id, None)

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
        return out.join(not_hits, ["query_id", "doc_id"], "left_anti")

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
