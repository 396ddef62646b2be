"""IndexSearcher: lowers the Query AST to DataFrame plans over the index.

Execution-model parity with the reference (``search/IndexSearcher.java``):

- stats are searcher-wide (full-corpus aggregates), bound once per query
  into float32 weights (``IndexSearcher.java:1130-1159``,
  ``TermQuery.java:120-150``);
- scoring = ``weight - weight/(1 + freq*invNorm)`` evaluated as NATIVE Spark
  float expressions (whole-stage codegen), with the 256-entry norm-inverse
  cache as an array<float> literal (``BM25Similarity.java:217-222,:257-274``);
- boolean composition = one union + groupBy(doc_id) shuffle for all positive
  clauses, anti-join for MUST_NOT (``BooleanQuery.java``, ``ReqExclScorer``);
- top-k = ``ORDER BY score DESC, doc_id ASC LIMIT k`` (Spark TakeOrdered =
  per-partition heaps + merge; tie-break per ``TopScoreDocCollector.java:26``
  and ``TopDocs.java:75-119``);
- single-term top-k applies block-max pruning: per-block upper bounds from
  ``(max_freq, min_norm)`` impacts, a first pass over the highest-impact
  blocks establishes the running k-th score, remaining blocks with
  ``upper_bound < theta`` are never decoded (WAND family:
  ``search/WANDScorer.java:32-55``, ``MaxScoreCache.java:59-140``).
"""

from __future__ import annotations

import math
import re as _re
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lucene_spark.index import forutil
from lucene_spark.index.build import InvertedIndex
from lucene_spark.search import query as Q
from lucene_spark.search.similarity import BM25Similarity

__all__ = ["IndexSearcher"]

F32 = np.float32

_DECODE_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("doc_id", LongType()),
        StructField("freq", IntegerType()),
        StructField("norm", IntegerType()),
    ]
)

_DECODE_POS_SCHEMA = StructType(
    list(_DECODE_SCHEMA.fields) + [StructField("positions", ArrayType(IntegerType()))]
)


def _decode_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Unpack postings blocks -> (term, doc_id, freq, norm) rows (numpy)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        terms, docs, freqs, norms = [], [], [], []
        for row in pdf.itertuples(index=False):
            d = forutil.delta_decode(row.first_doc, forutil.for_decode(row.doc_gaps))
            f = forutil.pfor_decode(row.freqs)
            n = np.frombuffer(row.norms, dtype=np.uint8)
            terms.append(np.full(len(d), row.term, dtype=object))
            docs.append(d)
            freqs.append(f.astype(np.int32))
            norms.append(n.astype(np.int32))
        yield pd.DataFrame(
            {
                "term": np.concatenate(terms),
                "doc_id": np.concatenate(docs),
                "freq": np.concatenate(freqs),
                "norm": np.concatenate(norms),
            }
        )


def _decode_blocks_with_positions(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        out_rows = {k: [] for k in ("term", "doc_id", "freq", "norm", "positions")}
        for row in pdf.itertuples(index=False):
            d = forutil.delta_decode(row.first_doc, forutil.for_decode(row.doc_gaps))
            f = forutil.pfor_decode(row.freqs)
            n = np.frombuffer(row.norms, dtype=np.uint8)
            flat = forutil.for_decode(row.positions).astype(np.int32)
            splits = np.split(flat, np.cumsum(f)[:-1])
            out_rows["term"].extend([row.term] * len(d))
            out_rows["doc_id"].extend(d.tolist())
            out_rows["freq"].extend(f.astype(int).tolist())
            out_rows["norm"].extend(n.astype(int).tolist())
            out_rows["positions"].extend([s.tolist() for s in splits])
        yield pd.DataFrame(out_rows)


def _wildcard_to_regex(pattern: str) -> str:
    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(_re.escape(ch))
    return "".join(parts)


@dataclass
class _Ctx:
    """Per-search context: resolved (field, term) -> (df, ttf)."""

    term_stats: dict[tuple[str, str], tuple[int, int]]


class IndexSearcher:
    #: only engage block-max pruning above this df — below it, the extra
    #: scheduler round-trips (phase-1 bound job + theta collect) cost more
    #: than decoding every block; at 100 TB scale hot terms clear this easily
    PRUNE_MIN_DF = 1 << 20

    def __init__(self, index: InvertedIndex, similarity: BM25Similarity | None = None):
        self.index = index
        self.sim = similarity or BM25Similarity()
        self._stats_memo: dict[tuple[str, str], tuple[int, int]] = {}
        self._avgdl: dict[str, np.float32] = {}
        self._cache: dict[str, np.ndarray] = {}
        self._cache_col: dict[str, Column] = {}
        for fname, fs in index.fieldstats.items():
            if fs.doc_count > 0:
                avgdl = self.sim.avgdl(fs.sum_total_term_freq, fs.doc_count)
            else:
                avgdl = F32(1.0)
            cache = self.sim.norm_inv_cache(avgdl)
            self._avgdl[fname] = avgdl
            self._cache[fname] = cache
            self._cache_col[fname] = F.lit([float(x) for x in cache]).cast(
                "array<float>"
            )

    # ------------------------------------------------------------------ public

    def search(
        self,
        query: Q.Query,
        k: int = 10,
        after: tuple[float, int] | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """Top-k (doc_id, score), score desc / doc_id asc, searchAfter anchor."""
        # pruning is unsafe with deletes: a deleted doc could set the
        # phase-1 bound and prune blocks holding live competitive docs
        if (
            prune
            and after is None
            and self.index.deletes is None
            and isinstance(query, Q.TermQuery)
        ):
            scored = self._term_topk_pruned(query, k)
        else:
            scored = self.scored(query)
        if after is not None:
            s, d = F32(after[0]), int(after[1])
            a = F.lit(float(s)).cast("float")
            scored = scored.filter(
                (F.col("score") < a)
                | ((F.col("score") == a) & (F.col("doc_id") > F.lit(d)))
            )
        return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)

    def optimize_for_serving(self, partitions: int | None = None) -> None:
        """Re-layout the index for query serving: coalesce the postings
        cache to ~core-count partitions (every query scans the cache, so
        hundreds of build-time shuffle partitions mean hundreds of tasks
        per search) and preload the term dictionary stats."""
        spark = self.index.docs.sparkSession
        p = partitions or spark.sparkContext.defaultParallelism
        old = self.index.postings
        compact = old.coalesce(p).persist()
        compact.count()
        self.index.postings = compact
        try:
            old.unpersist()
        except Exception:
            pass
        self.preload_stats()

    def preload_stats(self, max_terms: int = 1 << 20) -> bool:
        """Pull the whole term dictionary's (df, ttf) into the driver memo
        when it fits — per-query stat resolution then costs zero jobs (the
        term-dictionary-in-RAM position Lucene's FST occupies). Returns
        False (and loads nothing) when the vocabulary exceeds max_terms."""
        n = self.index.termstats.count()
        if n > max_terms:
            return False
        for r in self.index.termstats.collect():
            self._stats_memo[(r["field"], r["term"])] = (int(r["df"]), int(r["ttf"]))
        self._stats_all_loaded = True
        return True

    def _live(self, df: DataFrame) -> DataFrame:
        """Live-docs filter (Lucene90LiveDocsFormat analog): anti-join the
        deletes table; no-op when the index carries no deletes."""
        if self.index.deletes is None:
            return df
        return df.join(F.broadcast(self.index.deletes), "doc_id", "left_anti")

    def scored(self, query: Q.Query) -> DataFrame:
        """(doc_id, score:float), one row per matching doc, unordered."""
        ctx = self._resolve_stats(query)
        return self._live(self._scored(query, F32(1.0), ctx))

    def matches(self, query: Q.Query) -> DataFrame:
        """(doc_id) match set — ScoreMode.COMPLETE_NO_SCORES context."""
        return self._live(self._matches(query, self._resolve_stats(query)))

    def count(self, query: Q.Query) -> int:
        """IndexSearcher.count: single terms answered from stats alone
        (``search/Weight.java:198`` count pushdown) — only when no deletes
        are present (Weight.count returns -1 for leaves with deletions)."""
        if self.index.deletes is None:
            if isinstance(query, Q.TermQuery):
                key = (query.field, query.term)
                df, _ = self._resolve_stats(query).term_stats.get(key, (0, 0))
                return df
            if isinstance(query, Q.MatchAllDocsQuery):
                return self.index.fieldstats[self.index.config.field_name].max_doc
        return self.matches(query).count()

    # ------------------------------------------------------- stats resolution

    def _collect_terms(self, q: Q.Query, out: set[tuple[str, str]]) -> None:
        if isinstance(q, Q.TermQuery):
            out.add((q.field, q.term))
        elif isinstance(q, (Q.SynonymQuery, Q.BlendedTermQuery)):
            out.update((q.field, t) for t in q.terms)
        elif isinstance(q, Q.PhraseQuery):
            out.update((q.field, t) for t in q.terms)
        elif isinstance(q, Q.MultiPhraseQuery):
            out.update((q.field, t) for s in q.slots for t in s)
        elif isinstance(q, Q.BooleanQuery):
            for c in q.clauses:
                self._collect_terms(c.query, out)
        elif isinstance(q, Q.DisjunctionMaxQuery):
            for sub in q.queries:
                self._collect_terms(sub, out)
        elif isinstance(q, (Q.ConstantScoreQuery, Q.BoostQuery)):
            self._collect_terms(q.query, out)

    def _resolve_stats(self, q: Q.Query) -> _Ctx:
        wanted: set[tuple[str, str]] = set()
        self._collect_terms(q, wanted)
        missing = [k for k in wanted if k not in self._stats_memo]
        if missing and getattr(self, "_stats_all_loaded", False):
            for k in missing:  # fully-loaded dictionary: absent == df 0
                self._stats_memo[k] = (0, 0)
            missing = []
        if missing:
            terms = [t for (_, t) in missing]
            rows = self.index.termstats.filter(F.col("term").isin(terms)).collect()
            for r in rows:
                self._stats_memo[(r["field"], r["term"])] = (
                    int(r["df"]),
                    int(r["ttf"]),
                )
            for k in missing:  # absent terms: df=0 (no repeat lookups)
                self._stats_memo.setdefault(k, (0, 0))
        return _Ctx({k: self._stats_memo[k] for k in wanted})

    # ------------------------------------------------------------- decoding

    def _blocks(self, field: str, term_pred: Column) -> DataFrame:
        return self.index.postings.filter(
            (F.col("field") == field) & term_pred
        )

    def _decoded(
        self, field: str, term_pred: Column, with_positions: bool = False
    ) -> DataFrame:
        blocks = self._blocks(field, term_pred)
        if with_positions:
            return blocks.mapInPandas(
                _decode_blocks_with_positions, schema=_DECODE_POS_SCHEMA
            )
        cols = [
            "term",
            "first_doc",
            "doc_gaps",
            "freqs",
            "norms",
        ]
        return blocks.select(cols).mapInPandas(_decode_blocks, schema=_DECODE_SCHEMA)

    # -------------------------------------------------------------- scoring

    def _score_col(self, field: str, freq_col: Column, norm_col: Column, weight) -> Column:
        """weight - weight/(1 + freq*invNorm), all FloatType (codegen-side)."""
        inv = F.element_at(self._cache_col[field], norm_col.cast("int") + F.lit(1))
        w = F.lit(float(F32(weight))).cast("float")
        one = F.lit(1.0).cast("float")
        denom = one + freq_col.cast("float") * inv  # float +,* stay FloatType
        # Spark's Divide promotes float->double; rounding the single quotient
        # back to float equals native float32 division (double has >2x the
        # precision), so the op-order contract of BM25Similarity holds.
        quotient = (w / denom).cast("float")
        return (w - quotient).cast("float")

    def _idf(self, field: str, term: str, ctx: _Ctx) -> np.float32:
        fs = self.index.fieldstats[field]
        df, _ = ctx.term_stats.get((field, term), (0, 0))
        return self.sim.idf(df, fs.doc_count)

    def _const_scored(self, match_df: DataFrame, boost: np.float32) -> DataFrame:
        return match_df.select(
            "doc_id", F.lit(float(boost)).cast("float").alias("score")
        )

    def _scored(self, q: Q.Query, boost: np.float32, ctx: _Ctx) -> DataFrame:
        docs = self.index.docs
        if isinstance(q, Q.TermQuery):
            w = self.sim.weight(boost * F32(q.boost), self._idf(q.field, q.term, ctx))
            d = self._decoded(q.field, F.col("term") == q.term)
            return d.select(
                "doc_id",
                self._score_col(q.field, F.col("freq"), F.col("norm"), w).alias(
                    "score"
                ),
            )
        if isinstance(q, Q.SynonymQuery):
            # pseudo-term: df = max over terms, freqs summed, ONE bm25 eval
            dfs = [ctx.term_stats.get((q.field, t), (0, 0))[0] for t in q.terms]
            fs = self.index.fieldstats[q.field]
            w = self.sim.weight(
                boost * F32(q.boost), self.sim.idf(max(dfs, default=0), fs.doc_count)
            )
            d = self._decoded(q.field, F.col("term").isin(list(q.terms)))
            agg = d.groupBy("doc_id").agg(
                F.sum("freq").alias("freq"), F.min("norm").alias("norm")
            )
            return agg.select(
                "doc_id",
                self._score_col(q.field, F.col("freq"), F.col("norm"), w).alias(
                    "score"
                ),
            )
        if isinstance(q, Q.BlendedTermQuery):
            # blended statistics (BlendedTermQuery.java:47): every term is
            # weighted as if its df were the blend's max df, then the
            # per-term scores combine dismax-style
            dfs = [ctx.term_stats.get((q.field, t), (0, 0))[0] for t in q.terms]
            blended = max(dfs, default=0)
            fs = self.index.fieldstats[q.field]
            w = self.sim.weight(
                boost * F32(q.boost), self.sim.idf(blended, fs.doc_count)
            )
            parts = []
            for t in dict.fromkeys(q.terms):
                d = self._decoded(q.field, F.col("term") == t)
                parts.append(
                    d.select(
                        "doc_id",
                        self._score_col(
                            q.field, F.col("freq"), F.col("norm"), w
                        ).alias("score"),
                    )
                )
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            tie = float(F32(q.tie_breaker))
            agg = u.groupBy("doc_id").agg(
                F.max("score").alias("mx"),
                F.sum(F.col("score").cast("double")).alias("sm"),
            )
            expr = (
                F.col("mx").cast("double")
                + F.lit(tie) * (F.col("sm") - F.col("mx").cast("double"))
            ).cast("float")
            return agg.select("doc_id", expr.alias("score"))
        if isinstance(q, (Q.PhraseQuery, Q.MultiPhraseQuery)):
            return self._scored_phrase(q, boost, ctx)
        if isinstance(q, Q.BooleanQuery):
            return self._scored_boolean(q, boost, ctx)
        if isinstance(q, Q.DisjunctionMaxQuery):
            return self._scored_dismax(q, boost, ctx)
        if isinstance(q, Q.BoostQuery):
            return self._scored(q.query, F32(boost * F32(q.boost)), ctx)
        if isinstance(q, Q.ConstantScoreQuery):
            return self._const_scored(
                self._matches(q.query, ctx), F32(boost * F32(q.boost))
            )
        # constant-score leaves
        if isinstance(
            q,
            (
                Q.PrefixQuery,
                Q.WildcardQuery,
                Q.RegexpQuery,
                Q.FuzzyQuery,
                Q.TermRangeQuery,
                Q.TermInSetQuery,
                Q.MatchAllDocsQuery,
                Q.MatchNoDocsQuery,
                Q.PointRangeQuery,
                Q.FieldExistsQuery,
            ),
        ):
            qboost = getattr(q, "boost", 1.0)
            return self._const_scored(self._matches(q, ctx), F32(boost * F32(qboost)))
        raise NotImplementedError(f"unsupported query {type(q).__name__}")

    def _scored_boolean(self, q: Q.BooleanQuery, boost: np.float32, ctx: _Ctx) -> DataFrame:
        must = [c.query for c in q.clauses if c.occur is Q.Occur.MUST]
        should = [c.query for c in q.clauses if c.occur is Q.Occur.SHOULD]
        filt = [c.query for c in q.clauses if c.occur is Q.Occur.FILTER]
        neg = [c.query for c in q.clauses if c.occur is Q.Occur.MUST_NOT]
        n_required = len(must) + len(filt)
        msm = q.minimum_should_match
        if n_required == 0:
            msm = max(msm, 1)  # pure disjunction needs >=1 SHOULD
        if not must and not should and not filt:
            # pure-negative -> MatchNoDocs (BooleanQuery.java:269 rewrite)
            return self._const_scored(
                self.index.docs.select("doc_id").limit(0), F32(0.0)
            )
        parts: list[DataFrame] = []
        for sub in must:
            parts.append(
                self._scored(sub, boost, ctx).select(
                    "doc_id", "score", F.lit(1).alias("req"), F.lit(0).alias("sh")
                )
            )
        for sub in filt:
            parts.append(
                self._matches(sub, ctx).select(
                    "doc_id",
                    F.lit(0.0).cast("float").alias("score"),
                    F.lit(1).alias("req"),
                    F.lit(0).alias("sh"),
                )
            )
        for sub in should:
            parts.append(
                self._scored(sub, boost, ctx).select(
                    "doc_id", "score", F.lit(0).alias("req"), F.lit(1).alias("sh")
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        agg = u.groupBy("doc_id").agg(
            F.sum(F.col("score").cast("double")).alias("s"),
            F.sum("req").alias("nreq"),
            F.sum("sh").alias("nsh"),
        )
        out = agg.filter(
            (F.col("nreq") == F.lit(n_required)) & (F.col("nsh") >= F.lit(msm))
        ).select("doc_id", F.col("s").cast("float").alias("score"))
        for sub in neg:
            out = out.join(self._matches(sub, ctx), "doc_id", "left_anti")
        return out

    def _scored_dismax(
        self, q: Q.DisjunctionMaxQuery, boost: np.float32, ctx: _Ctx
    ) -> DataFrame:
        parts = [self._scored(sub, boost, ctx) for sub in q.queries]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        tie = float(F32(q.tie_breaker))
        agg = u.groupBy("doc_id").agg(
            F.max(F.col("score")).alias("mx"),
            F.sum(F.col("score").cast("double")).alias("sm"),
        )
        # max + tie * (sum - max), accumulated in double, cast float
        expr = (
            F.col("mx").cast("double")
            + F.lit(tie) * (F.col("sm") - F.col("mx").cast("double"))
        ).cast("float")
        return agg.select("doc_id", expr.alias("score"))

    def _scored_phrase(
        self, q: Q.PhraseQuery | Q.MultiPhraseQuery, boost: np.float32, ctx: _Ctx
    ) -> DataFrame:
        """Exact, sloppy and multi-slot phrases over decoded position lists.

        - exact (slop=0): slot i must match at start+i (ExactPhraseMatcher.java:135-170)
        - sloppy: ordered greedy chain — from each start position of slot 0,
          each later slot binds its smallest position q > prev with
          displacement q - start - i <= slop (deterministic simplification of
          SloppyPhraseMatcher.java:52's edit-distance semantics; same rule is
          mirrored by the SQL oracle)
        - slots (MultiPhraseQuery.java:54): any alternative matches a slot;
          weight sums idf over every alternative (PhraseWeight allTermStats)
        """
        if isinstance(q, Q.MultiPhraseQuery):
            slots = [tuple(s) for s in q.slots]
        else:
            slots = [(t,) for t in q.terms]
        slop = q.slop
        all_terms = [t for s in slots for t in s]
        idf_sum = 0.0  # double accumulation of float32 idfs (Lucene op order)
        for t in all_terms:
            idf_sum += float(self._idf(q.field, t, ctx))
        w = self.sim.weight(boost * F32(q.boost), F32(idf_sum))
        k = len(slots)

        if slop == 0:
            # JOIN-BASED exact phrase: slot i's occurrence at position p is a
            # candidate start at p - i, so a phrase match = one (doc_id, start)
            # key present in EVERY slot — a k-way equi-join, fully JVM-side
            # (whole-stage codegen; no per-doc Python). This is the
            # sort-merge analog of the df-ordered position leapfrog in
            # ExactPhraseMatcher.java:135-170.
            parts = []
            for i, slot in enumerate(slots):
                d_i = self._decoded(
                    q.field, F.col("term").isin(list(slot)), with_positions=True
                )
                cols = ["doc_id", F.explode("positions").alias("p")]
                if i == 0:
                    cols.insert(1, F.col("norm"))
                e = d_i.select(*cols).withColumn("start", F.col("p") - F.lit(i))
                if len(slot) > 1:
                    e = e.dropDuplicates(["doc_id", "start"])
                parts.append(e.drop("p"))
            j = parts[0]
            for e in parts[1:]:
                j = j.join(e, ["doc_id", "start"])
            matched = j.groupBy("doc_id").agg(
                F.count("*").cast("int").alias("freq"),
                F.first("norm").alias("norm"),
            )
            return matched.select(
                "doc_id",
                self._score_col(q.field, F.col("freq"), F.col("norm"), w).alias(
                    "score"
                ),
            )

        uniq = list(dict.fromkeys(all_terms))
        d = self._decoded(q.field, F.col("term").isin(uniq), with_positions=True)

        out_schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("freq", IntegerType()),
                StructField("norm", IntegerType()),
            ]
        )
        empty = pd.DataFrame({"doc_id": [], "freq": [], "norm": []}).astype(
            {"doc_id": "int64", "freq": "int32", "norm": "int32"}
        )

        def match_phrase(pdf: pd.DataFrame) -> pd.DataFrame:
            by_term = {r.term: set(r.positions) for r in pdf.itertuples(index=False)}
            pos = [
                set().union(*[by_term.get(t, set()) for t in slot]) for slot in slots
            ]
            if any(not s for s in pos):
                return empty
            count = 0
            for p in sorted(pos[0]):
                if slop == 0:
                    if all((p + i) in pos[i] for i in range(1, k)):
                        count += 1
                else:
                    prev, ok = p, True
                    for i in range(1, k):
                        cand = [
                            x for x in pos[i] if x > prev and x - p - i <= slop
                        ]
                        if not cand:
                            ok = False
                            break
                        prev = min(cand)
                    if ok:
                        count += 1
            if count == 0:
                return empty
            return pd.DataFrame(
                {
                    "doc_id": [int(pdf["doc_id"].iloc[0])],
                    "freq": np.array([count], dtype=np.int32),
                    "norm": np.array([int(pdf["norm"].iloc[0])], dtype=np.int32),
                }
            )

        matched = d.groupBy("doc_id").applyInPandas(match_phrase, schema=out_schema)
        return matched.select(
            "doc_id",
            self._score_col(q.field, F.col("freq"), F.col("norm"), w).alias("score"),
        )

    # -------------------------------------------------------------- matching

    def _matches(self, q: Q.Query, ctx: _Ctx) -> DataFrame:
        docs = self.index.docs
        field_default = self.index.config.field_name
        if isinstance(q, Q.TermQuery):
            return self._decoded(q.field, F.col("term") == q.term).select("doc_id")
        if isinstance(q, Q.TermInSetQuery):
            return (
                self._decoded(q.field, F.col("term").isin(list(q.terms)))
                .select("doc_id")
                .distinct()
            )
        if isinstance(q, Q.PrefixQuery):
            return (
                self._decoded(q.field, F.col("term").startswith(q.prefix))
                .select("doc_id")
                .distinct()
            )
        if isinstance(q, Q.WildcardQuery):
            rx = "^" + _wildcard_to_regex(q.pattern) + "$"
            return (
                self._decoded(q.field, F.col("term").rlike(rx))
                .select("doc_id")
                .distinct()
            )
        if isinstance(q, Q.RegexpQuery):
            rx = "^" + q.regex + "$"  # Lucene regexps are anchored
            return (
                self._decoded(q.field, F.col("term").rlike(rx))
                .select("doc_id")
                .distinct()
            )
        if isinstance(q, Q.FuzzyQuery):
            pred = F.levenshtein(F.col("term"), F.lit(q.term)) <= q.max_edits
            if q.prefix_length > 0:
                pred = pred & F.col("term").startswith(q.term[: q.prefix_length])
            return self._decoded(q.field, pred).select("doc_id").distinct()
        if isinstance(q, Q.TermRangeQuery):
            pred = F.lit(True)
            if q.lower is not None:
                pred = pred & (
                    F.col("term") >= q.lower
                    if q.include_lower
                    else F.col("term") > q.lower
                )
            if q.upper is not None:
                pred = pred & (
                    F.col("term") <= q.upper
                    if q.include_upper
                    else F.col("term") < q.upper
                )
            return self._decoded(q.field, pred).select("doc_id").distinct()
        if isinstance(q, Q.MatchAllDocsQuery):
            return docs.select("doc_id")
        if isinstance(q, Q.MatchNoDocsQuery):
            return docs.select("doc_id").limit(0)
        if isinstance(q, Q.PointRangeQuery):
            c = F.col(q.column)
            pred = F.lit(True)
            if q.lower is not None:
                pred = pred & (c >= q.lower if q.include_lower else c > q.lower)
            if q.upper is not None:
                pred = pred & (c <= q.upper if q.include_upper else c < q.upper)
            return docs.filter(pred).select("doc_id")
        if isinstance(q, Q.FieldExistsQuery):
            return docs.filter(F.col(q.column).isNotNull()).select("doc_id")
        if isinstance(q, (Q.ConstantScoreQuery, Q.BoostQuery)):
            return self._matches(q.query, ctx)
        # scored composites: reuse scored plan, drop scores
        return self._scored(q, F32(1.0), ctx).select("doc_id")

    # ------------------------------------------------- block-max pruned top-k

    def _term_topk_pruned(self, q: Q.TermQuery, k: int) -> DataFrame:
        ctx = self._resolve_stats(q)
        field = q.field
        fs = self.index.fieldstats[field]
        df, _ = ctx.term_stats.get((field, q.term), (0, 0))
        w = self.sim.weight(F32(q.boost), self.sim.idf(df, fs.doc_count))
        blocks = self._blocks(field, F.col("term") == q.term)
        # small postings: decode everything (pruning wouldn't pay)
        if df <= max(4 * k, self.PRUNE_MIN_DF):
            return self._scored(q, F32(1.0), ctx)
        ub = self._score_col(field, F.col("max_freq"), F.col("min_norm"), w)
        blocks = blocks.withColumn("_ub", ub)
        n_phase1 = max(1, math.ceil((4 * k) / forutil.BLOCK_SIZE))
        phase1 = blocks.orderBy(F.col("_ub").desc()).limit(n_phase1)
        p1_keys = [
            (r["seg_id"], r["block_ord"]) for r in phase1.select("seg_id", "block_ord").collect()
        ]
        decode_cols = ["term", "first_doc", "doc_gaps", "freqs", "norms"]
        scored1 = (
            phase1.select(decode_cols)
            .mapInPandas(_decode_blocks, schema=_DECODE_SCHEMA)
            .select(
                "doc_id",
                self._score_col(field, F.col("freq"), F.col("norm"), w).alias("score"),
            )
        )
        top1 = scored1.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
        rows = top1.collect()
        if len(rows) < k:
            return self._scored(q, F32(1.0), ctx)  # not enough hits to prune safely
        theta = rows[-1]["score"]
        key = F.concat_ws("#", F.col("seg_id"), F.col("block_ord"))
        p1_set = [f"{s}#{b}" for s, b in p1_keys]
        remaining = blocks.filter(
            (F.col("_ub") >= F.lit(float(theta)).cast("float")) & ~key.isin(p1_set)
        )
        scored2 = (
            remaining.select(decode_cols)
            .mapInPandas(_decode_blocks, schema=_DECODE_SCHEMA)
            .select(
                "doc_id",
                self._score_col(field, F.col("freq"), F.col("norm"), w).alias("score"),
            )
        )
        spark = self.index.docs.sparkSession
        top1_df = spark.createDataFrame(
            [(int(r["doc_id"]), float(r["score"])) for r in rows],
            schema="doc_id long, score double",
        ).select("doc_id", F.col("score").cast("float").alias("score"))
        return top1_df.unionByName(scored2)
