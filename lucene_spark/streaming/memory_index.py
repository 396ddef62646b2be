"""MemoryIndex: a one-document, driver-local index queryable by the Query AST.

Re-expression of ``memory/MemoryIndex.java:125`` — the reference's
single-doc RAM index whose primary consumer is the Monitor/percolator
(score ONE document against standing queries without touching a real
index). Here it is a plain-Python structure (dicts of term -> positions),
no Spark: it runs inside Arrow batches of ``streaming/monitor.py`` or
standalone on the driver.

Scoring fidelity: BM25 with the index's own statistics exactly as the
reference computes them on a 1-doc index — ``docCount = maxDoc = 1``,
``df = 1`` for every present term, ``avgdl = field length`` — using the
shared float32 ``BM25Similarity`` kernel and byte4 length quantization, so
``MemoryIndex(doc).search(q)`` equals the engine's score for that doc in a
1-doc corpus (pinned by ``tests/test_memory_index.py``).

``search(query) -> float`` returns 0.0 on no match, like
``MemoryIndex.java search()``'s float contract.
"""

from __future__ import annotations

import re

import numpy as np

from lucene_spark.search import query as Q
from lucene_spark.search.similarity import BM25Similarity
from lucene_spark.search.sloppy import sloppy_freq
from lucene_spark.util.smallfloat import byte4_to_int, int_to_byte4

__all__ = ["MemoryIndex"]

F32 = np.float32


class MemoryIndex:
    def __init__(self, analyzer=None, similarity: BM25Similarity | None = None):
        from lucene_spark.analysis.tokenizer import StandardAnalyzer

        self.analyzer = analyzer or StandardAnalyzer()
        self.sim = similarity or BM25Similarity()
        #: field -> term -> sorted positions
        self.fields: dict[str, dict[str, list[int]]] = {}
        #: field -> emitted token count (norm input)
        self.lengths: dict[str, int] = {}

    def add_field(self, field: str, text: str) -> "MemoryIndex":
        post = self.fields.setdefault(field, {})
        terms, pos, n = self.analyzer.term_position_arrays(text)
        self.lengths[field] = self.lengths.get(field, 0) + int(n)
        for t, p in zip(terms, pos):
            post.setdefault(t, []).append(int(p))
        return self

    # ---- stats (docCount = maxDoc = 1; df = 1 for present terms)
    def _inv_norm(self, field: str) -> np.float32:
        length = F32(byte4_to_int(int_to_byte4(self.lengths.get(field, 0))))
        avgdl = F32(max(self.lengths.get(field, 0), 1))
        k1, b = F32(self.sim.k1), F32(self.sim.b)
        return F32(F32(1.0) / (k1 * ((F32(1.0) - b) + b * length / avgdl)))

    def _idf(self) -> np.float32:
        # df = docCount = 1: ln(1 + 0.5/1.5)
        return F32(np.log(1.0 + 0.5 / 1.5))

    def _bm25(self, freq: float, boost: np.float32, field: str) -> np.float32:
        w = F32(boost * self._idf())
        return F32(w - w / (F32(1.0) + F32(freq) * self._inv_norm(field)))

    # ---- search
    def search(self, q: Q.Query, boost: float = 1.0) -> float:
        """Float score of THIS doc for `q`; 0.0 when it does not match."""
        return float(self._score(q, F32(boost)))

    def _positions(self, field: str, term: str) -> list[int]:
        return self.fields.get(field, {}).get(term, [])

    def _score(self, q: Q.Query, boost: np.float32) -> np.float32:
        Z = F32(0.0)
        if isinstance(q, Q.TermQuery):
            p = self._positions(q.field, q.term)
            return self._bm25(len(p), F32(boost * F32(q.boost)), q.field) if p else Z
        if isinstance(q, Q.SynonymQuery):
            freq = sum(len(self._positions(q.field, t)) for t in q.terms)
            return self._bm25(freq, F32(boost * F32(q.boost)), q.field) if freq else Z
        if isinstance(q, (Q.PhraseQuery, Q.MultiPhraseQuery)):
            return self._phrase(q, boost)
        if isinstance(q, Q.BooleanQuery):
            return self._boolean(q, boost)
        if isinstance(q, Q.DisjunctionMaxQuery):
            scores = [self._score(s, boost) for s in q.queries]
            hit = [s for s in scores if s > 0]
            if not hit:
                return Z
            mx = max(hit)
            tie = F32(q.tie_breaker)
            # subtract ONE max occurrence, not every clause tying it —
            # DisjunctionMaxScorer keeps tied clauses in the tie-break sum
            return F32(mx + tie * F32(sum(hit) - mx))
        if isinstance(q, Q.BoostQuery):
            return self._score(q.query, F32(boost * F32(q.boost)))
        if isinstance(q, Q.ConstantScoreQuery):
            return (
                F32(boost * F32(q.boost))
                if self._score(q.query, F32(1.0)) > 0
                else Z
            )
        if isinstance(q, Q.MatchAllDocsQuery):
            return F32(boost)
        if isinstance(q, Q.MatchNoDocsQuery):
            return Z
        # multi-term dictionary queries: constant score over the doc's terms
        if isinstance(q, (Q.PrefixQuery, Q.WildcardQuery, Q.RegexpQuery,
                          Q.FuzzyQuery, Q.TermInSetQuery, Q.TermRangeQuery)):
            return F32(boost * F32(getattr(q, "boost", 1.0))) if self._dict_match(q) else Z
        raise NotImplementedError(f"MemoryIndex: {type(q).__name__}")

    def _dict_match(self, q) -> bool:
        terms = self.fields.get(q.field, {})
        if isinstance(q, Q.PrefixQuery):
            return any(t.startswith(q.prefix) for t in terms)
        if isinstance(q, Q.WildcardQuery):
            from lucene_spark.search.searcher import _wildcard_to_regex

            rx = re.compile(_wildcard_to_regex(q.pattern) + r"\Z")
            return any(rx.match(t) for t in terms)
        if isinstance(q, Q.RegexpQuery):
            rx = re.compile(q.regex + r"\Z")
            return any(rx.match(t) for t in terms)
        if isinstance(q, Q.TermInSetQuery):
            return any(t in terms for t in q.terms)
        if isinstance(q, Q.TermRangeQuery):
            for t in terms:
                if q.lower is not None and (
                    t < q.lower or (t == q.lower and not q.include_lower)
                ):
                    continue
                if q.upper is not None and (
                    t > q.upper or (t == q.upper and not q.include_upper)
                ):
                    continue
                return True
            return False
        if isinstance(q, Q.FuzzyQuery):

            def lev(a: str, b: str) -> int:
                if abs(len(a) - len(b)) > q.max_edits:
                    return q.max_edits + 1
                prev = list(range(len(b) + 1))
                for i, ca in enumerate(a, 1):
                    cur = [i]
                    for j, cb in enumerate(b, 1):
                        cur.append(
                            min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                        )
                    prev = cur
                return prev[-1]

            pref = q.term[: q.prefix_length]
            return any(
                t.startswith(pref) and lev(t, q.term) <= q.max_edits for t in terms
            )
        return False

    def _phrase(self, q, boost: np.float32) -> np.float32:
        if isinstance(q, Q.MultiPhraseQuery):
            slots = [set() for _ in q.slots]
            for i, alts in enumerate(q.slots):
                for t in alts:
                    slots[i].update(self._positions(q.field, t))
            # df=0 alternatives contribute no idf (MultiPhraseQuery.java:227
            # ts.docFreq() > 0 — mirrored by the engine's phrase weight)
            terms_for_idf = [
                t
                for alts in q.slots
                for t in alts
                if self._positions(q.field, t)
            ]
            slop = q.slop
        else:
            slots = [set(self._positions(q.field, t)) for t in q.terms]
            terms_for_idf = list(q.terms)
            slop = q.slop
        if any(not s for s in slots):
            return F32(0.0)
        idf_sum = F32(0.0)
        for _ in terms_for_idf:
            idf_sum = F32(idf_sum + self._idf())
        w = F32(boost * F32(getattr(q, "boost", 1.0)) * idf_sum)
        if slop == 0:
            freq = sum(
                1
                for p in slots[0]
                if all((p + i) in slots[i] for i in range(1, len(slots)))
            )
        else:
            freq = sloppy_freq([sorted(s) for s in slots], slop)
        if not freq:
            return F32(0.0)
        iv = self._inv_norm(q.field)
        return F32(w - w / (F32(1.0) + F32(freq) * iv))

    def _boolean(self, q: Q.BooleanQuery, boost: np.float32) -> np.float32:
        must = [c.query for c in q.clauses if c.occur is Q.Occur.MUST]
        should = [c.query for c in q.clauses if c.occur is Q.Occur.SHOULD]
        filt = [c.query for c in q.clauses if c.occur is Q.Occur.FILTER]
        nots = [c.query for c in q.clauses if c.occur is Q.Occur.MUST_NOT]
        for m in nots:
            if self._score(m, F32(1.0)) > 0:
                return F32(0.0)
        for m in filt:
            if self._score(m, F32(1.0)) == 0:
                return F32(0.0)
        total = 0.0
        for m in must:
            s = self._score(m, boost)
            if s == 0:
                return F32(0.0)
            total += float(s)
        matched_should = 0
        for m in should:
            s = self._score(m, boost)
            if s > 0:
                matched_should += 1
                total += float(s)
        msm = q.minimum_should_match or (1 if not (must or filt) and should else 0)
        if should and matched_should < msm:
            return F32(0.0)
        if not must and not should and (filt or nots):
            return F32(boost) if (filt or not nots) else F32(0.0)
        return F32(total)
