"""Independent pure-Python BM25 oracle (structured like Lucene, no Spark).

Mirrors BM25Similarity.java:138-141 (idf), :143-146 (avgdl), :217-222 (norm
inverse cache), :257-274 (score op order) and TopScoreDocCollector.java:26
(score desc / doc_id asc tie-break).  Deliberately written with plain dicts
and loops so it shares no code path with the engine under test (only the
tokenizer and byte4 quantizer, which have their own golden tests).
"""

from __future__ import annotations

import math

import numpy as np

from lucene_spark.analysis.tokenizer import StandardAnalyzer
from lucene_spark.util.smallfloat import byte4_to_int, int_to_byte4

f32 = np.float32


class OracleIndex:
    def __init__(self, docs: dict[int, str], analyzer: StandardAnalyzer | None = None):
        self.analyzer = analyzer or StandardAnalyzer()
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.norms: dict[int, int] = {}
        self.lengths: dict[int, int] = {}
        for doc_id, text in docs.items():
            tokens = self.analyzer.tokens(text)
            self.lengths[doc_id] = len(tokens)
            self.norms[doc_id] = int_to_byte4(len(tokens))
            for t in tokens:
                self.postings.setdefault(t.term, {}).setdefault(doc_id, []).append(
                    t.position
                )
        self.max_doc = len(docs)
        self.doc_count = sum(1 for n in self.lengths.values() if n > 0)
        self.sum_ttf = sum(self.lengths.values())
        self.sum_df = sum(len(p) for p in self.postings.values())

    # ---- stats
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> np.float32:
        df = self.df(term)
        return f32(math.log(1.0 + (self.doc_count - df + 0.5) / (df + 0.5)))

    def avgdl(self) -> np.float32:
        return f32(self.sum_ttf / float(self.doc_count))

    def norm_inv(self, norm_byte: int, k1=1.2, b=0.75) -> np.float32:
        dl = f32(byte4_to_int(norm_byte))
        k1, b = f32(k1), f32(b)
        return f32(f32(1.0) / (k1 * ((f32(1.0) - b) + b * dl / self.avgdl())))

    def score_one(self, weight: np.float32, freq: int, norm_byte: int) -> np.float32:
        fr = f32(freq)
        inv = self.norm_inv(norm_byte)
        return f32(weight - weight / (f32(1.0) + fr * inv))

    # ---- queries
    def term_scores(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        weight = f32(f32(boost) * self.idf(term))
        out = {}
        for doc_id, positions in self.postings.get(term, {}).items():
            out[doc_id] = self.score_one(weight, len(positions), self.norms[doc_id])
        return out

    def or_scores(self, terms: list[str]) -> dict[int, np.float32]:
        acc: dict[int, float] = {}
        for t in sorted(set(terms)):
            for d, s in self.term_scores(t).items():
                acc[d] = acc.get(d, 0.0) + float(s)
        return {d: f32(v) for d, v in acc.items()}

    def and_scores(self, terms: list[str]) -> dict[int, np.float32]:
        uniq = sorted(set(terms))
        docs = None
        for t in uniq:
            s = set(self.postings.get(t, {}))
            docs = s if docs is None else docs & s
        docs = docs or set()
        return {d: s for d, s in self.or_scores(uniq).items() if d in docs}

    def phrase_scores(self, terms: list[str], boost=1.0) -> dict[int, np.float32]:
        idf_sum = 0.0
        for t in terms:
            idf_sum += float(self.idf(t))
        weight = f32(f32(boost) * f32(idf_sum))
        cand = None
        for t in set(terms):
            s = set(self.postings.get(t, {}))
            cand = s if cand is None else cand & s
        out = {}
        for d in cand or set():
            pos = [set(self.postings[t][d]) for t in terms]
            freq = sum(
                1 for p in pos[0] if all((p + i) in pos[i] for i in range(1, len(terms)))
            )
            if freq:
                out[d] = self.score_one(weight, freq, self.norms[d])
        return out

    def sloppy_scores(
        self, terms: list[str], slop: int, boost=1.0
    ) -> dict[int, np.float32]:
        """Sloppy phrase via the faithful SloppyPhraseMatcher port
        (search/sloppy.py sloppy_freq — fidelity pinned by
        tests/test_sloppy.py), scored with the float32 phrase weight."""
        from lucene_spark.search.sloppy import sloppy_freq

        idf_sum = 0.0
        for t in terms:
            idf_sum += float(self.idf(t))
        weight = f32(f32(boost) * f32(idf_sum))
        cand = None
        for t in set(terms):
            s = set(self.postings.get(t, {}))
            cand = s if cand is None else cand & s
        out = {}
        for d in cand or set():
            slot_pos = [sorted(self.postings[t][d]) for t in terms]
            freq = sloppy_freq(slot_pos, slop, terms=list(terms))
            if freq > 0:
                inv = self.norm_inv(self.norms[d])
                out[d] = f32(weight - weight / (f32(1.0) + f32(freq) * inv))
        return out

    @staticmethod
    def top_k(scores: dict[int, np.float32], k: int) -> list[tuple[int, float]]:
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]
