"""Score explanations (Explanation / CheckHits parity device).

``search/Explanation.java`` + the CheckHits contract
(``test-framework/.../CheckHits.java``: every hit's explanation recomputes
exactly to its score) — the per-doc decomposition of the BM25 formula with
the same float32 op order as the scorer, so ``explanation["score"]`` must
equal the search score bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from lucene_spark.search import query as Q
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.util.smallfloat import byte4_to_int

__all__ = ["explain"]

F32 = np.float32


def explain(searcher: IndexSearcher, query: Q.Query, doc_id: int) -> dict:
    """Explanation tree for one doc. Supports TermQuery and BooleanQuery
    over terms (sum-of-clauses, the DisjunctionSumScorer contract)."""
    if isinstance(query, Q.TermQuery):
        return _explain_term(searcher, query, doc_id)
    if isinstance(query, Q.BooleanQuery):
        details = []
        total = 0.0  # double accumulation, cast at the end (BooleanQuery sum)
        positive = [c for c in query.clauses if c.occur is not Q.Occur.MUST_NOT]
        for c in positive:
            sub = explain(searcher, c.query, doc_id)
            if sub["matched"] and c.occur is not Q.Occur.FILTER:
                total += float(sub["score"])
            details.append(sub)
        matched = all(
            d["matched"]
            for d, c in zip(details, positive)
            if c.occur in (Q.Occur.MUST, Q.Occur.FILTER)
        ) and any(d["matched"] for d in details)
        # a matching prohibited clause excludes the doc (ReqExclScorer):
        # matched=False, score 0 — CheckHits parity with the anti-join plan
        for c in query.clauses:
            if c.occur is not Q.Occur.MUST_NOT:
                continue
            sub = explain(searcher, c.query, doc_id)
            details.append(
                {**sub, "description": f"MUST_NOT: {sub['description']}"}
            )
            if sub["matched"]:
                matched = False
        return {
            "matched": matched,
            "score": F32(total) if matched else F32(0.0),
            "description": "sum of:",
            "details": details,
        }
    raise NotImplementedError(f"explain for {type(query).__name__}")


def _explain_term(searcher: IndexSearcher, q: Q.TermQuery, doc_id: int) -> dict:
    idx = searcher.index
    fs = idx.fieldstats[q.field]
    ctx = searcher._resolve_stats(q)
    df, ttf = ctx.term_stats.get((q.field, q.term), (0, 0))
    row = (
        searcher._decoded(q.field, F.col("term") == q.term)
        .filter(F.col("doc_id") == doc_id)
        .collect()
    )
    idf = searcher.sim.idf(df, fs.doc_count)
    weight = searcher._term_weight(q.field, q.term, F32(q.boost), ctx)
    if not row:
        return {
            "matched": False,
            "score": F32(0.0),
            "description": f"no matching term '{q.term}' in doc {doc_id}",
            "term": q.term,
            "df": df,
        }
    freq, norm = int(row[0]["freq"]), int(row[0]["norm"])
    inv = searcher._cache[q.field][norm]
    # the searcher's similarity supplies the kernel (BM25 / Classic / Boolean)
    score = searcher.sim.score(
        np.array([freq], dtype=np.float32), np.array([inv]), weight
    )[0]
    return {
        "matched": True,
        "score": score,
        "description": (
            f"weight({q.field}:{q.term} in {doc_id}) "
            f"[{type(searcher.sim).__name__} kernel over (freq, norm)]"
        ),
        "term": q.term,
        "df": df,
        "ttf": ttf,
        "doc_count": fs.doc_count,
        "idf": float(idf),
        "boost": q.boost,
        # SimilarityBase-family weights are full-stats objects, not scalars
        "weight": float(weight)
        if isinstance(weight, (int, float, np.floating))
        else repr(weight),
        "freq": freq,
        "norm_byte": norm,
        "decoded_doc_len": byte4_to_int(norm),
        "avgdl": float(searcher._avgdl[q.field]),
        "inv_norm": float(inv),
    }
