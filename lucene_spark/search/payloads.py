"""Per-position payloads + PayloadScoreQuery / PayloadFunction analogs.

The reference attaches arbitrary bytes to each posting position
(``analysis/tokenattributes/PayloadAttribute.java``), usually produced by
``analysis/payloads/DelimitedPayloadTokenFilter.java:43`` from annotated
text (``token|payload``), and scores them with
``queries/payloads/PayloadScoreQuery.java:47`` — span matches collect
payload values, a ``PayloadFunction`` (Min/Max/Avg/Sum,
``queries/payloads/MaxPayloadFunction.java`` etc.) folds them per doc, and
the final score is ``spanScore * payloadScore`` (or the payload score
alone when ``includeSpanScore=false``).

Spark-native shape: payloads ride a SIDE TABLE ``(doc_id, term, pos,
payload: double)`` rather than bytes interleaved in the postings blocks —
the same auxiliary-table pattern as vectors (`InvertedIndex.attach_vectors`)
and features, keeping the hot postings layout payload-free (most queries
never touch payloads; the reference pays the same isolation via separate
``.pay`` files, ``codecs/lucene104/Lucene104PostingsFormat.java``). All
builders are single JVM-side ``posexplode`` passes — no Python in the
plan; span matching reuses the phrase position-join shape.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.search import query as Q

__all__ = [
    "token_payload_table",
    "delimited_payload_table",
    "payload_score_topk",
]

_TOKEN_RX = "[a-z0-9_]+"


def token_payload_table(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    payload: "Column | None" = None,
) -> DataFrame:
    """(doc_id, term, pos, payload) from plain text: one JVM-side
    ``posexplode`` over the SQL tokenizer regex. ``payload`` is any Column
    expression over the exploded ``term`` (default: term length — a
    deterministic stand-in annotation); position numbering matches the
    index's 0-based token positions."""
    tok = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_RX}', 0)")
        ).alias("pos", "term"),
    )
    pay = payload if payload is not None else F.length(F.col("term")).cast("double")
    return tok.select("doc_id", "term", "pos", pay.alias("payload"))


def delimited_payload_table(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    delimiter: str = "|",
) -> DataFrame:
    """DelimitedPayloadTokenFilter.java:43: whitespace tokens of the form
    ``term|payload`` split at the LAST delimiter; tokens without a
    delimiter get a null payload (the filter's no-payload case). Float
    payload encoding (FloatEncoder semantics) as a double column."""
    d = delimiter
    tok = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "raw"),
    ).filter(F.col("raw") != "")
    has = F.col("raw").contains(d)
    qd = "\\" + d if d in ".|[](){}^$*+?" else d
    term = F.when(has, F.regexp_extract(F.col("raw"), f"^(.*){qd}[^{qd}]*$", 1)).otherwise(
        F.col("raw")
    )
    pay = F.when(
        has, F.regexp_extract(F.col("raw"), f"{qd}([^{qd}]*)$", 1).cast("double")
    ).otherwise(F.lit(None).cast("double"))
    return tok.select("doc_id", term.alias("term"), "pos", pay.alias("payload"))


def _fold(fn: str, col: Column) -> Column:
    if fn == "max":
        return F.max(col)
    if fn == "min":
        return F.min(col)
    if fn == "sum":
        return F.sum(col.cast("double")).cast("float")
    if fn == "avg":
        return (F.sum(col.cast("double")) / F.count(col)).cast("float")
    raise ValueError(f"unknown payload function {fn!r} (min/max/avg/sum)")


def payload_score_topk(
    searcher,
    field: str,
    terms: tuple,
    payloads: DataFrame,
    fn: str = "max",
    include_span_score: bool = True,
    k: int = 10,
) -> DataFrame:
    """PayloadScoreQuery.java:47 over an exact term/phrase span.

    Span matches come from the payload table itself (k-way position join —
    the SpanNearQuery[slop=0,inOrder] the reference wraps); every payload
    occurrence inside a matched span feeds the PayloadFunction ``fn``;
    docs whose spans carry only null payloads score the fold over an
    empty set and are kept with payload factor 1.0 (the reference's
    no-payload default of each PayloadFunction). Final float32 score =
    BM25 span score * payload factor when ``include_span_score``.

    Returns (doc_id, score, payload_score) top-k by score desc, doc asc.
    """
    slots = [
        payloads.filter(F.col("term") == t).select(
            F.col("doc_id"), F.col("pos").alias(f"p{i}"), F.col("payload").alias(f"v{i}")
        )
        for i, t in enumerate(terms)
    ]
    spans = slots[0]
    for i in range(1, len(slots)):
        spans = spans.join(
            slots[i],
            (spans["doc_id"] == slots[i]["doc_id"])
            & (slots[i][f"p{i}"] == F.col("p0") + i),
        ).drop(slots[i]["doc_id"])
    # every slot's payload inside every matched span is one occurrence
    vals = spans.select(
        "doc_id",
        F.explode(F.array(*[F.col(f"v{i}") for i in range(len(terms))])).alias("v"),
    )
    per_doc = vals.groupBy("doc_id").agg(
        _fold(fn, F.col("v").cast("float")).alias("payload_score")
    )
    per_doc = per_doc.withColumn(
        "payload_score",
        F.coalesce(F.col("payload_score"), F.lit(np.float32(1.0))),
    )
    if not include_span_score:
        return (
            per_doc.select("doc_id", F.col("payload_score").alias("score"), "payload_score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
    span_q = (
        Q.TermQuery(field, terms[0])
        if len(terms) == 1
        else Q.PhraseQuery(field, tuple(terms))
    )
    sc = searcher.scored(span_q).select("doc_id", F.col("score").alias("span_score"))
    return (
        sc.join(per_doc, "doc_id")
        .select(
            "doc_id",
            (F.col("span_score") * F.col("payload_score")).cast("float").alias("score"),
            "payload_score",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


_OPS = {
    "eq": lambda c, v: c == v,
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
}


def span_payload_check(
    payloads: DataFrame,
    terms: tuple,
    checks: tuple,
    op: str = "eq",
) -> DataFrame:
    """SpanPayloadCheckQuery (queries/payloads/SpanPayloadCheckQuery
    .java:54): exact-phrase spans survive only when every position's
    payload satisfies the per-slot check under the MatchOperation
    (EQ/LT/LTE/GT/GTE); a ``None`` check slot is unconstrained (the
    reference's wildcard payload). Returns (doc_id, n_spans) over the
    payload side table — the span join is the same k-way position join
    PayloadScoreQuery uses."""
    if len(checks) != len(terms):
        raise ValueError("one check per term slot (None = unconstrained)")
    cmp = _OPS.get(op)
    if cmp is None:
        raise ValueError(f"unknown MatchOperation {op!r}")
    slots = [
        payloads.filter(F.col("term") == t).select(
            F.col("doc_id"),
            F.col("pos").alias(f"p{i}"),
            F.col("payload").alias(f"v{i}"),
        )
        for i, t in enumerate(terms)
    ]
    spans = slots[0]
    for i in range(1, len(slots)):
        spans = spans.join(
            slots[i],
            (spans["doc_id"] == slots[i]["doc_id"])
            & (slots[i][f"p{i}"] == F.col("p0") + i),
        ).drop(slots[i]["doc_id"])
    pred = F.lit(True)
    for i, chk in enumerate(checks):
        if chk is not None:
            pred = pred & cmp(F.col(f"v{i}"), F.lit(chk))
    return (
        spans.filter(pred)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"))
    )
