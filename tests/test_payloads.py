

def test_span_payload_check(spark):
    """SpanPayloadCheckQuery.java:54: per-slot payload predicates gate the
    spans (EQ default; ordered MatchOperations; None slot = wildcard)."""
    from lucene_spark.search.payloads import (
        delimited_payload_table,
        span_payload_check,
    )

    docs = spark.createDataFrame(
        [
            (0, "the|1 quick|2 fox|3"),
            (1, "the|1 quick|9 fox|3"),
            (2, "quick|2 fox|3 the|1"),
        ],
        "doc_id long, text string",
    )
    pay = delimited_payload_table(docs)
    eq = span_payload_check(pay, ("quick", "fox"), (2.0, 3.0))
    assert {r["doc_id"] for r in eq.collect()} == {0, 2}
    wild = span_payload_check(pay, ("quick", "fox"), (None, 3.0))
    assert {r["doc_id"] for r in wild.collect()} == {0, 1, 2}
    lt = span_payload_check(pay, ("quick", "fox"), (5.0, None), op="lt")
    assert {r["doc_id"] for r in lt.collect()} == {0, 2}
    gte = span_payload_check(pay, ("quick", "fox"), (9.0, None), op="gte")
    assert {r["doc_id"] for r in gte.collect()} == {1}
