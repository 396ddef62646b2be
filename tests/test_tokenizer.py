"""Analyzer golden tests per StandardAnalyzer semantics (reference
analysis/standard/StandardTokenizer.java + StandardTokenizerImpl.jflex
consequences; see SURVEY §1.3)."""

import pytest

from lucene_spark.analysis.tokenizer import StandardAnalyzer

A = StandardAnalyzer()


@pytest.mark.parametrize(
    "text,expected",
    [
        ("foo bar", ["foo", "bar"]),
        ("Foo BAR", ["foo", "bar"]),
        ("foo_bar", ["foo_bar"]),  # _ is ExtendNumLet: one token
        ("foo.bar", ["foo.bar"]),  # MidNumLet between letters
        ("a.b.c", ["a.b.c"]),
        ("org.apache.lucene.search", ["org.apache.lucene.search"]),
        ("1,000", ["1,000"]),  # MidNum between digits
        ("3.14", ["3.14"]),
        ("foo-bar", ["foo", "bar"]),  # hyphen splits
        ("foo/bar", ["foo", "bar"]),
        ("C++", ["c"]),
        ("can't", ["can't"]),  # apostrophe between letters
        ("a:b", ["a:b"]),  # colon is MidLetter
        ("foo,bar", ["foo", "bar"]),  # comma does NOT join letters
        ("a.4", ["a", "4"]),  # dot needs same class both sides
        ("x = foo(bar, baz);", ["x", "foo", "bar", "baz"]),
        ("snake_case.method_name", ["snake_case.method_name"]),
        ("", []),
        ("   ", []),
        ("trailing. dot", ["trailing", "dot"]),
    ],
)
def test_golden_tokens(text, expected):
    assert A.terms(text) == expected


def test_long_token_skipped_but_counts_position():
    long_tok = "x" * 256
    toks = A.tokens(f"alpha {long_tok} beta")
    assert [t.term for t in toks] == ["alpha", "beta"]
    assert [t.position for t in toks] == [0, 2]  # gap where the long token was
    # exactly 255 chars is kept
    ok = "y" * 255
    assert A.terms(ok) == [ok]


def test_field_length_excludes_skipped():
    long_tok = "x" * 300
    assert A.field_length(f"a {long_tok} b") == 2


def test_stopwords_leave_position_gaps():
    a = StandardAnalyzer(stopwords=frozenset({"the"}))
    toks = a.tokens("the quick the fox")
    assert [(t.term, t.position) for t in toks] == [("quick", 1), ("fox", 3)]


def test_inverted():
    inv, n = A.inverted("big cat big dog big")
    assert n == 5
    assert inv == {"big": [0, 2, 4], "cat": [1], "dog": [3]}


def test_unicode_lowercase_dotted_capital_i():
    # Java Character.toLowerCase(U+0130) == 'i' (one codepoint)
    assert A.terms("İstanbul") == ["istanbul"]


def test_term_position_arrays_equivalent_to_tokens():
    """The batch-inversion fast path must agree with the per-token path."""
    from lucene_spark.analysis.tokenizer import StandardAnalyzer

    cases = [
        "FooBar foo_bar a.b.c 1,000 C++ x-y  hello   WORLD",
        "",
        "z" * 300 + " after_long_token",
        "İstanbul can't 3.14 a:b",
        "the the the stop words",
    ]
    for an in (StandardAnalyzer(), StandardAnalyzer(stopwords=frozenset({"the"}))):
        for text in cases:
            toks = an.tokens(text)
            terms, pos, n = an.term_position_arrays(text)
            assert terms == [t.term for t in toks]
            assert pos.tolist() == [t.position for t in toks]
            assert n == len(toks)


def test_sql_token_expressions_match_python_analyzer(spark):
    """The JVM-side token/count/norm expressions (analysis/sql.py) must
    equal the Python StandardAnalyzer chain on corpus text plus tricky
    Unicode / over-long-token cases — they back the SQL doclens fast path
    and the monitor/highlighter tokenization."""
    import numpy as np
    from pyspark.sql import functions as F

    from lucene_spark.analysis.sql import (
        sql_emitted_count,
        sql_norm_byte,
        sql_tokens,
    )
    from lucene_spark.analysis.tokenizer import StandardAnalyzer
    from lucene_spark.testing.corpus import generate_corpus
    from lucene_spark.util.smallfloat import encode_lengths

    texts = list(generate_corpus(40, seed=3)["content"])
    texts += [
        "İstanbul Straße ÇOK naïve café",
        "foo_bar a.b can't 1,000 3.14 x-y",
        "x" * 300 + " normal " + "y" * 255,
        "",
        "日本語のテキスト und_Unterstrich MixedCASE99",
    ]
    an = StandardAnalyzer()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    rows = df.select(
        "doc_id",
        sql_tokens("content").alias("toks"),
        sql_emitted_count("content").alias("cnt"),
        sql_norm_byte(sql_emitted_count("content")).alias("nb"),
    ).collect()
    for r in rows:
        t = texts[r["doc_id"]]
        assert list(r["toks"]) == an.terms(t), t[:60]
        assert r["cnt"] == an.emitted_count(t), t[:60]
        assert r["nb"] == int(
            encode_lengths(np.array([an.emitted_count(t)]))[0]
        ), t[:60]


def test_sql_norm_byte_closed_form_full_range(spark):
    """The closed-form byte4 expression must equal smallfloat.encode_lengths
    on every bucket boundary: all lengths 0..4096, +-1 around every bucket
    floor, and large values up to 2^30."""
    import numpy as np
    from pyspark.sql import functions as F

    from lucene_spark.analysis.sql import sql_norm_byte
    from lucene_spark.util.smallfloat import LENGTH_TABLE_INT, encode_lengths

    vals = set(range(0, 4097))
    for fl in LENGTH_TABLE_INT.tolist():
        for d in (-1, 0, 1):
            if fl + d >= 0:
                vals.add(int(fl + d))
    vals.update([10**6, 2**20, 2**30, 2**30 + 12345])
    vals = sorted(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["nb"]
        for r in df.select("v", sql_norm_byte(F.col("v")).alias("nb")).collect()
    }
    want = encode_lengths(np.array(vals, dtype=np.int64))
    for v, w in zip(vals, want):
        assert got[v] == int(w), (v, got[v], int(w))
