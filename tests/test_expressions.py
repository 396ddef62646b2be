"""Expressions module (expressions/js/JavascriptCompiler.java analog):
compile arithmetic expression strings to Column trees; values match a
pure-Python evaluation of the same formulas."""

import math

import pytest
from pyspark.sql import Row, functions as F

from lucene_spark.search.expressions import ExpressionError, compile_expression


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        Row(id=0, x=2.0, y=3.0, score=0.5),
        Row(id=1, x=-4.0, y=0.25, score=2.0),
        Row(id=2, x=10.0, y=-1.5, score=0.0),
    ]
    return spark.createDataFrame(rows)


def _eval(frame, expr, bindings=None):
    col = compile_expression(expr, bindings)
    return {
        r["id"]: r["v"] for r in frame.select("id", col.alias("v")).collect()
    }


def test_arithmetic_and_functions(frame):
    got = _eval(frame, "ln(abs(x)) + sqrt(abs(y)) * 2 - x % 3")
    for r in frame.collect():
        want = (
            math.log(abs(r.x)) + math.sqrt(abs(r.y)) * 2 - math.fmod(r.x, 3)
        )
        assert got[r.id] == pytest.approx(want, rel=1e-12)


def test_bindings_score_variable(frame):
    got = _eval(frame, "_score * 2 + max(x, y)", {"_score": F.col("score")})
    for r in frame.collect():
        assert got[r.id] == pytest.approx(r.score * 2 + max(r.x, r.y))


def test_js_ternary_and_logical(frame):
    got = _eval(frame, "(x > 0 && y > 0) ? x * y : 0")
    for r in frame.collect():
        assert got[r.id] == pytest.approx(r.x * r.y if r.x > 0 and r.y > 0 else 0.0)


def test_two_arg_functions(frame):
    got = _eval(frame, "pow(abs(x), 0.5) + atan2(y, 1) + logn(2, 8)")
    for r in frame.collect():
        want = abs(r.x) ** 0.5 + math.atan2(r.y, 1) + 3.0
        assert got[r.id] == pytest.approx(want, rel=1e-12)


def test_haversin_matches_geo(frame):
    from lucene_spark.search import geo

    got = _eval(frame, "haversin(12.0, 34.0, x, y)")
    ref = {
        r["id"]: r["v"]
        for r in frame.select(
            "id",
            geo.haversine_meters(
                F.lit(12.0), F.lit(34.0), F.col("x"), F.col("y")
            ).alias("v"),
        ).collect()
    }
    assert got == ref


def test_rejects_unsafe_syntax():
    for bad in [
        "__import__('os')",
        "x.attr",
        "arr[0]",
        "unknown_fn(1)",
        "lambda: 1",
        "'str'",
        "min(1)",  # wrong arity
    ]:
        with pytest.raises(ExpressionError):
            compile_expression(bad)
