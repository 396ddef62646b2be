"""Compiled scoring expressions — the ``lucene/expressions`` module.

The reference compiles a JavaScript-like arithmetic grammar to bytecode
(``expressions/js/JavascriptCompiler.java:105``) and binds free variables
to per-doc value sources (``expressions/SimpleBindings.java``); the
compiled expression then drives ``FunctionScoreQuery`` / expression sorts.

Spark twin: compile the same arithmetic surface to ONE Column expression
tree (whole-stage-codegen'd by Catalyst — the JVM-bytecode role), with
free variables bound to columns. The grammar subset is parsed with
Python's ``ast`` in eval mode after normalizing the two JS spellings
Python lacks (``cond ? a : b`` and ``&&``/``||``), and every node type is
whitelisted — no eval, no attribute access, no subscripts, no calls
outside the function table.

Function table mirrors JavascriptCompiler's built-ins
(``JavascriptCompiler.java`` DEFAULT_FUNCTIONS): abs, ceil, floor, exp,
ln, log10, logn, sqrt, pow, cbrt, min, max, sin, cos, tan, asin, acos,
atan, atan2, sinh, cosh, tanh, haversin (meters, SloppyMath semantics).
"""

from __future__ import annotations

import ast
import re

from pyspark.sql import Column, functions as F

__all__ = ["compile_expression", "ExpressionError"]


class ExpressionError(ValueError):
    """Raised for syntax outside the supported grammar or unbound names."""


def _haversin(lat1, lon1, lat2, lon2):
    from lucene_spark.search.geo import haversine_meters

    return haversine_meters(lat1, lon1, lat2, lon2)


_FUNCTIONS = {
    "abs": (1, F.abs),
    "ceil": (1, F.ceil),
    "floor": (1, F.floor),
    "exp": (1, F.exp),
    "ln": (1, F.log),
    "log10": (1, F.log10),
    "logn": (2, lambda base, x: F.log(x) / F.log(base)),
    "sqrt": (1, F.sqrt),
    "cbrt": (1, F.cbrt),
    "pow": (2, lambda x, y: F.pow(x, y)),
    "min": (2, F.least),
    "max": (2, F.greatest),
    "sin": (1, F.sin),
    "cos": (1, F.cos),
    "tan": (1, F.tan),
    "asin": (1, F.asin),
    "acos": (1, F.acos),
    "atan": (1, F.atan),
    "atan2": (2, F.atan2),
    "sinh": (1, F.sinh),
    "cosh": (1, F.cosh),
    "tanh": (1, F.tanh),
    "haversin": (4, _haversin),
}

# `cond ? a : b` -> `((a) if (cond) else (b))`, innermost-first so nested
# ternaries resolve; the grammar has no other use of ? or :
_TERNARY = re.compile(r"\(([^()?]*)\)\s*\?\s*([^()?:]+)\s*:\s*([^()?:]+)")
_TERNARY_BARE = re.compile(r"([^()?]+?)\s*\?\s*([^()?:]+)\s*:\s*([^()?:]+)")


def _normalize_js(expr: str) -> str:
    out = expr.replace("&&", " and ").replace("||", " or ").replace("!", " not ")
    # restore != (the ! replacement above splits it)
    out = out.replace(" not =", " !=")
    prev = None
    while prev != out:
        prev = out
        out = _TERNARY.sub(r"(( \2 ) if ( \1 ) else ( \3 ))", out)
        out = _TERNARY_BARE.sub(r"(( \2 ) if ( \1 ) else ( \3 ))", out)
    return out


_ALLOWED_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Mod: lambda a, b: a % b,
}
_ALLOWED_CMP = {
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
}


def compile_expression(
    expr: str, bindings: dict[str, Column] | None = None
) -> Column:
    """Compile a JavascriptCompiler-style expression to one Column.

    Free identifiers resolve through ``bindings`` first (the
    SimpleBindings role — e.g. ``{"_score": F.col("score")}``), then fall
    back to ``F.col(name)``. Numeric literals stay doubles, mirroring the
    reference's all-double evaluation model.
    """
    bindings = bindings or {}
    try:
        tree = ast.parse(_normalize_js(expr), mode="eval")
    except SyntaxError as e:
        raise ExpressionError(f"cannot parse expression {expr!r}: {e}") from e

    def build(node: ast.AST) -> Column:
        if isinstance(node, ast.Expression):
            return build(node.body)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, bool) or not isinstance(
                node.value, (int, float)
            ):
                raise ExpressionError(f"non-numeric literal {node.value!r}")
            return F.lit(float(node.value))
        if isinstance(node, ast.Name):
            if node.id in bindings:
                return bindings[node.id]
            return F.col(node.id)
        if isinstance(node, ast.BinOp):
            op = _ALLOWED_BINOPS.get(type(node.op))
            if op is None:
                raise ExpressionError(f"operator {type(node.op).__name__} unsupported")
            return op(build(node.left), build(node.right))
        if isinstance(node, ast.UnaryOp):
            if isinstance(node.op, ast.USub):
                return -build(node.operand)
            if isinstance(node.op, ast.Not):
                return ~build(node.operand).cast("boolean")
            raise ExpressionError(f"operator {type(node.op).__name__} unsupported")
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise ExpressionError("chained comparisons unsupported")
            op = _ALLOWED_CMP.get(type(node.ops[0]))
            if op is None:
                raise ExpressionError(
                    f"comparison {type(node.ops[0]).__name__} unsupported"
                )
            return op(build(node.left), build(node.comparators[0]))
        if isinstance(node, ast.BoolOp):
            vals = [build(v).cast("boolean") for v in node.values]
            out = vals[0]
            for v in vals[1:]:
                out = (out & v) if isinstance(node.op, ast.And) else (out | v)
            return out
        if isinstance(node, ast.IfExp):
            return F.when(
                build(node.test).cast("boolean"), build(node.body)
            ).otherwise(build(node.orelse))
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.keywords:
                raise ExpressionError("only plain built-in function calls allowed")
            entry = _FUNCTIONS.get(node.func.id)
            if entry is None:
                raise ExpressionError(f"unknown function {node.func.id!r}")
            arity, fn = entry
            if len(node.args) != arity:
                raise ExpressionError(
                    f"{node.func.id} takes {arity} args, got {len(node.args)}"
                )
            return fn(*[build(a) for a in node.args])
        raise ExpressionError(f"syntax {type(node).__name__} unsupported")

    return build(tree)
