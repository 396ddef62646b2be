"""N-dimensional point utilities beyond the core range queries.

``float_point_nearest`` — the FloatPointNearestNeighbor role
(``sandbox/document/FloatPointNearestNeighbor.java:41``): exact
nearest-N docs by Euclidean distance over indexed float point columns.
The reference walks the BKD tree best-first with per-cell
closest-possible distance bounds; Spark's equivalent of that pruning is
a bounding-box PRE-FILTER that Catalyst pushes into the parquet scan
(parquet row-group min/max stats play the BKD interior-node bound) plus
a TakeOrderedAndProject top-N — the same "never sort the whole
collection" guarantee, one pass, no shuffle beyond the top-N combine.

Without a radius hint the scan is a full pass (exact KNN over an
unindexed space is a linear scan in any engine); callers with a known
search radius pass ``radius`` to engage the box prune, and the ANN
paths (`pipeline/similarity.py`, `pipeline/graph_ann.py`,
`pipeline/ivf.py`) remain the sublinear options for high-dim vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["float_point_nearest"]


def float_point_nearest(
    df: DataFrame,
    dims: list[str],
    origin: list[float],
    n: int = 10,
    id_col: str = "doc_id",
    radius: float | None = None,
) -> DataFrame:
    """Exact nearest-``n`` rows to ``origin`` by Euclidean distance over
    the per-dim float columns, distance ties broken by ``id_col``
    ascending (the reference visits docs in BKD order within a cell —
    doc order; pinned here for cross-engine determinism). Returns
    ``(id_col, dist_sq: double)``."""
    if len(dims) != len(origin):
        raise ValueError("dims and origin must have the same arity")
    dist = None
    for c, o in zip(dims, origin):
        d = F.col(c).cast("double") - F.lit(float(o))
        term = d * d
        dist = term if dist is None else dist + term
    out = df
    if radius is not None:
        # bounding-box prune: every dim within +-radius — pushdown-able,
        # the BKD cell-bound role; the exact sphere test happens via the
        # distance ordering itself
        for c, o in zip(dims, origin):
            out = out.filter(
                (F.col(c) >= F.lit(float(o) - radius))
                & (F.col(c) <= F.lit(float(o) + radius))
            )
        out = out.filter(dist <= F.lit(float(radius) * float(radius)))
    return (
        out.select(F.col(id_col), dist.alias("dist_sq"))
        .orderBy(F.asc("dist_sq"), F.asc(id_col))
        .limit(n)
    )
