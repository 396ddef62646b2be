"""Indexed shapes (XYShape / Tessellator role, ``geo/Tessellator.java:78``):
tessellation invariants (area preservation, n-2(+holes) triangle count,
orientation normalization, hole bridging), plus the SQL box/point
relations against a pure-Python oracle."""

import math
import random

import pytest

from lucene_spark.search.shapes import (
    _point_in_tri,
    _signed_area,
    bbox_contains,
    bbox_disjoint,
    bbox_intersects,
    bbox_within,
    build_shape_tables,
    point_intersects,
    tessellate,
)


def _tri_area(t):
    ax, ay, bx, by, cx, cy = t
    return abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)) / 2


SQUARE = [(0, 0), (4, 0), (4, 4), (0, 4)]
L_SHAPE = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]
STAR = [(0, 0), (5, 2), (10, 0), (8, 5), (10, 10), (5, 8), (0, 10), (2, 5)]
SPIRAL = [(0, 0), (8, 0), (8, 8), (2, 8), (2, 4), (4, 4), (4, 6), (6, 6), (6, 2), (0, 2)]
HOLE = [(1, 1), (3, 1), (3, 3), (1, 3)]


@pytest.mark.parametrize(
    "outer,holes,want_area",
    [
        (SQUARE, None, 16.0),
        (L_SHAPE, None, 12.0),
        (STAR, None, 60.0),
        (SPIRAL, None, 40.0),
        (SQUARE, [HOLE], 12.0),
        ([(0, 0), (10, 0), (10, 10), (0, 10)],
         [[(1, 1), (2, 1), (2, 2), (1, 2)], [(5, 5), (7, 5), (7, 7), (5, 7)]],
         95.0),
    ],
    ids=["square", "L", "star", "spiral", "holed", "two-holes"],
)
def test_tessellation_preserves_area(outer, holes, want_area):
    tris = tessellate(outer, holes)
    assert abs(sum(map(_tri_area, tris)) - want_area) < 1e-9
    # simple polygon: exactly n-2 triangles; each hole adds 2
    n = len(outer) + sum(len(h) + 2 for h in holes or [])
    assert len(tris) == n - 2
    # every triangle is non-degenerate
    assert all(_tri_area(t) > 0 for t in tris)


def test_orientation_and_closure_normalized():
    cw = list(reversed(SQUARE))
    closed = SQUARE + [SQUARE[0]]
    for ring in (cw, closed):
        assert abs(sum(map(_tri_area, tessellate(ring))) - 16.0) < 1e-9


def test_random_star_shaped_polygons_area_invariant():
    """Property sweep: random star-shaped polygons (sorted-angle random
    radii are always simple) tessellate to their exact shoelace area."""
    rng = random.Random(42)
    for _ in range(50):
        n = rng.randint(4, 24)
        pts = []
        for k in range(n):
            th = 2 * math.pi * k / n + rng.uniform(0, 0.4 / n)
            r = rng.uniform(1.0, 10.0)
            pts.append((r * math.cos(th), r * math.sin(th)))
        tris = tessellate(pts)
        assert abs(sum(map(_tri_area, tris)) - abs(_signed_area(pts))) < 1e-6
        assert len(tris) == n - 2


def test_invalid_polygon_raises():
    with pytest.raises(ValueError):
        tessellate([(0, 0), (1, 1)])


@pytest.fixture(scope="module")
def shape_tables(spark):
    shapes = [
        (0, SQUARE, None),             # 4x4 at origin
        (1, L_SHAPE, None),            # concave
        (2, SQUARE, [HOLE]),           # 4x4 with 2x2 hole at (1,1)-(3,3)
        (3, [(10, 10), (14, 10), (14, 14), (10, 14)], None),  # far away
    ]
    tris, edges = build_shape_tables(spark, shapes)
    return tris.persist(), edges.persist()


def _ids(df):
    return sorted(int(r["doc_id"]) for r in df.collect())


def test_bbox_intersects_relation(shape_tables):
    tris, _ = shape_tables
    # box overlapping the origin square family only
    assert _ids(bbox_intersects(tris, -1, -1, 0.5, 0.5)) == [0, 1, 2]
    # box fully inside the HOLE of doc 2: hits 0 and 1, NOT 2
    assert _ids(bbox_intersects(tris, 1.6, 1.6, 2.4, 2.4)) == [0, 1]
    # box around everything
    assert _ids(bbox_intersects(tris, -1, -1, 20, 20)) == [0, 1, 2, 3]
    # box crossing a shape with no vertex inside it (pure edge crossing)
    assert 0 in _ids(bbox_intersects(tris, 1.9, -1, 2.1, 5))


def test_bbox_within_relation(shape_tables):
    tris, _ = shape_tables
    assert _ids(bbox_within(tris, -1, -1, 5, 5)) == [0, 1, 2]
    assert _ids(bbox_within(tris, -1, -1, 4, 4)) == [0, 1, 2]  # boundary ok
    assert _ids(bbox_within(tris, -1, -1, 3, 5)) == []
    assert _ids(bbox_within(tris, 9, 9, 15, 15)) == [3]


def test_bbox_disjoint_relation(shape_tables):
    tris, _ = shape_tables
    assert _ids(bbox_disjoint(tris, 5, 5, 9, 9)) == [0, 1, 2, 3]
    assert _ids(bbox_disjoint(tris, -1, -1, 20, 20)) == []
    # the hole interior is disjoint from doc 2 but not docs 0/1
    assert _ids(bbox_disjoint(tris, 1.6, 1.6, 2.4, 2.4)) == [2, 3]


def test_bbox_contains_relation(shape_tables):
    tris, edges = shape_tables
    # small box deep inside the square AND inside the L's lower arm:
    # contained by 0 and 1; NOT by 2 (its hole boundary crosses the box)
    assert _ids(bbox_contains(tris, edges, 0.2, 0.2, 1.8, 1.8)) == [0, 1]
    # box inside both the square and the L's lower arm
    assert _ids(bbox_contains(tris, edges, 0.2, 0.2, 1.5, 1.5)) == [0, 1]
    # box partly outside everything
    assert _ids(bbox_contains(tris, edges, -2, -2, 1, 1)) == []
    # box inside the square but overlapping doc 2's hole boundary
    assert _ids(bbox_contains(tris, edges, 0.5, 0.5, 2.5, 2.5)) == [0]


def test_point_intersects_relation(shape_tables):
    tris, _ = shape_tables
    assert _ids(point_intersects(tris, 0.5, 0.5)) == [0, 1, 2]
    # the hole's CENTER (strictly inside -> doc 2 out); the L's reflex
    # corner (boundary -> doc 1 in)
    assert _ids(point_intersects(tris, 2.0, 2.0)) == [0, 1]
    assert _ids(point_intersects(tris, 3.5, 3.5)) == [0, 2]  # outside the L
    # ON the L's notch edge (closed), strictly INSIDE doc 2's hole
    assert _ids(point_intersects(tris, 2.0, 2.5)) == [0, 1]
    assert _ids(point_intersects(tris, 12, 12)) == [3]
    assert _ids(point_intersects(tris, 50, 50)) == []


def test_point_oracle_sweep(shape_tables):
    """Dense-grid oracle: point_intersects agrees with pure-Python
    point-in-any-triangle on a 9x9 grid over the shape extent."""
    tris, _ = shape_tables
    rows = tris.collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), []).append(
            ((r["ax"], r["ay"]), (r["bx"], r["by"]), (r["cx"], r["cy"]))
        )
    for gx in range(9):
        for gy in range(9):
            x, y = gx * 0.5 + 0.25, gy * 0.5 + 0.25
            want = sorted(
                d
                for d, ts in by_doc.items()
                if any(_point_in_tri((x, y), *t) for t in ts)
            )
            assert _ids(point_intersects(tris, x, y)) == want, (x, y)


def test_polygon_query_relations(shape_tables, spark):
    """Polygon QUERY geometries (XYShape newGeometryQuery): the query
    tessellates driver-side; relations run as codegen predicates over
    (row triangle, query triangle/edge) pairs."""
    from lucene_spark.search.shapes import (
        polygon_disjoint,
        polygon_intersects,
        polygon_within,
    )

    tris, _ = shape_tables
    # a diamond centered at (2,2) with radius 1.5: inside the square
    # family's extent, overlapping the hole of doc 2
    diamond = [(2, 0.5), (3.5, 2), (2, 3.5), (0.5, 2)]
    assert _ids(polygon_intersects(tris, diamond)) == [0, 1, 2]
    assert _ids(polygon_disjoint(tris, diamond)) == [3]
    # a small diamond strictly inside doc 2's hole: touches only 0 and 1
    small = [(2, 1.5), (2.5, 2), (2, 2.5), (1.5, 2)]
    assert _ids(polygon_intersects(tris, small)) == [0, 1]
    # a big diamond covering everything near the origin
    big = [(2, -5), (9, 2), (2, 9), (-5, 2)]
    assert _ids(polygon_within(tris, big)) == [0, 1, 2]
    # query WITH a hole that swallows part of doc 0: doc 0 no longer
    # within; the far square is outside the query entirely
    big_holed_inner = [(1.5, 1.5), (2.5, 1.5), (2.5, 2.5), (1.5, 2.5)]
    within_ids = _ids(polygon_within(tris, big, [big_holed_inner]))
    assert 0 not in within_ids and 3 not in within_ids
    # doc 2's own hole covers the query hole region entirely, so doc 2
    # stays within; the L-shape overlaps the query hole -> out
    assert within_ids == [2]
    # tiny query polygon strictly inside a doc-0 triangle (no vertex of
    # either inside the other is impossible here — vertex-in covers it)
    tiny = [(0.2, 0.2), (0.4, 0.2), (0.3, 0.4)]
    assert 0 in _ids(polygon_intersects(tris, tiny))
