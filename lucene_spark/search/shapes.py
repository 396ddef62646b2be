"""Indexed shapes — the reference's XYShape / Tessellator role
(``core/src/java/org/apache/lucene/document/XYShape.java``,
``core/src/java/org/apache/lucene/geo/Tessellator.java:78``): polygons
are triangulated at INDEX time and stored as per-document triangle rows;
spatial queries are pure SQL relations over those rows (ShapeQuery
INTERSECTS / WITHIN / DISJOINT / CONTAINS,
``document/SpatialQuery.java``).

Spark-first layout: a shape table is just a DataFrame
``(doc_id, ax, ay, bx, by, cx, cy)`` — one row per triangle — plus an
edges table ``(doc_id, x1, y1, x2, y2)`` of ORIGINAL ring edges (the
boundary information Lucene keeps as the tessellator's edge-from-polygon
flags) for the CONTAINS relation. All relation predicates are closed-form
boolean SQL over those columns, so they run inside whole-stage codegen,
push down min/max pre-filters to the parquet scan, and need no Python at
query time. Tessellation itself is clean-room ear clipping (the published
earcut algorithm Lucene's Tessellator derives from), run per document at
index time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "tessellate",
    "build_shape_tables",
    "bbox_intersects",
    "bbox_within",
    "bbox_disjoint",
    "bbox_contains",
    "point_intersects",
]


# ---------------------------------------------------------------- tessellate


def _signed_area(ring: list[tuple[float, float]]) -> float:
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _is_ccw(ring) -> bool:
    return _signed_area(ring) > 0


def _tri_area2(a, b, c) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _point_in_tri(p, a, b, c) -> bool:
    d1 = _tri_area2(p, a, b)
    d2 = _tri_area2(p, b, c)
    d3 = _tri_area2(p, c, a)
    has_neg = d1 < 0 or d2 < 0 or d3 < 0
    has_pos = d1 > 0 or d2 > 0 or d3 > 0
    return not (has_neg and has_pos)


def _segments_cross(p1, p2, p3, p4) -> bool:
    """Proper intersection of open segments (shared endpoints excluded)."""
    d1 = _tri_area2(p3, p4, p1)
    d2 = _tri_area2(p3, p4, p2)
    d3 = _tri_area2(p1, p2, p3)
    d4 = _tri_area2(p1, p2, p4)
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))


def _bridge_hole(outer: list, hole: list) -> list:
    """Join a hole into the outer ring with a two-way bridge edge (the
    eliminateHoles step of earcut / Tessellator.java): connect the hole's
    leftmost vertex to the nearest outer vertex the bridge segment can
    reach without crossing any existing edge."""
    hi = min(range(len(hole)), key=lambda i: (hole[i][0], hole[i][1]))
    hp = hole[hi]

    def visible(ov):
        seg = (hp, ov)
        rings = [outer, hole]
        for ring in rings:
            n = len(ring)
            for i in range(n):
                a, b = ring[i], ring[(i + 1) % n]
                if a in seg or b in seg:
                    continue
                if _segments_cross(hp, ov, a, b):
                    return False
        return True

    order = sorted(
        range(len(outer)),
        key=lambda i: (outer[i][0] - hp[0]) ** 2 + (outer[i][1] - hp[1]) ** 2,
    )
    for oi in order:
        if visible(outer[oi]):
            # splice: outer[..oi], hole[hi..], hole[..hi], outer[oi..]
            return (
                outer[: oi + 1]
                + hole[hi:]
                + hole[: hi + 1]
                + outer[oi:]
            )
    # degenerate input: no visible bridge — drop the hole (matches the
    # tessellator's failure contract of raising on invalid polygons)
    raise ValueError("cannot bridge hole into outer ring (invalid polygon)")


def tessellate(
    outer: list[tuple[float, float]],
    holes: list[list[tuple[float, float]]] | None = None,
) -> list[tuple]:
    """Ear-clipping triangulation -> [(ax, ay, bx, by, cx, cy), ...].

    ``outer`` is a simple ring (closed or open — a repeated last point is
    dropped); holes are rings strictly inside it. Orientation is
    normalized internally (outer CCW, holes CW), matching
    ``geo/Polygon.java``'s constructor normalization.
    """
    ring = [tuple(map(float, p)) for p in outer]
    if len(ring) > 1 and ring[0] == ring[-1]:
        ring = ring[:-1]
    if len(ring) < 3:
        raise ValueError("polygon needs >= 3 distinct vertices")
    if not _is_ccw(ring):
        ring = ring[::-1]
    for hole in holes or []:
        h = [tuple(map(float, p)) for p in hole]
        if len(h) > 1 and h[0] == h[-1]:
            h = h[:-1]
        if _is_ccw(h):
            h = h[::-1]  # holes run CW
        ring = _bridge_hole(ring, h)

    tris: list[tuple] = []
    verts = list(ring)
    guard = 0
    while len(verts) > 3:
        n = len(verts)
        clipped = False
        for i in range(n):
            a, b, c = verts[i - 1], verts[i], verts[(i + 1) % n]
            if _tri_area2(a, b, c) <= 0:
                continue  # reflex or degenerate corner
            # ear test: no other vertex inside or ON the candidate ear
            # (inclusive, like earcut's pointInTriangle — a reflex vertex
            # sitting exactly on the diagonal must block the clip);
            # coordinate-duplicates of the ear's own corners (hole-bridge
            # splice points) are the ear itself, not blockers
            blocked = False
            for p in verts:
                if p in (a, b, c):
                    continue
                if _point_in_tri(p, a, b, c):
                    blocked = True
                    break
            if blocked:
                continue
            tris.append((a[0], a[1], b[0], b[1], c[0], c[1]))
            del verts[i]
            clipped = True
            break
        if not clipped:
            guard += 1
            if guard > 2:
                raise ValueError("tessellation failed (self-intersecting?)")
            # fall back: drop one degenerate (zero-area) corner
            for i in range(len(verts)):
                if _tri_area2(
                    verts[i - 1], verts[i], verts[(i + 1) % len(verts)]
                ) == 0:
                    del verts[i]
                    break
    a, b, c = verts
    if _tri_area2(a, b, c) != 0:
        tris.append((a[0], a[1], b[0], b[1], c[0], c[1]))
    return tris


# ------------------------------------------------------------- shape tables


def build_shape_tables(
    spark,
    shapes: list[tuple[int, list, list | None]],
) -> tuple[DataFrame, DataFrame]:
    """(triangles, edges) tables from [(doc_id, outer, holes), ...].

    Index-time tessellation (XYShape.createIndexableFields): triangles
    carry the interior, edges carry the ORIGINAL boundary for the
    CONTAINS relation. At 100 TB this runs inside mapInPandas over a
    shapes column; the driver-side list API mirrors the reference's
    per-document Field creation and keeps tests deterministic.
    """
    tri_rows = []
    edge_rows = []
    for doc_id, outer, holes in shapes:
        for t in tessellate(outer, holes):
            tri_rows.append((int(doc_id),) + t)
        for ring in [outer] + list(holes or []):
            r = [tuple(map(float, p)) for p in ring]
            if len(r) > 1 and r[0] == r[-1]:
                r = r[:-1]
            for i in range(len(r)):
                x1, y1 = r[i]
                x2, y2 = r[(i + 1) % len(r)]
                edge_rows.append((int(doc_id), x1, y1, x2, y2))
    tris = spark.createDataFrame(
        tri_rows,
        schema="doc_id long, ax double, ay double, bx double, by double, "
        "cx double, cy double",
    )
    edges = spark.createDataFrame(
        edge_rows, schema="doc_id long, x1 double, y1 double, x2 double, y2 double"
    )
    return tris, edges


# ---------------------------------------------------------------- relations


def _pt_in_tri_sql(px, py):
    """Column predicate: point (px, py) inside the row's triangle
    (inclusive of edges) — same sign test as the Python oracle."""
    def area2(x1, y1, x2, y2, x3, y3):
        return (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)

    a = area2(px, py, F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"))
    b = area2(px, py, F.col("bx"), F.col("by"), F.col("cx"), F.col("cy"))
    c = area2(px, py, F.col("cx"), F.col("cy"), F.col("ax"), F.col("ay"))
    has_neg = (a < 0) | (b < 0) | (c < 0)
    has_pos = (a > 0) | (b > 0) | (c > 0)
    return ~(has_neg & has_pos)


def _seg_box_hits(x1, y1, x2, y2, minx, miny, maxx, maxy):
    """Column predicate: segment intersects the (closed) box — cheap
    separating-axis test: segment bbox overlaps the box AND the box is
    not strictly on one side of the segment's line."""
    mnx, mxx = F.least(x1, x2), F.greatest(x1, x2)
    mny, mxy = F.least(y1, y2), F.greatest(y1, y2)
    bbox_overlap = (
        (mnx <= F.lit(maxx))
        & (mxx >= F.lit(minx))
        & (mny <= F.lit(maxy))
        & (mxy >= F.lit(miny))
    )

    def side(px, py):
        return (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)

    s1 = side(F.lit(minx), F.lit(miny))
    s2 = side(F.lit(maxx), F.lit(miny))
    s3 = side(F.lit(maxx), F.lit(maxy))
    s4 = side(F.lit(minx), F.lit(maxy))
    all_pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)
    all_neg = (s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)
    return bbox_overlap & ~(all_pos | all_neg)


def _tri_box_intersects(minx, miny, maxx, maxy):
    """Triangle/box intersection: any vertex in box, OR any box corner in
    triangle, OR any triangle edge hits the box."""
    def v_in_box(x, y):
        return (
            (x >= F.lit(minx))
            & (x <= F.lit(maxx))
            & (y >= F.lit(miny))
            & (y <= F.lit(maxy))
        )

    vert = (
        v_in_box(F.col("ax"), F.col("ay"))
        | v_in_box(F.col("bx"), F.col("by"))
        | v_in_box(F.col("cx"), F.col("cy"))
    )
    corner = (
        _pt_in_tri_sql(F.lit(minx), F.lit(miny))
        | _pt_in_tri_sql(F.lit(maxx), F.lit(miny))
        | _pt_in_tri_sql(F.lit(maxx), F.lit(maxy))
        | _pt_in_tri_sql(F.lit(minx), F.lit(maxy))
    )
    edges = (
        _seg_box_hits(F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
                      minx, miny, maxx, maxy)
        | _seg_box_hits(F.col("bx"), F.col("by"), F.col("cx"), F.col("cy"),
                        minx, miny, maxx, maxy)
        | _seg_box_hits(F.col("cx"), F.col("cy"), F.col("ax"), F.col("ay"),
                        minx, miny, maxx, maxy)
    )
    return vert | corner | edges


def bbox_intersects(
    tris: DataFrame, minx: float, miny: float, maxx: float, maxy: float
) -> DataFrame:
    """doc_ids whose shape INTERSECTS the query box (ShapeQuery
    QueryRelation.INTERSECTS): any triangle intersects."""
    return (
        tris.filter(_tri_box_intersects(minx, miny, maxx, maxy))
        .select("doc_id")
        .distinct()
    )


def bbox_within(
    tris: DataFrame, minx: float, miny: float, maxx: float, maxy: float
) -> DataFrame:
    """doc_ids whose shape lies WITHIN the query box: EVERY triangle's
    vertices inside (triangles are convex, so vertex containment is
    exact)."""
    def v_in(x, y):
        return (
            (x >= F.lit(minx))
            & (x <= F.lit(maxx))
            & (y >= F.lit(miny))
            & (y <= F.lit(maxy))
        )

    inside = (
        v_in(F.col("ax"), F.col("ay")).cast("int")
        * v_in(F.col("bx"), F.col("by")).cast("int")
        * v_in(F.col("cx"), F.col("cy")).cast("int")
    )
    return (
        tris.groupBy("doc_id")
        .agg(F.min(inside).alias("_all_in"))
        .filter(F.col("_all_in") == 1)
        .select("doc_id")
    )


def bbox_disjoint(
    tris: DataFrame, minx: float, miny: float, maxx: float, maxy: float
) -> DataFrame:
    """doc_ids whose shape is DISJOINT from the query box: complement of
    INTERSECTS over the docs present in the table (anti-join, one pass)."""
    hit = bbox_intersects(tris, minx, miny, maxx, maxy)
    return tris.select("doc_id").distinct().join(hit, "doc_id", "left_anti")


def bbox_contains(
    tris: DataFrame,
    edges: DataFrame,
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
) -> DataFrame:
    """doc_ids whose shape CONTAINS the query box: all four box corners
    covered by some triangle AND no ORIGINAL boundary edge crosses the
    box's interior (the edge-from-polygon information Lucene's
    tessellator preserves for exactly this relation)."""
    corners = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)]
    covered = None
    for (px, py) in corners:
        c = (
            tris.filter(_pt_in_tri_sql(F.lit(px), F.lit(py)))
            .select("doc_id")
            .distinct()
        )
        covered = c if covered is None else covered.join(c, "doc_id")
    eps = 1e-12
    crossing = (
        edges.filter(
            _seg_box_hits(
                F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
                minx + eps, miny + eps, maxx - eps, maxy - eps,
            )
        )
        .select("doc_id")
        .distinct()
    )
    return covered.join(crossing, "doc_id", "left_anti")


def point_intersects(tris: DataFrame, x: float, y: float) -> DataFrame:
    """doc_ids whose shape covers the point (boundary inclusive)."""
    return (
        tris.filter(_pt_in_tri_sql(F.lit(float(x)), F.lit(float(y))))
        .select("doc_id")
        .distinct()
    )


# ------------------------------------------------- polygon query geometries


def _pt_in_const_tri(xc, yc, tri) -> "F.Column":
    """Row point (xc, yc) inside the CONSTANT triangle (closed)."""
    ax, ay, bx, by, cx, cy = (F.lit(float(v)) for v in tri)

    def area2(x1, y1, x2, y2, x3, y3):
        return (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)

    a = area2(xc, yc, ax, ay, bx, by)
    b = area2(xc, yc, bx, by, cx, cy)
    c = area2(xc, yc, cx, cy, ax, ay)
    has_neg = (a < 0) | (b < 0) | (c < 0)
    has_pos = (a > 0) | (b > 0) | (c > 0)
    return ~(has_neg & has_pos)


def _pt_strictly_in_tri_sql(px, py) -> "F.Column":
    """Constant point STRICTLY inside the row's triangle (boundary out)."""
    def area2(x1, y1, x2, y2, x3, y3):
        return (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)

    a = area2(px, py, F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"))
    b = area2(px, py, F.col("bx"), F.col("by"), F.col("cx"), F.col("cy"))
    c = area2(px, py, F.col("cx"), F.col("cy"), F.col("ax"), F.col("ay"))
    return ((a > 0) & (b > 0) & (c > 0)) | ((a < 0) & (b < 0) & (c < 0))


def _segs_cross_sql(x1, y1, x2, y2, qx1, qy1, qx2, qy2) -> "F.Column":
    """Proper crossing of a row segment and a constant segment."""
    def side(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    d1 = side(qx1, qy1, qx2, qy2, x1, y1)
    d2 = side(qx1, qy1, qx2, qy2, x2, y2)
    d3 = side(x1, y1, x2, y2, qx1, qy1)
    d4 = side(x1, y1, x2, y2, qx2, qy2)
    return (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )


def _query_geometry(outer, holes):
    """(query triangles, query boundary edges) — tessellated driver-side
    once per query, like the reference's Component2D construction."""
    qtris = tessellate(outer, holes)
    qedges = []
    for ring in [outer] + list(holes or []):
        r = [tuple(map(float, p)) for p in ring]
        if len(r) > 1 and r[0] == r[-1]:
            r = r[:-1]
        for i in range(len(r)):
            qedges.append((r[i], r[(i + 1) % len(r)]))
    return qtris, qedges


def _tri_query_poly_intersects(qtris, qedges) -> "F.Column":
    """Row triangle intersects the query polygon (closed sets): any row
    vertex in a query triangle, any query vertex in the row triangle, or
    any row edge properly crossing a query BOUNDARY edge (touch-only
    contacts always place a vertex of one side on the other — inclusive
    vertex tests cover them, the same completeness argument as the box
    relation)."""
    row_pts = [
        (F.col("ax"), F.col("ay")),
        (F.col("bx"), F.col("by")),
        (F.col("cx"), F.col("cy")),
    ]
    row_edges = [
        (F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
        (F.col("bx"), F.col("by"), F.col("cx"), F.col("cy")),
        (F.col("cx"), F.col("cy"), F.col("ax"), F.col("ay")),
    ]
    pred = F.lit(False)
    for qt in qtris:
        for (xc, yc) in row_pts:
            pred = pred | _pt_in_const_tri(xc, yc, qt)
        for (qx, qy) in ((qt[0], qt[1]), (qt[2], qt[3]), (qt[4], qt[5])):
            pred = pred | _pt_in_tri_sql(F.lit(float(qx)), F.lit(float(qy)))
    for ((p1x, p1y), (p2x, p2y)) in qedges:
        q1x, q1y = F.lit(float(p1x)), F.lit(float(p1y))
        q2x, q2y = F.lit(float(p2x)), F.lit(float(p2y))
        for (x1, y1, x2, y2) in row_edges:
            pred = pred | _segs_cross_sql(x1, y1, x2, y2, q1x, q1y, q2x, q2y)
    return pred


def polygon_intersects(
    tris: DataFrame, outer: list, holes: list | None = None
) -> DataFrame:
    """doc_ids whose shape INTERSECTS the query POLYGON (XYShape
    newGeometryQuery INTERSECTS with a polygon operand): the query
    tessellates driver-side, the relation is one codegen predicate per
    (row triangle, query triangle/edge) pair. Query complexity budget is
    the caller's: a q-vertex polygon expands to O(q) terms inside one
    whole-stage-codegen filter — the same position Lucene's per-triangle
    Component2D tree walk occupies."""
    qtris, qedges = _query_geometry(outer, holes)
    return (
        tris.filter(_tri_query_poly_intersects(qtris, qedges))
        .select("doc_id")
        .distinct()
    )


def polygon_within(
    tris: DataFrame, outer: list, holes: list | None = None
) -> DataFrame:
    """doc_ids whose shape lies WITHIN the query polygon: every row
    triangle has all 3 vertices covered by the query's triangle union
    AND no row edge properly crosses a query boundary edge (a convex
    row triangle with covered vertices can only escape the union by
    crossing its boundary)."""
    qtris, qedges = _query_geometry(outer, holes)
    row_pts = [
        (F.col("ax"), F.col("ay")),
        (F.col("bx"), F.col("by")),
        (F.col("cx"), F.col("cy")),
    ]
    covered = F.lit(True)
    for (xc, yc) in row_pts:
        in_any = F.lit(False)
        for qt in qtris:
            in_any = in_any | _pt_in_const_tri(xc, yc, qt)
        covered = covered & in_any
    row_edges = [
        (F.col("ax"), F.col("ay"), F.col("bx"), F.col("by")),
        (F.col("bx"), F.col("by"), F.col("cx"), F.col("cy")),
        (F.col("cx"), F.col("cy"), F.col("ax"), F.col("ay")),
    ]
    crosses = F.lit(False)
    for ((p1x, p1y), (p2x, p2y)) in qedges:
        q1x, q1y = F.lit(float(p1x)), F.lit(float(p1y))
        q2x, q2y = F.lit(float(p2x)), F.lit(float(p2y))
        for (x1, y1, x2, y2) in row_edges:
            crosses = crosses | _segs_cross_sql(x1, y1, x2, y2, q1x, q1y, q2x, q2y)
    # a query HOLE strictly inside the row triangle escapes both tests
    # above (vertices covered, no proper crossing) — any hole vertex
    # strictly interior to the row triangle disqualifies it
    hole_inside = F.lit(False)
    for hole in holes or []:
        ring = [tuple(map(float, p)) for p in hole]
        if len(ring) > 1 and ring[0] == ring[-1]:
            ring = ring[:-1]
        for (hx, hy) in ring:
            hole_inside = hole_inside | _pt_strictly_in_tri_sql(
                F.lit(hx), F.lit(hy)
            )
    tri_ok = (covered & ~crosses & ~hole_inside).cast("int")
    return (
        tris.groupBy("doc_id")
        .agg(F.min(tri_ok).alias("_all_in"))
        .filter(F.col("_all_in") == 1)
        .select("doc_id")
    )


def polygon_disjoint(
    tris: DataFrame, outer: list, holes: list | None = None
) -> DataFrame:
    """doc_ids whose shape is DISJOINT from the query polygon."""
    hit = polygon_intersects(tris, outer, holes)
    return tris.select("doc_id").distinct().join(hit, "doc_id", "left_anti")
