"""Geo-spatial predicates: the LatLonPoint / LatLonDocValuesField family.

Spark-native re-expression of the reference's geo queries
(``document/LatLonPoint.java`` — ``newBoxQuery`` ``:214``,
``newDistanceQuery`` ``:243``; ``document/LatLonDocValuesField.java``
``newDistanceSort``; ``util/SloppyMath.java:47`` ``haversinMeters``):

- the reference encodes (lat, lon) into a 2D BKD tree and walks cells;
  Catalyst's parquet min/max pruning + predicate pushdown plays the BKD
  role here, so a box query is a pure comparison filter that reaches the
  scan, and a distance query is the reference's own two-phase shape — a
  cheap bounding-box pre-filter (pushdown-able comparisons) followed by
  the exact haversine test only on box survivors
  (``LatLonPointDistanceQuery``'s distancePredicate does the same);
- distances are great-circle meters on the mean-radius sphere
  (R = 6371008.7714 m, ``SloppyMath.TO_METERS``); we use the exact
  haversine rather than the reference's table-interpolated cos/asin
  (SloppyMath trades <1e-4 relative error for speed; JVM trig is already
  vectorized here, and the error model is simpler to document);
- boxes crossing the dateline (min_lon > max_lon) split into the union of
  two lon ranges, matching ``LatLonPoint.newBoxQuery``'s crossing case.

All functions take/return DataFrames with plain double lat/lon columns —
degrees, WGS84-agnostic spherical model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "EARTH_MEAN_RADIUS_METERS",
    "haversine_meters",
    "box_filter",
    "distance_filter",
    "distance_topk",
    "polygon_filter",
    "polygon_contains_sql",
    "multi_polygon_filter",
    "multi_polygon_contains_sql",
]

#: util/SloppyMath.java TO_METERS: mean earth radius in meters
EARTH_MEAN_RADIUS_METERS = 6371008.7714


def haversine_meters(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters (haversine on the mean-radius
    sphere; SloppyMath.java:47 haversinMeters semantics, exact trig)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = (
        F.pow(F.sin(dlat / F.lit(2.0)), F.lit(2.0))
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / F.lit(2.0)), F.lit(2.0))
    )
    return (
        F.lit(2.0 * EARTH_MEAN_RADIUS_METERS) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))
    )


def box_filter(
    points: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """LatLonPoint.newBoxQuery (LatLonPoint.java:214): inclusive bounding
    box; min_lon > max_lon means the box crosses the dateline and matches
    the union of [min_lon, 180] and [-180, max_lon]."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    pred = (lat >= min_lat) & (lat <= max_lat)
    if min_lon <= max_lon:
        pred = pred & (lon >= min_lon) & (lon <= max_lon)
    else:  # dateline crossing
        pred = pred & ((lon >= min_lon) | (lon <= max_lon))
    return points.filter(pred)


def _bounding_box(lat: float, lon: float, radius_m: float):
    """Conservative lat/lon bounds containing the radius circle (the
    pre-filter rectangle; GeoUtils.java Rectangle.fromPointDistance)."""
    import math

    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_METERS)
    min_lat, max_lat = lat - dlat, lat + dlat
    if min_lat <= -90.0 or max_lat >= 90.0:  # pole inside radius: all lons
        return max(min_lat, -90.0), min(max_lat, 90.0), -180.0, 180.0
    # widest lon delta occurs at the latitude extreme closer to the pole
    cos_min = min(
        math.cos(math.radians(min_lat)), math.cos(math.radians(max_lat))
    )
    dlon = math.degrees(radius_m / (EARTH_MEAN_RADIUS_METERS * cos_min))
    if dlon >= 180.0:  # circle spans every longitude at some latitude
        return min_lat, max_lat, -180.0, 180.0
    return min_lat, max_lat, lon - dlon, lon + dlon


def distance_filter(
    points: DataFrame,
    lat: float,
    lon: float,
    radius_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    dist_col: str | None = "dist_m",
) -> DataFrame:
    """LatLonPoint.newDistanceQuery (LatLonPoint.java:243): docs within
    radius_m meters of (lat, lon). Two-phase like the reference: a
    pushdown-able box comparison prunes first, haversine verifies.
    Appends the exact distance as ``dist_col`` unless None."""
    min_lat, max_lat, min_lon, max_lon = _bounding_box(lat, lon, radius_m)
    la, lo = F.col(lat_col), F.col(lon_col)
    lat_pred = (la >= min_lat) & (la <= max_lat)
    if min_lon >= -180.0 and max_lon <= 180.0:
        lon_pred = (lo >= min_lon) & (lo <= max_lon)
    else:
        # circle crosses the antimeridian: wrap the overflowing bound and
        # match the union of the two ranges (GeoUtils Rectangle crossing
        # case — same shape as box_filter's min_lon > max_lon branch)
        wrapped_min = min_lon + 360.0 if min_lon < -180.0 else min_lon
        wrapped_max = max_lon - 360.0 if max_lon > 180.0 else max_lon
        lon_pred = (lo >= wrapped_min) | (lo <= wrapped_max)
    boxed = points.filter(lat_pred & lon_pred)
    d = haversine_meters(F.lit(float(lat)), F.lit(float(lon)), la, lo)
    out = boxed.filter(d <= float(radius_m))
    if dist_col is not None:
        out = out.withColumn(dist_col, d)
    return out


def _closed_edges(vertices: list[tuple[float, float]]):
    """Edge list of the closed ring (last vertex joined back to the first);
    horizontal edges dropped — they can never satisfy the crossing test's
    straddle condition and would divide by zero."""
    if len(vertices) < 3:
        raise ValueError("a polygon needs at least 3 vertices")
    ring = list(vertices)
    if ring[0] != ring[-1]:
        ring.append(ring[0])
    return [
        ((y1, x1), (y2, x2))
        for (y1, x1), (y2, x2) in zip(ring, ring[1:])
        if y1 != y2
    ]


def polygon_filter(
    vertices: list[tuple[float, float]],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> Column:
    """LatLonPoint.newPolygonQuery (LatLonPoint.java:271) predicate: point
    in a simple (non-self-intersecting, non-dateline-crossing) polygon.

    The reference walks BKD cells against a ``geo/Polygon.java`` edge tree
    (``Component2D.contains``); here the polygon is a query-time literal,
    so the whole test compiles into ONE codegen expression — a bounding-box
    comparison (pushdown-able, the Component2D bbox short-circuit) AND an
    unrolled crossing-number (ray-cast) sum over the polygon's edges. No
    UDF, no shuffle; every arithmetic op is IEEE double +,-,*,/ so an
    oracle that mirrors the operation order reproduces it bit-exactly
    (see ``polygon_contains_sql``).

    Vertices are (lat, lon) pairs; the ring closes itself.
    """
    edges = _closed_edges(vertices)
    lat, lon = F.col(lat_col), F.col(lon_col)
    lats = [v[0] for v in vertices]
    lons = [v[1] for v in vertices]
    bbox = (
        (lat >= min(lats)) & (lat <= max(lats))
        & (lon >= min(lons)) & (lon <= max(lons))
    )
    crossings: Column | None = None
    for (y1, x1), (y2, x2) in edges:
        straddle = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        # x of the edge at the point's latitude; operand order mirrored in
        # polygon_contains_sql so both engines run the identical IEEE ops
        xint = F.lit(x1) + (F.lit(x2) - F.lit(x1)) * (lat - F.lit(y1)) / (
            F.lit(y2) - F.lit(y1)
        )
        c = F.when(straddle & (lon < xint), F.lit(1)).otherwise(F.lit(0))
        crossings = c if crossings is None else crossings + c
    return bbox & (crossings % 2 == 1)


def polygon_contains_sql(
    vertices: list[tuple[float, float]],
    lat_expr: str = "lat",
    lon_expr: str = "lon",
) -> str:
    """ANSI-SQL twin of ``polygon_filter`` with the same literals and the
    same operation order (for DuckDB oracles and plain-SQL callers)."""
    edges = _closed_edges(vertices)
    lats = [v[0] for v in vertices]
    lons = [v[1] for v in vertices]
    terms = []
    for (y1, x1), (y2, x2) in edges:
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat_expr}) <> ({y2!r} > {lat_expr})) "
            f"AND ({lon_expr} < {x1!r} + ({x2!r} - {x1!r}) * "
            f"({lat_expr} - {y1!r}) / ({y2!r} - {y1!r})) THEN 1 ELSE 0 END)"
        )
    bbox = (
        f"{lat_expr} >= {min(lats)!r} AND {lat_expr} <= {max(lats)!r} "
        f"AND {lon_expr} >= {min(lons)!r} AND {lon_expr} <= {max(lons)!r}"
    )
    return f"({bbox} AND ({' + '.join(terms)}) % 2 = 1)"


def multi_polygon_filter(
    polygons: list[tuple[list[tuple[float, float]], list[list[tuple[float, float]]]]],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> Column:
    """LatLonPoint.newPolygonQuery(field, Polygon...) with holes
    (``geo/Polygon.java:63`` — the ``Polygon(lats, lons, Polygon... holes)``
    constructor; ``Component2D.contains`` treats hole interiors as outside).

    ``polygons`` is a list of components, each ``(shell, holes)`` where
    ``shell`` is a (lat, lon) vertex ring and ``holes`` a list of rings.
    A point matches when it lies inside ANY component's shell and inside
    NONE of that component's holes. Still one codegen expression — the
    union / exclusion composes the per-ring crossing-number tests with
    boolean algebra, no UDF, no shuffle.
    """
    if not polygons:
        raise ValueError("need at least one polygon component")
    pred: Column | None = None
    for shell, holes in polygons:
        comp = polygon_filter(shell, lat_col, lon_col)
        for hole in holes:
            comp = comp & ~polygon_filter(hole, lat_col, lon_col)
        pred = comp if pred is None else pred | comp
    return pred


def multi_polygon_contains_sql(
    polygons: list[tuple[list[tuple[float, float]], list[list[tuple[float, float]]]]],
    lat_expr: str = "lat",
    lon_expr: str = "lon",
) -> str:
    """ANSI-SQL twin of ``multi_polygon_filter`` — same literals, same
    operation order per ring (for DuckDB oracles and plain-SQL callers)."""
    if not polygons:
        raise ValueError("need at least one polygon component")
    comps = []
    for shell, holes in polygons:
        parts = [polygon_contains_sql(shell, lat_expr, lon_expr)]
        parts.extend(
            f"NOT {polygon_contains_sql(h, lat_expr, lon_expr)}" for h in holes
        )
        comps.append("(" + " AND ".join(parts) + ")")
    return "(" + " OR ".join(comps) + ")"


def distance_topk(
    points: DataFrame,
    lat: float,
    lon: float,
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "id",
    dist_col: str = "dist_m",
) -> DataFrame:
    """Nearest-k by great-circle distance (LatLonDocValuesField
    newDistanceSort + FieldDoc top-k): ORDER BY distance, id LIMIT k —
    Spark's TakeOrderedAndProject keeps this a per-partition heap + tiny
    driver merge, no full sort."""
    d = haversine_meters(
        F.lit(float(lat)), F.lit(float(lon)), F.col(lat_col), F.col(lon_col)
    )
    return (
        points.withColumn(dist_col, d)
        .orderBy(F.asc(dist_col), F.asc(id_col))
        .limit(k)
    )


def range_field_filter(
    df: DataFrame,
    dims: list[tuple[str, str]],
    relation: str,
    query_min: list[float],
    query_max: list[float],
) -> DataFrame:
    """RangeFieldQuery.QueryType relations over n-dimensional stored
    ranges (``document/RangeFieldQuery.java:75-270``) — each doc row
    carries per-dim [min, max] columns; the four relations against the
    query box, per the reference's per-doc ``matches``:

    - INTERSECTS (:104-115): every dim, q.max >= doc.min AND q.min <= doc.max
    - WITHIN (:147-158): doc inside query — q.min <= doc.min AND q.max >= doc.max
    - CONTAINS (:190-201): doc contains query — doc.min <= q.min AND doc.max >= q.max
    - CROSSES (:259-269): INTERSECTS AND NOT WITHIN

    Pure comparison predicates — pushdown-able; Catalyst's parquet
    min/max pruning plays the BKD tree's interior-node compare role.
    """
    rel = relation.upper()

    def _conj(pred_per_dim):
        conds = [
            pred_per_dim(F.col(lo), F.col(hi), F.lit(qlo), F.lit(qhi))
            for (lo, hi), qlo, qhi in zip(dims, query_min, query_max)
        ]
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    intersects = _conj(lambda dlo, dhi, qlo, qhi: (qhi >= dlo) & (qlo <= dhi))
    within = _conj(lambda dlo, dhi, qlo, qhi: (qlo <= dlo) & (qhi >= dhi))
    contains = _conj(lambda dlo, dhi, qlo, qhi: (dlo <= qlo) & (dhi >= qhi))
    preds = {
        "INTERSECTS": intersects,
        "WITHIN": within,
        "CONTAINS": contains,
        "CROSSES": intersects & ~within,
    }
    if rel not in preds:
        raise ValueError(f"unknown RangeFieldQuery relation: {relation}")
    return df.filter(preds[rel])


def lat_lon_bounding_box(
    df: DataFrame,
    relation: str,
    min_lat: float,
    min_lon: float,
    max_lat: float,
    max_lon: float,
    cols: tuple[str, str, str, str] = ("min_lat", "max_lat", "min_lon", "max_lon"),
) -> DataFrame:
    """LatLonBoundingBox queries
    (``sandbox/document/LatLonBoundingBox.java:142-209``:
    newIntersectsQuery / newWithinQuery / newContainsQuery /
    newCrossesQuery) — the 2D LatLon instance of the range field."""
    lat_lo, lat_hi, lon_lo, lon_hi = cols
    return range_field_filter(
        df,
        [(lat_lo, lat_hi), (lon_lo, lon_hi)],
        relation,
        [min_lat, min_lon],
        [max_lat, max_lon],
    )
