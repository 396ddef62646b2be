"""Spherical (3D) geo predicates — the reference's spatial3d role
(``spatial3d/.../Geo3DPoint.java:38``, ``GeoStandardCircle``,
``GeoStandardPath``, ``GeoPolygonFactory``): points live on the unit
sphere as (x, y, z) and every predicate is spherical-geometry math, so
the dateline and the poles need NO special cases — the reason the
reference keeps a 3D module next to the planar LatLon one (whose box
splitting and planar polygon tests this package's ``geo.py`` mirrors).

PlanetModel: the PREDICATES run on SPHERE (the reference's
``PlanetModel.SPHERE``; every published geo3d predicate has the same
shape on the sphere, and the ellipsoid deltas are <0.35% of distance).
Mean radius matches ``geo.py``'s haversine (6371008.7714 m). For
ellipsoid-exact DISTANCE, ``vincenty_np`` / ``vincenty_distance_udf``
implement the published Vincenty inverse on WGS84 (validated against
Vincenty's own test line to the millimeter).  Membership SHAPES built
from origin planes (polygons) need no ellipsoid variant at all — the
scaled-space plane test is provably invariant under the z-scaling that
maps the WGS84 surface to the sphere (``polygon_contains`` exposes the
explicit ``planet_model="wgs84"`` reduced-latitude path and a test pins
the sphere/ellipsoid agreement) — so the ONLY shapes where the
ellipsoid genuinely changes answers are distance-based (circles,
paths), where Vincenty supplies the exact geodesic.

Everything is a Column expression (sin/cos/atan2 inside whole-stage
codegen — no Python at query time), so predicates push into the scan
stage like the planar ones, and the DuckDB oracles replay the same
formulas:

- ``arc_distance_m``: great-circle distance via the atan2 form
  (numerically stable at antipodes where acos saturates);
- ``circle_filter``: GeoStandardCircle membership = distance <= radius;
- ``polygon_contains``: spherical winding number — the sum of wrapped
  initial-bearing deltas from the test point to the polygon's vertices
  is ±2π inside and 0 outside. Valid for simple (non-self-crossing)
  polygons whose interior does not contain the test point's antipode;
  vertices in either orientation (the |sum| test is orientation-free).
- ``path_distance_m``: GeoStandardPath's distance to a polyline of
  great-circle segments — cross-track distance where the projection
  falls inside a segment, else the nearer endpoint arc.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "EARTH_RADIUS_M",
    "arc_distance_m",
    "circle_filter",
    "polygon_contains",
    "path_distance_m",
    "path_filter",
    "WGS84_A",
    "WGS84_B",
    "WGS84_F",
    "vincenty_np",
    "vincenty_distance_udf",
]

EARTH_RADIUS_M = 6371008.7714


def _rad(c) -> Column:
    return F.radians(c) if not isinstance(c, (int, float)) else F.lit(math.radians(c))


def arc_distance_m(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in meters, atan2 form: stable everywhere
    incl. near-antipodal pairs (acos'ing a dot product is not)."""
    p1, l1, p2, l2 = _rad(lat1), _rad(lon1), _rad(lat2), _rad(lon2)
    dl = l2 - l1
    y = F.sqrt(
        F.pow(F.cos(p2) * F.sin(dl), F.lit(2.0))
        + F.pow(
            F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl),
            F.lit(2.0),
        )
    )
    x = F.sin(p1) * F.sin(p2) + F.cos(p1) * F.cos(p2) * F.cos(dl)
    return F.atan2(y, x) * F.lit(EARTH_RADIUS_M)


def circle_filter(
    df: DataFrame,
    center_lat: float,
    center_lon: float,
    radius_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    dist_col: str | None = None,
) -> DataFrame:
    """GeoStandardCircle membership (spatial3d's distance query)."""
    d = arc_distance_m(F.col(lat_col), F.col(lon_col), center_lat, center_lon)
    if dist_col is not None:
        df = df.withColumn(dist_col, d)
        return df.filter(F.col(dist_col) <= F.lit(radius_m))
    return df.filter(d <= F.lit(radius_m))


def _bearing(lat_c, lon_c, vlat: float, vlon: float) -> Column:
    """Initial great-circle bearing FROM the (column) point TO the fixed
    vertex, in radians in (-pi, pi]."""
    p1, l1 = _rad(lat_c), _rad(lon_c)
    p2, l2 = math.radians(vlat), math.radians(vlon)
    dl = F.lit(l2) - l1
    y = F.sin(dl) * F.lit(math.cos(p2))
    x = F.cos(p1) * F.lit(math.sin(p2)) - F.sin(p1) * F.lit(math.cos(p2)) * F.cos(dl)
    return F.atan2(y, x)


_TWO_PI = 2.0 * math.pi


def _wrap(a: Column) -> Column:
    """Wrap an angle difference into (-pi, pi]."""
    return a - F.lit(_TWO_PI) * F.floor((a + F.lit(math.pi)) / F.lit(_TWO_PI))


def _reduced_lat(lat_col: Column) -> Column:
    """Geodetic -> reduced (parametric) latitude on WGS84, degrees.

    beta = atan2((1-f)*sin(phi), cos(phi)) — stable at the poles.  The
    z-scaling that maps the WGS84 ellipsoid onto the sphere of radius a
    (the reference's ``PlanetModel`` scaled space, ``spatial3d/.../
    PlanetModel.java``) sends a geodetic surface point to exactly this
    latitude, and planes through the origin map to planes, so
    great-circle membership in reduced coordinates IS the ellipsoid
    membership the scaled-space plane test computes."""
    phi = _rad(lat_col)
    return F.degrees(F.atan2(F.lit(1.0 - WGS84_F) * F.sin(phi), F.cos(phi)))


def _reduced_lat_deg(lat: float) -> float:
    phi = math.radians(lat)
    return math.degrees(
        math.atan2((1.0 - WGS84_F) * math.sin(phi), math.cos(phi))
    )


def polygon_contains(
    vertices: list[tuple[float, float]],
    lat_col="lat",
    lon_col="lon",
    planet_model: str = "sphere",
) -> Column:
    """Boolean Column: point inside the simple polygon.

    Winding test: sum over edges of the wrapped change in initial
    bearing from the point to consecutive vertices — |sum| ≈ 2π inside,
    ≈ 0 outside (threshold π, maximally far from both). No dateline or
    pole special-casing: bearings are intrinsic to the sphere.

    ``planet_model="sphere"`` (default) is the reference's
    ``PlanetModel.SPHERE``.  ``"wgs84"`` evaluates membership ON THE
    ELLIPSOID: both the point and the vertices move to reduced latitude
    (the scaled space where the WGS84 surface becomes a sphere and the
    scaled-space edge planes become great circles), then the same
    winding test runs.  For origin-plane polygon membership the two
    models provably AGREE everywhere — an origin-plane determinant with
    rows (cos λ, sin λ, tan lat) scales one column uniformly under
    tanβ = (1-f)tanφ, preserving its sign — which is exactly why the
    reference gets identical polygon answers from ``PlanetModel.SPHERE``
    and ``PlanetModel.WGS84`` (test-pinned); the ellipsoid genuinely
    differs only for DISTANCE-based shapes (circles, paths), where
    :func:`vincenty_np` supplies the exact geodesic.
    """
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    if planet_model not in ("sphere", "wgs84"):
        raise ValueError("planet_model must be 'sphere' or 'wgs84'")
    lat_c, lon_c = F.col(lat_col), F.col(lon_col)
    verts = vertices
    if planet_model == "wgs84":
        lat_c = _reduced_lat(lat_c)
        verts = [(_reduced_lat_deg(vlat), vlon) for vlat, vlon in vertices]
    bearings = [_bearing(lat_c, lon_c, vlat, vlon) for vlat, vlon in verts]
    total = None
    for i in range(len(bearings)):
        step = _wrap(bearings[(i + 1) % len(bearings)] - bearings[i])
        total = step if total is None else total + step
    return F.abs(total) > F.lit(math.pi)


def path_distance_m(
    points: list[tuple[float, float]],
    lat_col="lat",
    lon_col="lon",
) -> Column:
    """Distance in meters from the (column) point to a polyline of
    great-circle segments (GeoStandardPath's metric): per segment the
    cross-track distance |asin(sin(d13) * sin(b13 - b12))| when the
    along-track projection falls inside the segment, else the nearer
    endpoint arc; the path distance is the minimum over segments."""
    if len(points) < 2:
        raise ValueError("path needs >= 2 points")
    lat_c, lon_c = F.col(lat_col), F.col(lon_col)
    best = None
    for (alat, alon), (blat, blon) in zip(points, points[1:]):
        d_ap = arc_distance_m(F.lit(alat), F.lit(alon), lat_c, lon_c) / F.lit(
            EARTH_RADIUS_M
        )  # radians from segment start A to the point
        d_bp = arc_distance_m(F.lit(blat), F.lit(blon), lat_c, lon_c)
        d_ab = math.radians(
            _arc_deg(alat, alon, blat, blon)
        )  # segment length, radians (python float)
        # bearings FROM A: to the point and to B
        b_ap = _bearing_from_fixed(alat, alon, lat_c, lon_c)
        b_ab = math.radians(_bearing_deg(alat, alon, blat, blon))
        xt = F.asin(F.sin(d_ap) * F.sin(b_ap - F.lit(b_ab)))  # cross-track
        at = F.acos(
            F.greatest(
                F.lit(-1.0), F.least(F.lit(1.0), F.cos(d_ap) / F.cos(xt))
            )
        )  # along-track
        seg = F.when(
            (F.cos(b_ap - F.lit(b_ab)) > F.lit(0.0)) & (at <= F.lit(d_ab)),
            F.abs(xt) * F.lit(EARTH_RADIUS_M),
        ).otherwise(
            F.least(d_ap * F.lit(EARTH_RADIUS_M), d_bp)
        )
        best = seg if best is None else F.least(best, seg)
    return best


def path_filter(
    df: DataFrame,
    points: list[tuple[float, float]],
    width_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    dist_col: str | None = None,
) -> DataFrame:
    """Geo3DPoint.newPathQuery: points within ``width_m`` of the path."""
    d = path_distance_m(points, lat_col, lon_col)
    if dist_col is not None:
        df = df.withColumn(dist_col, d)
        return df.filter(F.col(dist_col) <= F.lit(width_m))
    return df.filter(d <= F.lit(width_m))


# ------------------------------------------------- python-float helpers


def _arc_deg(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Great-circle arc between two FIXED points, in DEGREES (callers
    convert back with math.radians — keeps the two fixed-point helpers
    symmetric)."""
    p1, l1, p2, l2 = map(math.radians, (lat1, lon1, lat2, lon2))
    dl = l2 - l1
    y = math.sqrt(
        (math.cos(p2) * math.sin(dl)) ** 2
        + (math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl))
        ** 2
    )
    x = math.sin(p1) * math.sin(p2) + math.cos(p1) * math.cos(p2) * math.cos(dl)
    return math.degrees(math.atan2(y, x))


def _bearing_deg(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    p1, l1, p2, l2 = map(math.radians, (lat1, lon1, lat2, lon2))
    dl = l2 - l1
    y = math.sin(dl) * math.cos(p2)
    x = math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl)
    return math.degrees(math.atan2(y, x))


def _bearing_from_fixed(alat: float, alon: float, lat_c, lon_c) -> Column:
    """Initial bearing FROM the fixed point A TO the (column) point."""
    p1, l1 = math.radians(alat), math.radians(alon)
    p2, l2 = _rad(lat_c), _rad(lon_c)
    dl = l2 - F.lit(l1)
    y = F.sin(dl) * F.cos(p2)
    x = F.lit(math.cos(p1)) * F.sin(p2) - F.lit(math.sin(p1)) * F.cos(p2) * F.cos(dl)
    return F.atan2(y, x)


# ------------------------------------------ WGS84 geodesic (ellipsoid)

WGS84_A = 6378137.0
WGS84_B = 6356752.314245
WGS84_F = 1.0 / 298.257223563


def vincenty_np(lat1, lon1, lat2, lon2, max_iter: int = 200, tol: float = 1e-12):
    """Vectorized Vincenty inverse: WGS84 geodesic distance in meters
    (T. Vincenty, Survey Review 1975 — the published iteration). Shrinks
    the sphere-model fence: the spherical predicates above stay the
    query path (deltas < 0.35% of distance), this gives the
    ellipsoid-exact DISTANCE where it matters (measurement, ranking by
    true geodesic). Near-antipodal pairs that fail to converge fall back
    to the spherical arc (flagged by the iteration mask), and coincident
    points return 0."""
    import numpy as np

    lat1, lon1, lat2, lon2 = (
        np.asarray(x, dtype=np.float64) for x in (lat1, lon1, lat2, lon2)
    )
    f = WGS84_F
    U1 = np.arctan((1 - f) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1 - f) * np.tan(np.radians(lat2)))
    L = np.radians(lon2 - lon1)
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    converged = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos2sm = np.zeros_like(lam)
    for _ in range(max_iter):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sigma = np.sqrt(
            (cosU2 * sin_lam) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam) ** 2
        )
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sigma = np.arctan2(sin_sigma, cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(
                sin_sigma > 0, cosU1 * cosU2 * sin_lam / sin_sigma, 0.0
            )
        cos_sq_alpha = 1.0 - sin_alpha**2
        with np.errstate(divide="ignore", invalid="ignore"):
            cos2sm = np.where(
                cos_sq_alpha > 0,
                cos_sigma - 2.0 * sinU1 * sinU2 / cos_sq_alpha,
                0.0,  # equatorial line
            )
        C = f / 16.0 * cos_sq_alpha * (4.0 + f * (4.0 - 3.0 * cos_sq_alpha))
        lam_new = L + (1.0 - C) * f * sin_alpha * (
            sigma
            + C
            * sin_sigma
            * (cos2sm + C * cos_sigma * (-1.0 + 2.0 * cos2sm**2))
        )
        newly = np.abs(lam_new - lam) < tol
        lam = np.where(converged, lam, lam_new)
        converged |= newly
        if converged.all():
            break

    u_sq = cos_sq_alpha * (WGS84_A**2 - WGS84_B**2) / WGS84_B**2
    A = 1.0 + u_sq / 16384.0 * (
        4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq))
    )
    Bc = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta_sigma = (
        Bc
        * sin_sigma
        * (
            cos2sm
            + Bc
            / 4.0
            * (
                cos_sigma * (-1.0 + 2.0 * cos2sm**2)
                - Bc
                / 6.0
                * cos2sm
                * (-3.0 + 4.0 * sin_sigma**2)
                * (-3.0 + 4.0 * cos2sm**2)
            )
        )
    )
    s = WGS84_B * A * (sigma - delta_sigma)
    # spherical fallback where the iteration did not converge
    if not converged.all():
        import math as m

        p1, l1r, p2, l2r = (
            np.radians(lat1),
            np.radians(lon1),
            np.radians(lat2),
            np.radians(lon2),
        )
        dl = l2r - l1r
        y = np.sqrt(
            (np.cos(p2) * np.sin(dl)) ** 2
            + (np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl)) ** 2
        )
        x = np.sin(p1) * np.sin(p2) + np.cos(p1) * np.cos(p2) * np.cos(dl)
        s = np.where(converged, s, np.arctan2(y, x) * EARTH_RADIUS_M)
    return np.where(sin_sigma == 0, 0.0, s)


def vincenty_distance_udf():
    """Arrow-batched pandas UDF: (lat1, lon1, lat2, lon2) columns ->
    WGS84 geodesic meters. The iterative solver can't be a codegen
    Column expression; Arrow batching keeps it off the slow row path."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _d(lat1, lon1, lat2, lon2):
        import pandas as pd

        return pd.Series(
            vincenty_np(
                lat1.to_numpy(), lon1.to_numpy(), lat2.to_numpy(), lon2.to_numpy()
            )
        )

    return _d
