"""Spherical (3D) geo predicates (spatial3d role, Geo3DPoint.java:38):
the cases that exist BECAUSE the planar model needs special-casing —
dateline-crossing polygons, pole-ringing polygons, near-antipodal
distances — plus agreement with the planar haversine where both apply."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search import geo3d


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, lat double, lon double")


def test_arc_distance_matches_haversine(spark):
    from lucene_spark.search.geo import haversine_meters

    df = _pts(
        spark,
        [(0, 48.85, 2.35), (1, -33.86, 151.21), (2, 35.68, 139.69), (3, 0.0, 0.0)],
    )
    got = df.select(
        "pid",
        geo3d.arc_distance_m(F.col("lat"), F.col("lon"), 40.71, -74.0).alias("d3"),
        haversine_meters(
            F.col("lat"), F.col("lon"), F.lit(40.71), F.lit(-74.0)
        ).alias("dh"),
    ).collect()
    for r in got:
        assert r["d3"] == pytest.approx(r["dh"], rel=1e-9)


def test_arc_distance_stable_near_antipode():
    # acos form loses precision at the antipode; atan2 form returns ~pi*R
    import math as m

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = _pts(spark, [(0, -10.0, 100.0)])
    d = df.select(
        geo3d.arc_distance_m(F.col("lat"), F.col("lon"), 10.0, -80.0).alias("d")
    ).collect()[0]["d"]
    assert d == pytest.approx(m.pi * geo3d.EARTH_RADIUS_M, rel=1e-6)


def test_polygon_dateline_no_special_case(spark):
    # a box-ish polygon spanning lon [170, -170] across the dateline
    poly = [(10.0, 170.0), (10.0, -170.0), (-10.0, -170.0), (-10.0, 170.0)]
    df = _pts(
        spark,
        [
            (0, 0.0, 179.0),     # inside, east of the dateline
            (1, 0.0, -179.0),    # inside, west of the dateline
            (2, 0.0, 160.0),     # outside (west of the box)
            (3, 20.0, 179.0),    # outside (north of the box)
        ],
    )
    got = {
        r["pid"]
        for r in df.filter(geo3d.polygon_contains(poly)).collect()
    }
    assert got == {0, 1}


def test_polygon_ringing_the_north_pole(spark):
    # four vertices at lat 80: the interior contains the pole — a case
    # with NO planar-polygon equivalent (every lon is inside)
    poly = [(80.0, 0.0), (80.0, 90.0), (80.0, 180.0), (80.0, -90.0)]
    df = _pts(
        spark,
        [(0, 89.9, 123.0), (1, 85.0, -45.0), (2, 70.0, 10.0), (3, -80.0, 0.0)],
    )
    got = {r["pid"] for r in df.filter(geo3d.polygon_contains(poly)).collect()}
    assert got == {0, 1}


def test_polygon_orientation_free_and_validates(spark):
    poly_ccw = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    poly_cw = list(reversed(poly_ccw))
    df = _pts(spark, [(0, 5.0, 5.0), (1, 20.0, 5.0)])
    for poly in (poly_ccw, poly_cw):
        got = {r["pid"] for r in df.filter(geo3d.polygon_contains(poly)).collect()}
        assert got == {0}
    with pytest.raises(ValueError):
        geo3d.polygon_contains([(0.0, 0.0), (1.0, 1.0)])


def test_circle_filter_membership(spark):
    df = _pts(spark, [(0, 0.0, 0.0), (1, 0.0, 5.0), (2, 0.0, 30.0)])
    # 5 degrees of arc ~ 556 km; radius 1000 km keeps pids 0 and 1
    got = {
        r["pid"]
        for r in geo3d.circle_filter(df, 0.0, 0.0, 1_000_000.0).collect()
    }
    assert got == {0, 1}


def test_path_corridor(spark):
    # equator path from lon 0 to lon 10; corridor width 200 km
    path = [(0.0, 0.0), (0.0, 10.0)]
    df = _pts(
        spark,
        [
            (0, 1.0, 5.0),    # ~111 km off the segment: inside
            (1, 3.0, 5.0),    # ~333 km off: outside
            (2, 0.5, -0.3),   # near the START endpoint: inside (endpoint arc)
            (3, 0.0, 12.0),   # 2 degrees past the END: ~222 km: outside
            (4, 0.0, 10.5),   # 0.5 degrees past the end: ~55 km: inside
        ],
    )
    got = {
        r["pid"]
        for r in geo3d.path_filter(df, path, 200_000.0).collect()
    }
    assert got == {0, 2, 4}
    with pytest.raises(ValueError):
        geo3d.path_distance_m([(0.0, 0.0)])


def test_path_cross_track_value(spark):
    # point 1 degree due north of the middle of an equatorial segment:
    # cross-track distance == one degree of arc
    path = [(0.0, 0.0), (0.0, 10.0)]
    df = _pts(spark, [(0, 1.0, 5.0)])
    d = df.select(geo3d.path_distance_m(path).alias("d")).collect()[0]["d"]
    one_deg = math.radians(1.0) * geo3d.EARTH_RADIUS_M
    assert d == pytest.approx(one_deg, rel=1e-6)


def test_vincenty_published_vectors():
    """WGS84 geodesic against the canonical published values: Vincenty's
    own test line (Flinders Peak -> Buninyong, 54,972.271 m), one degree
    of equatorial longitude (a*pi/180), the meridian degree at the
    equator (~110,574.4 m), and coincident points."""
    from lucene_spark.search.geo3d import WGS84_A, vincenty_np

    def dms(d, m, s):
        return d + m / 60 + s / 3600

    fl = (-dms(37, 57, 3.72030), dms(144, 25, 29.52440))
    bu = (-dms(37, 39, 10.15610), dms(143, 55, 35.38390))
    d = vincenty_np([fl[0]], [fl[1]], [bu[0]], [bu[1]])[0]
    assert d == pytest.approx(54972.271, abs=1e-3)
    eq = vincenty_np([0.0], [0.0], [0.0], [1.0])[0]
    assert eq == pytest.approx(WGS84_A * math.pi / 180.0, abs=1e-4)
    mer = vincenty_np([0.0], [0.0], [1.0], [0.0])[0]
    assert mer == pytest.approx(110574.4, abs=0.5)
    assert vincenty_np([10.0], [20.0], [10.0], [20.0])[0] == 0.0


def test_vincenty_udf_on_dataframe(spark):
    from lucene_spark.search.geo3d import vincenty_distance_udf, vincenty_np

    df = _pts(spark, [(0, 48.8566, 2.3522), (1, -33.8688, 151.2093)])
    d = vincenty_distance_udf()
    got = {
        r["pid"]: r["d"]
        for r in df.select(
            "pid",
            d(F.col("lat"), F.col("lon"), F.lit(40.7128), F.lit(-74.006)).alias("d"),
        ).collect()
    }
    exp = vincenty_np(
        [48.8566, -33.8688], [2.3522, 151.2093], [40.7128] * 2, [-74.006] * 2
    )
    assert got[0] == pytest.approx(exp[0], rel=1e-12)
    assert got[1] == pytest.approx(exp[1], rel=1e-12)
    # sanity: the WGS84 geodesic sits within the documented <0.35% band
    # of the mean-radius spherical distance (Paris-NYC: 5,852.9 km vs
    # 5,837.2 km spherical, +0.27%)
    spherical = 5_837_248.94
    assert abs(got[0] - spherical) / spherical < 0.0035
    assert got[0] > spherical  # mid-latitude geodesics run long


def _winding_inside(poly, lat, lon, reduced, omf):
    import math

    def red(la):
        p = math.radians(la)
        return math.atan2(omf * math.sin(p), math.cos(p))

    def tr(la):
        return red(la) if reduced else math.radians(la)

    p1, l1 = tr(lat), math.radians(lon)
    vr = [(tr(vl), math.radians(vn)) for vl, vn in poly]
    bs = []
    for p2, l2 in vr:
        dl = l2 - l1
        y = math.sin(dl) * math.cos(p2)
        x = math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl)
        bs.append(math.atan2(y, x))
    tot = 0.0
    for k in range(len(bs)):
        d = bs[(k + 1) % len(bs)] - bs[k]
        tot += d - 2 * math.pi * math.floor((d + math.pi) / (2 * math.pi))
    return abs(tot) > math.pi


def test_wgs84_polygon_membership_is_scale_invariant(spark):
    """The scaled-space theorem behind the reference's PlanetModel design
    (spatial3d/.../PlanetModel.java): an origin plane through two surface
    points contains a third point iff det(v1,v2,v3)=0; writing rows as
    (cos λ, sin λ, tan(lat)) and applying tanβ = (1-f)tanφ scales ONE
    COLUMN uniformly by (1-f) > 0, so the determinant's sign — and hence
    SidedPlane/polygon membership — is IDENTICAL on the sphere and on any
    ellipsoid z-scaling. planet_model='wgs84' computes the membership
    explicitly in reduced coordinates and must therefore agree with the
    sphere path EVERYWHERE, including the edge-crest boundary where any
    error would first show; the former 'sub-0.35% boundary band' fence
    was conservative — for origin-plane polygon membership the band is
    exactly zero (distance shapes — circles, paths — are where the
    ellipsoid genuinely differs, handled by vincenty_np)."""
    import numpy as np

    from lucene_spark.search import geo3d

    poly = [(38.0, -10.0), (38.0, 25.0), (52.0, 25.0), (52.0, -10.0)]
    omf = 1.0 - geo3d.WGS84_F

    # python replica: bisect the boundary under both models — equal to
    # double precision (the lat-38 edge crests ~39.324 at mid-lon)
    def boundary(reduced):
        lo, hi = 39.0, 40.0  # outside at lo, inside at hi
        for _ in range(60):
            mid = (lo + hi) / 2
            if _winding_inside(poly, mid, 7.5, reduced, omf):
                hi = mid
            else:
                lo = mid
        return (lo + hi) / 2

    b_sph, b_ell = boundary(False), boundary(True)
    assert abs(b_ell - b_sph) < 1e-12, (b_sph, b_ell)
    assert 39.3 < b_sph < 39.35  # the edge genuinely bulges poleward

    # Spark: dense ladder across the boundary + random cloud — the two
    # model paths agree row for row
    rng = np.random.default_rng(11)
    pts = [(float(b_sph + d), 7.5) for d in np.linspace(-0.01, 0.01, 21)]
    pts += [(float(30 + 30 * rng.random()), float(-20 + 55 * rng.random()))
            for _ in range(300)]
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(pts)],
        "id long, lat double, lon double",
    )
    rows = df.select(
        geo3d.polygon_contains(poly).alias("sph"),
        geo3d.polygon_contains(poly, planet_model="wgs84").alias("ell"),
    ).collect()
    assert all(r["sph"] == r["ell"] for r in rows)
    assert any(r["sph"] for r in rows) and not all(r["sph"] for r in rows)


def test_wgs84_membership_matches_independent_numpy(spark):
    """The Column-side reduced-latitude winding equals an independent
    numpy recomputation (different substrate, same published math)."""
    import math

    import numpy as np

    from lucene_spark.search import geo3d

    poly = [(38.0, -10.0), (38.0, 25.0), (52.0, 25.0), (52.0, -10.0)]
    rng = np.random.default_rng(5)
    pts = [(float(37 + 16 * rng.random()), float(-12 + 40 * rng.random()))
           for _ in range(200)]
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(pts)],
        "id long, lat double, lon double",
    )
    got = {
        r["id"]: r["inside"]
        for r in df.select(
            "id",
            geo3d.polygon_contains(poly, planet_model="wgs84").alias("inside"),
        ).collect()
    }
    omf = 1.0 - geo3d.WGS84_F

    def red(lat):
        p = math.radians(lat)
        return math.atan2(omf * math.sin(p), math.cos(p))

    def bearing(p1, l1, p2, l2):
        dl = l2 - l1
        y = math.sin(dl) * math.cos(p2)
        x = math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl)
        return math.atan2(y, x)

    vr = [(red(vl), math.radians(vn)) for vl, vn in poly]
    for i, (la, lo) in enumerate(pts):
        p1, l1 = red(la), math.radians(lo)
        bs = [bearing(p1, l1, p2, l2) for p2, l2 in vr]
        tot = 0.0
        for k in range(len(bs)):
            d = bs[(k + 1) % len(bs)] - bs[k]
            tot += d - 2 * math.pi * math.floor((d + math.pi) / (2 * math.pi))
        assert got[i] == (abs(tot) > math.pi), (la, lo)
