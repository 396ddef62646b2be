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
