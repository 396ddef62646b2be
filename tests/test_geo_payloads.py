"""Geo (LatLonPoint family) and payload (PayloadScoreQuery) unit tests.

The driver-contract oracle pairs (geo_box_query, geo_distance_query,
payload_score_query, point_in_set_query) are covered by the registry
replica in tests/test_entry.py; these tests pin the operator semantics on
small hand-built frames — dateline boxes, pole-crossing radii, haversine
vs an independent numpy computation, DelimitedPayloadTokenFilter parsing,
and each PayloadFunction fold.
"""

import math

import pytest
from pyspark.sql import Row, functions as F

from lucene_spark.search import geo, payloads as P


def _pts(spark, rows):
    return spark.createDataFrame([Row(id=i, lat=a, lon=o) for i, (a, o) in enumerate(rows)])


def test_box_plain_and_dateline(spark):
    pts = _pts(spark, [(0.0, 0.0), (10.0, 170.0), (-10.0, -170.0), (50.0, 170.0), (0.0, 100.0)])
    plain = geo.box_filter(pts, -20.0, 20.0, -30.0, 30.0)
    assert {r.id for r in plain.collect()} == {0}
    # crossing box: lon >= 160 OR lon <= -160, lat in [-20, 20]
    cross = geo.box_filter(pts, -20.0, 20.0, 160.0, -160.0)
    assert {r.id for r in cross.collect()} == {1, 2}


def test_haversine_matches_numpy(spark):
    rows = [(48.8566, 2.3522), (40.7128, -74.0060), (-33.8688, 151.2093)]
    pts = _pts(spark, rows)
    qlat, qlon = 51.5074, -0.1278  # London
    got = {
        r.id: r.d
        for r in pts.select(
            "id",
            geo.haversine_meters(
                F.lit(qlat), F.lit(qlon), F.col("lat"), F.col("lon")
            ).alias("d"),
        ).collect()
    }

    def hav(lat2, lon2):
        R = geo.EARTH_MEAN_RADIUS_METERS
        p1, p2 = math.radians(qlat), math.radians(lat2)
        dphi = math.radians(lat2 - qlat)
        dl = math.radians(lon2 - qlon)
        h = math.sin(dphi / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return 2 * R * math.asin(min(1.0, math.sqrt(h)))

    for i, (la, lo) in enumerate(rows):
        assert got[i] == pytest.approx(hav(la, lo), rel=1e-12)
    # sanity: Paris ~343km from London on the mean sphere
    assert 330_000 < got[0] < 360_000


def test_distance_filter_pole_box(spark):
    # radius circle containing the north pole must widen to all longitudes
    pts = _pts(spark, [(89.0, 10.0), (89.0, -170.0), (80.0, 10.0)])
    hits = geo.distance_filter(pts, 89.5, 0.0, 300_000.0, dist_col=None)
    assert {r.id for r in hits.collect()} == {0, 1}


def test_distance_topk_order(spark):
    pts = _pts(spark, [(0.0, 1.0), (0.0, 3.0), (0.0, 2.0), (0.0, 0.5)])
    got = geo.distance_topk(pts, 0.0, 0.0, k=3).select("id").collect()
    assert [r.id for r in got] == [3, 0, 2]


def test_delimited_payload_parsing(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="alpha|1.5 beta gamma|0.25"), Row(doc_id=1, text="x|2")]
    )
    rows = {
        (r.doc_id, r.pos): (r.term, r.payload)
        for r in P.delimited_payload_table(docs).collect()
    }
    assert rows[(0, 0)] == ("alpha", 1.5)
    assert rows[(0, 1)] == ("beta", None)  # no delimiter -> no payload
    assert rows[(0, 2)] == ("gamma", 0.25)
    assert rows[(1, 0)] == ("x", 2.0)


def test_payload_functions_fold(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=7, text="a|1.0 b|4.0 a|3.0 b|2.0")]
    )
    pay = P.delimited_payload_table(docs)
    # phrase 'a b' matches spans at (0,1) and (2,3): payloads 1,4,3,2
    for fn, want in [("max", 4.0), ("min", 1.0), ("sum", 10.0), ("avg", 2.5)]:
        got = P.payload_score_topk(
            None, "text", ("a", "b"), pay, fn=fn, include_span_score=False
        ).collect()
        assert len(got) == 1 and got[0].doc_id == 7
        assert got[0].payload_score == pytest.approx(want), fn


def test_payload_no_payload_defaults_to_one(spark):
    docs = spark.createDataFrame([Row(doc_id=3, text="a b")])
    pay = P.delimited_payload_table(docs)  # both payloads null
    got = P.payload_score_topk(
        None, "text", ("a", "b"), pay, fn="max", include_span_score=False
    ).collect()
    assert got[0].payload_score == pytest.approx(1.0)


def test_distance_filter_crosses_antimeridian(spark):
    """A radius circle centered near lon 180 must keep in-radius points on
    the OTHER side of the dateline (LatLonPoint.newDistanceQuery handles
    this via a crossing rectangle; the box pre-filter must not drop them)."""
    pts = _pts(spark, [(0.0, -179.9), (0.0, 179.5), (0.0, 178.0), (5.0, -170.0)])
    got = {r.id for r in geo.distance_filter(pts, 0.0, 179.9, 50_000).collect()}
    # id 0 is ~22 km away across the dateline; id 1 is ~44 km on the same
    # side; id 2 (~211 km) and id 3 are outside
    assert got == {0, 1}


def test_distance_filter_matches_brute_force_near_pole_and_dateline(spark):
    """The box pre-filter is only an optimization: results must equal a
    brute-force haversine scan for circles near the pole (lon half-width
    overflow) and straddling the dateline."""

    def hav(lat1, lon1, lat2, lon2):
        r = 6371008.7714
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp, dl = p2 - p1, math.radians(lon2 - lon1)
        a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return 2 * r * math.asin(math.sqrt(a))

    rows = [
        (89.0, 0.0), (89.3, 180.0), (89.9, 180.0), (89.9, -90.0),
        (0.0, -179.9), (0.0, 179.5), (0.0, 178.0), (45.0, 10.0),
    ]
    pts = _pts(spark, rows)
    for (clat, clon, rad) in [(89.3, 0.0, 70_000), (89.3, 0.0, 200_000),
                              (0.0, 179.9, 50_000), (0.0, -179.95, 30_000)]:
        want = {i for i, (a, o) in enumerate(rows) if hav(clat, clon, a, o) <= rad}
        got = {r.id for r in geo.distance_filter(pts, clat, clon, rad).collect()}
        assert got == want, (clat, clon, rad, got, want)


def test_polygon_filter_matches_python_raycast(spark):
    """polygon_filter (LatLonPoint.newPolygonQuery analog) agrees with an
    independent pure-Python crossing-number implementation on a seeded
    point cloud, for a convex and a concave polygon; the SQL twin
    (polygon_contains_sql) agrees with the Column expression too."""
    import random

    def raycast(poly, py, px):
        ring = list(poly) + [poly[0]]
        inside = False
        for (y1, x1), (y2, x2) in zip(ring, ring[1:]):
            if (y1 > py) != (y2 > py):
                xint = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
                if px < xint:
                    inside = not inside
        return inside

    rng = random.Random(42)
    rows = [
        (round(rng.uniform(-60, 60), 2), round(rng.uniform(-80, 80), 2))
        for _ in range(400)
    ]
    convex = [(0.0, 0.0), (30.0, 40.0), (60.0, 10.0), (50.0, -30.0), (10.0, -40.0)]
    concave = [(0.0, 0.0), (40.0, 5.0), (10.0, 20.0), (40.0, 45.0), (-10.0, 60.0)]
    pts = _pts(spark, rows)
    for poly in (convex, concave):
        want = {i for i, (a, o) in enumerate(rows) if raycast(poly, a, o)}
        got = {r.id for r in pts.filter(geo.polygon_filter(poly)).collect()}
        assert got == want
        assert len(want) > 5  # non-vacuous
        got_sql = {
            r.id
            for r in pts.filter(F.expr(geo.polygon_contains_sql(poly))).collect()
        }
        assert got_sql == want


def test_polygon_filter_rejects_degenerate(spark):
    with pytest.raises(ValueError):
        geo.polygon_filter([(0.0, 0.0), (1.0, 1.0)])


def test_multi_polygon_filter_union_and_holes(spark):
    """multi_polygon_filter (LatLonPoint.newPolygonQuery(field, Polygon...)
    with geo/Polygon.java holes) agrees with an independent pure-Python
    raycast union/exclusion on a seeded cloud; the SQL twin agrees too."""
    import random

    def raycast(poly, py, px):
        ring = list(poly) + [poly[0]]
        inside = False
        for (y1, x1), (y2, x2) in zip(ring, ring[1:]):
            if (y1 > py) != (y2 > py):
                xint = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
                if px < xint:
                    inside = not inside
        return inside

    def contains(components, py, px):
        return any(
            raycast(shell, py, px) and not any(raycast(h, py, px) for h in holes)
            for shell, holes in components
        )

    rng = random.Random(7)
    rows = [
        (round(rng.uniform(-70, 70), 2), round(rng.uniform(-90, 90), 2))
        for _ in range(500)
    ]
    components = [
        (
            [(0.0, 0.0), (30.0, 40.0), (60.0, 10.0), (50.0, -30.0), (10.0, -40.0)],
            [[(20.0, -10.0), (35.0, -10.0), (35.0, 10.0), (20.0, 10.0)]],
        ),
        ([(-60.0, 20.0), (-20.0, 50.0), (-60.0, 80.0)], []),
    ]
    want = {i for i, (a, o) in enumerate(rows) if contains(components, a, o)}
    shell_only = {
        i for i, (a, o) in enumerate(rows) if raycast(components[0][0], a, o)
    }
    hole_hits = {
        i for i, (a, o) in enumerate(rows) if raycast(components[0][1][0], a, o)
    }
    assert hole_hits & shell_only  # non-vacuous: the hole excludes someone
    assert len(want) > 10 and not (want & hole_hits)
    pts = _pts(spark, rows)
    got = {r.id for r in pts.filter(geo.multi_polygon_filter(components)).collect()}
    assert got == want
    got_sql = {
        r.id
        for r in pts.filter(
            F.expr(geo.multi_polygon_contains_sql(components))
        ).collect()
    }
    assert got_sql == want


def test_multi_polygon_rejects_empty(spark):
    with pytest.raises(ValueError):
        geo.multi_polygon_filter([])
    with pytest.raises(ValueError):
        geo.multi_polygon_contains_sql([])


def test_range_field_relations(spark):
    """RangeFieldQuery.QueryType per-doc matches (RangeFieldQuery.java:
    INTERSECTS :104, WITHIN :147, CONTAINS :190, CROSSES :259 =
    INTERSECTS AND NOT WITHIN)."""
    from pyspark.sql import Row

    from lucene_spark.search.geo import lat_lon_bounding_box

    boxes = spark.createDataFrame(
        [
            # query box: lat [0, 10], lon [0, 10]
            Row(i=0, min_lat=2.0, max_lat=8.0, min_lon=2.0, max_lon=8.0),   # within
            Row(i=1, min_lat=-5.0, max_lat=15.0, min_lon=-5.0, max_lon=15.0),  # contains
            Row(i=2, min_lat=5.0, max_lat=15.0, min_lon=5.0, max_lon=8.0),  # crosses
            Row(i=3, min_lat=20.0, max_lat=30.0, min_lon=0.0, max_lon=10.0),  # disjoint
        ]
    )

    def ids(rel):
        return {
            r.i
            for r in lat_lon_bounding_box(boxes, rel, 0.0, 0.0, 10.0, 10.0).collect()
        }

    assert ids("INTERSECTS") == {0, 1, 2}
    assert ids("WITHIN") == {0}
    assert ids("CONTAINS") == {1}
    assert ids("CROSSES") == {1, 2}  # intersects and not within


def test_dv_multi_range_coalesce_and_arrays(spark):
    from pyspark.sql import Row

    from lucene_spark.search.extras import dv_multi_range_filter

    df = spark.createDataFrame(
        [Row(i=0, v=3.0), Row(i=1, v=6.5), Row(i=2, v=9.0), Row(i=3, v=21.0)]
    )
    got = {
        r.i
        for r in dv_multi_range_filter(
            df, "v", [(2.0, 5.0), (4.5, 8.0), (20.0, 25.0)]
        ).collect()
    }
    assert got == {0, 1, 3}
    # SortedNumeric (multi-valued): any value in any range matches
    arr = spark.createDataFrame(
        [Row(i=0, vs=[1.0, 9.0]), Row(i=1, vs=[3.0, 100.0]), Row(i=2, vs=[50.0])]
    )
    got = {
        r.i
        for r in dv_multi_range_filter(
            arr, "vs", [(2.0, 8.0)], single_valued=False
        ).collect()
    }
    assert got == {1}
    # empty ranges -> MatchNoDocsQuery (DocValuesMultiRangeQuery builder)
    assert dv_multi_range_filter(df, "v", []).count() == 0


def test_float_point_nearest(spark):
    """FloatPointNearestNeighbor: exact nearest-n, radius box prune
    loses nothing inside the radius, plan is TakeOrdered (no full sort
    shuffle)."""
    from pyspark.sql import Row

    from lucene_spark.search.points import float_point_nearest

    pts = spark.createDataFrame(
        [Row(doc_id=i, x=float(i), y=float(-i)) for i in range(100)]
    )
    top = float_point_nearest(pts, ["x", "y"], [10.0, -10.0], n=3).collect()
    assert [r.doc_id for r in top] == [10, 9, 11]  # dist ties -> id asc
    assert top[0].dist_sq == 0.0
    with_r = float_point_nearest(
        pts, ["x", "y"], [10.0, -10.0], n=3, radius=5.0
    ).collect()
    assert [r.doc_id for r in with_r] == [10, 9, 11]
    plan = float_point_nearest(pts, ["x", "y"], [10.0, -10.0], n=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
