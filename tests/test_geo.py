"""Geo family pins (round 9): haversine reference values, radius-join
vs brute force, grid guardrails, $geoNear option handling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from providenciasbigdata_spark.functions.geo import (
    EARTH_RADIUS_KM,
    haversine_km,
    radius_join_pairs,
)


def _hav_py(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(p1) * math.cos(p2)
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_haversine_reference_values(spark):
    rows = [
        (0.0, 0.0, 0.0, 1.0),      # 1 deg lon at the equator
        (0.0, 0.0, 1.0, 0.0),      # 1 deg lat
        (60.0, 10.0, 60.0, 11.0),  # 1 deg lon at 60N: about half
        (12.5, -7.25, -33.0, 151.2),
    ]
    df = spark.createDataFrame(
        rows, "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    got = df.select(
        haversine_km(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("km")
    ).collect()
    for (lat1, lon1, lat2, lon2), r in zip(rows, got):
        assert abs(r["km"] - _hav_py(lat1, lon1, lat2, lon2)) < 1e-9
    # the equator degree is the textbook 111.195 km
    assert abs(got[0]["km"] - math.pi * EARTH_RADIUS_KM / 180) < 1e-6


def test_radius_join_matches_brute_force(spark):
    """Clustered fixture: 4 dense clusters (within-cluster pairs in
    range, cross-cluster out), offsets crafted to straddle grid-cell
    boundaries so the 3x3 neighborhood join is actually exercised."""
    centers = [(-48.3, -71.2), (0.0, 0.0), (41.7, 12.4), (55.1, 170.0)]
    pts = []
    i = 0
    for clat, clon in centers:
        for k in range(8):
            pts.append((
                i,
                clat + (k * 17 % 40 - 20) / 10.0,   # +-2 deg
                clon + (k * 29 % 60 - 30) / 10.0,   # +-3 deg
            ))
            i += 1
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    got = {
        (r.id_a, r.id_b): r.km
        for r in radius_join_pairs(df, radius_km=300.0).collect()
    }
    want = {}
    for i, la, lo in pts:
        for j, lb, lj in pts:
            if i < j:
                d = round(_hav_py(la, lo, lb, lj), 6)
                if d <= 300.0:
                    want[(i, j)] = d
    assert want  # non-trivial fixture
    assert got == want


def test_radius_join_guardrails(spark):
    df = spark.createDataFrame(
        [(1, 75.0, 0.0), (2, 10.0, 0.0)], "doc_id long, lat double, lon double"
    )
    # band violation raises AT EXECUTION (raise_error fused into the
    # scan — advice-r9 removed the extra plan-build validation pass)
    with pytest.raises(Exception, match="lat"):
        radius_join_pairs(df, radius_km=100.0).count()  # 75N beyond 60
    with pytest.raises(ValueError, match="radius_km"):
        radius_join_pairs(df, radius_km=0.0)
    # raising the band admits the points
    assert (
        radius_join_pairs(df, radius_km=100.0, max_abs_lat=80.0).count() == 0
    )


def test_geo_near_stage_semantics(spark):
    from providenciasbigdata_spark.compat.ir import mql_aggregate

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [10.0, 0.0])],
        "doc_id long, location array<double>",
    )
    out = mql_aggregate(
        df,
        [{"$geoNear": {
            "near": {"type": "Point", "coordinates": [0.0, 0.0]},
            "distanceField": "d",
            "maxDistance": 200_000.0,
            "distanceMultiplier": 0.001,  # meters -> km
        }}],
    ).collect()
    # ascending distance order; the 10-degree point is filtered out
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0]["d"] == 0.0
    assert abs(out[1]["d"] - _hav_py(0, 0, 0, 1)) < 1e-6

    with pytest.raises(ValueError, match="geoNear needs"):
        mql_aggregate(df, [{"$geoNear": {"near": [0.0, 0.0]}}])
    with pytest.raises(ValueError, match="unsupported \\$geoNear"):
        mql_aggregate(df, [{"$geoNear": {
            "near": [0.0, 0.0], "distanceField": "d", "includeLocs": "x",
        }}])
    with pytest.raises(ValueError, match="not a column"):
        mql_aggregate(df, [{"$geoNear": {
            "near": [0.0, 0.0], "distanceField": "d", "key": "nope",
        }}])
    # advice-r9: explicit spherical:false means planar 2d distance —
    # refuse loudly instead of silently computing great-circle meters
    with pytest.raises(ValueError, match="spherical:false"):
        mql_aggregate(df, [{"$geoNear": {
            "near": [0.0, 0.0], "distanceField": "d", "spherical": False,
        }}])
    # spherical:true stays the silent pass (it IS the computed model)
    ok = mql_aggregate(df, [{"$geoNear": {
        "near": [0.0, 0.0], "distanceField": "d", "spherical": True,
    }}])
    assert ok.count() == 3


def test_geo_within_shapes(spark):
    from providenciasbigdata_spark.compat.ir import mql_find

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [5.0, 5.0]), (3, [20.0, 5.0]), (4, [0.5, 0.5])],
        "doc_id long, location array<double>",
    )
    box = mql_find(df, {"location": {"$geoWithin": {
        "$box": [[-10.0, -10.0], [10.0, 10.0]]}}})
    assert sorted(r.doc_id for r in box.collect()) == [1, 2, 4]

    # ~100 km disc around the origin keeps only the near points
    disc = mql_find(df, {"location": {"$geoWithin": {
        "$centerSphere": [[0.0, 0.0], 100.0 / EARTH_RADIUS_KM]}}})
    assert sorted(r.doc_id for r in disc.collect()) == [1, 4]

    for bad in (
        {"$box": [[0.0, 0.0]]},
        {"$centerSphere": [[0.0], 1.0]},
        {"$geometry": {"type": "Polygon"}},
        {"$box": [[0, 0], [1, 1]], "$centerSphere": [[0, 0], 1]},
    ):
        with pytest.raises(ValueError):
            mql_find(df, {"location": {"$geoWithin": bad}})


def test_geo_polygon_ray_casting(spark):
    """Round 9 $geometry Polygon: hand-checkable unit square + concave
    chevron (the case bounding boxes get wrong), horizontal edges
    skipped, malformed rings raise."""
    from providenciasbigdata_spark.compat.ir import mql_find

    square = {"type": "Polygon", "coordinates": [[
        [0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0],
    ]]}
    df = spark.createDataFrame(
        [(1, [5.0, 5.0]), (2, [15.0, 5.0]), (3, [5.0, -1.0]), (4, [9.9, 9.9])],
        "doc_id long, location array<double>",
    )
    got = sorted(r.doc_id for r in mql_find(
        df, {"location": {"$geoWithin": {"$geometry": square}}}
    ).collect())
    assert got == [1, 4]

    # concave chevron: > shape — the notch point is OUTSIDE even though
    # it is inside the bounding box
    chevron = {"type": "Polygon", "coordinates": [[
        [0.0, 0.0], [10.0, 5.0], [0.0, 10.0], [3.0, 5.0], [0.0, 0.0],
    ]]}
    pts = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [5.0, 5.0]), (3, [1.0, 1.0])],
        "doc_id long, location array<double>",
    )
    got2 = sorted(r.doc_id for r in mql_find(
        pts, {"location": {"$geoWithin": {"$geometry": chevron}}}
    ).collect())
    # (1,5) is in the notch (outside); (5,5) inside the arrow; (1,1)
    # below the lower edge y=x/2 at x=1 -> 1 > 0.5 so inside? lower
    # edge from (0,0) to (10,5): y = x/2 = 0.5 at x=1; point y=1 is
    # ABOVE it, and left edge from (3,5) to (0,0): x = 3y/5 = 0.6 at
    # y=1; point x=1 > 0.6 so right of it -> inside
    assert got2 == [2, 3]

    for bad in (
        {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 0]]]},
        {"type": "Polygon", "coordinates": [
            [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]],
            [[0.2, 0.2], [0.8, 0.2], [0.8, 0.8]],  # unclosed hole ring
        ]},
        {"type": "MultiPolygon", "coordinates": []},
        {"type": "Polygon", "coordinates": []},
        {"type": "LineString", "coordinates": [[0, 0], [1, 1]]},
    ):
        with pytest.raises(ValueError):
            mql_find(pts, {"location": {"$geoWithin": {"$geometry": bad}}})


def test_geo_polygon_holes_and_multipolygon(spark):
    """Round 10: interior rings (holes) via the even-odd rule — a point
    inside both outer ring and hole toggles twice, so it is OUT — and
    MultiPolygon as the OR of per-polygon tests."""
    from providenciasbigdata_spark.compat.ir import mql_find

    donut = {"type": "Polygon", "coordinates": [
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]],
        [[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0], [3.0, 3.0]],
    ]}
    df = spark.createDataFrame(
        [
            (1, [5.0, 5.0]),   # in the hole -> out
            (2, [1.0, 1.0]),   # in the ring body -> in
            (3, [8.0, 5.0]),   # between hole and outer edge -> in
            (4, [15.0, 5.0]),  # outside entirely -> out
        ],
        "doc_id long, location array<double>",
    )
    got = sorted(r.doc_id for r in mql_find(
        df, {"location": {"$geoWithin": {"$geometry": donut}}}
    ).collect())
    assert got == [2, 3]

    two_squares = {"type": "MultiPolygon", "coordinates": [
        [[[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]]],
        [[[10.0, 10.0], [12.0, 10.0], [12.0, 12.0], [10.0, 12.0],
          [10.0, 10.0]]],
    ]}
    pts2 = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [11.0, 11.0]), (3, [5.0, 5.0])],
        "doc_id long, location array<double>",
    )
    got2 = sorted(r.doc_id for r in mql_find(
        pts2, {"location": {"$geoWithin": {"$geometry": two_squares}}}
    ).collect())
    assert got2 == [1, 2]

    # MultiPolygon with a hole in the first polygon: even-odd per polygon
    mp_hole = {"type": "MultiPolygon", "coordinates": [
        donut["coordinates"],
        [[[20.0, 0.0], [22.0, 0.0], [22.0, 2.0], [20.0, 2.0], [20.0, 0.0]]],
    ]}
    pts3 = spark.createDataFrame(
        [(1, [5.0, 5.0]), (2, [1.0, 1.0]), (3, [21.0, 1.0])],
        "doc_id long, location array<double>",
    )
    got3 = sorted(r.doc_id for r in mql_find(
        pts3, {"location": {"$geoWithin": {"$geometry": mp_hole}}}
    ).collect())
    assert got3 == [2, 3]


def test_geo_predicates_stay_scan_side(spark):
    """Round 9 plan pins: $geoWithin compiles to Filter over the scan
    (no UDF, no Python stage, no join) and the radius join's plan has
    no cartesian/nested-loop node."""
    from providenciasbigdata_spark.compat.ir import mql_find
    from providenciasbigdata_spark.functions.geo import radius_join_pairs

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [5.0, 5.0])],
        "doc_id long, location array<double>",
    )
    out = mql_find(df, {"location": {"$geoWithin": {
        "$centerSphere": [[0.0, 0.0], 0.1]}}})
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Join"):
        assert bad not in plan, bad

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.5, 0.5)], "doc_id long, lat double, lon double"
    )
    rplan = radius_join_pairs(pts, 100.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in rplan
    assert "BroadcastNestedLoopJoin" not in rplan
    assert "BatchEvalPython" not in rplan and "ArrowEvalPython" not in rplan
