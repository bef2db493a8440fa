"""Geospatial registry queries (round 9) — the family the reference's
Mongo deployment surface implies but streamlit_app.py never touches:
``$geoNear`` proximity and a distributed radius self-join, both over
deterministically synthesized coordinates (exact integer arithmetic
from doc_id, so Spark and the DuckDB oracle derive bit-identical
doubles before any trig).

Scale: the $geoNear query is one scan + one sort; the radius join is
grid-bucketed (functions/geo.py) — an equi-join on cell keys, never
all-pairs. Distances round to 6 (libm last-ulp drift between JVM and
DuckDB trig).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from providenciasbigdata_spark.io import load_table

# exact-integer coordinate synthesis: lat in [-60, 60), lon in [-180, 180)
_LAT = "(-60.0 + CAST(doc_id * 7919 % 12000 AS DOUBLE) / 100.0)"
_LON = "(-180.0 + CAST(doc_id * 104729 % 36000 AS DOUBLE) / 100.0)"

_HAV_RAW = (
    "2.0 * 6371.0088 * ASIN(SQRT("
    "POW(SIN(RADIANS({lat2} - ({lat1})) / 2), 2) + "
    "COS(RADIANS({lat1})) * COS(RADIANS({lat2})) * "
    "POW(SIN(RADIANS({lon2} - ({lon1})) / 2), 2)))"
)
_HAV_M = "ROUND(" + _HAV_RAW + " * 1000.0, 6)"
_HAV_KM = "ROUND(" + _HAV_RAW + ", 6)"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lat = F.lit(-60.0) + ((F.col("doc_id") * 7919) % 12000).cast("double") / 100.0
    lon = F.lit(-180.0) + ((F.col("doc_id") * 104729) % 36000).cast("double") / 100.0
    return docs.select(
        "doc_id",
        (F.lit(2000) + F.col("doc_id") % 25).cast("int").alias("anio"),
        lat.alias("lat"),
        lon.alias("lon"),
    )


def q_mql_geo_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$geoNear from the origin: recent documents within 3,000 km,
    distance in meters ascending — the `query` pre-filter, maxDistance
    and the [lon, lat] location array all exercised. Lowered onto the
    pure-Catalyst haversine (compat/ir.py::_geo_near_stage)."""
    from providenciasbigdata_spark.compat.ir import mql_aggregate

    pts = _points(spark, sf_dir).select(
        "doc_id", "anio", F.array("lon", "lat").alias("location")
    )
    out = mql_aggregate(
        pts,
        [
            {"$geoNear": {
                "near": [0.0, 0.0],
                "distanceField": "dist_m",
                "maxDistance": 3_000_000.0,
                "query": {"anio": {"$gte": 2010}},
                "spherical": True,
            }},
            {"$project": {"doc_id": 1, "anio": 1, "dist_m": 1}},
        ],
    )
    return out.select("doc_id", F.col("anio").cast("int").alias("anio"), "dist_m")


_GEO_NEAR_SQL = f"""
WITH pts AS (
  SELECT doc_id, CAST(2000 + doc_id % 25 AS INT) AS anio,
         {_LAT} AS lat, {_LON} AS lon
  FROM documents
), d AS (
  SELECT doc_id, anio,
         {_HAV_M.format(lat1="0.0", lon1="0.0", lat2="lat", lon2="lon")} AS dist_m,
         2.0 * 6371.0088 * ASIN(SQRT(
           POW(SIN(RADIANS(lat - 0.0) / 2), 2) +
           COS(RADIANS(0.0)) * COS(RADIANS(lat)) *
           POW(SIN(RADIANS(lon - 0.0) / 2), 2))) * 1000.0 AS raw_m
  FROM pts WHERE anio >= 2010
)
SELECT doc_id, anio, dist_m FROM d WHERE raw_m <= 3000000.0
"""


def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed radius self-join: all document pairs within 150 km —
    grid-bucketed candidates (3x3 cell neighborhood equi-join, never
    all-pairs; functions/geo.py::radius_join_pairs), exact haversine
    verify. Oracle is the brute-force pair join with the identical
    formula — feasible at oracle SF, which is exactly why the engine
    side must NOT be brute force."""
    from providenciasbigdata_spark.functions.geo import radius_join_pairs

    return radius_join_pairs(_points(spark, sf_dir), radius_km=150.0)


_GEO_RADIUS_SQL = f"""
WITH pts AS (
  SELECT doc_id, {_LAT} AS lat, {_LON} AS lon FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       {_HAV_KM.format(lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")} AS km
FROM pts a JOIN pts b ON b.doc_id > a.doc_id
WHERE {_HAV_KM.format(lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")}
      <= 150.0
"""


def q_mql_geo_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$geoWithin find() operator (round 9): documents inside a planar
    $box minus a $centerSphere exclusion zone (composed through $and /
    the haversine the $geoNear stage shares) — both pure scan
    predicates, pushed, no UDF (compat/ir.py::_geo_within_condition)."""
    from providenciasbigdata_spark.compat.ir import mql_find

    pts = _points(spark, sf_dir).select(
        "doc_id", F.array("lon", "lat").alias("location")
    )
    out = mql_find(
        pts,
        {"$and": [
            {"location": {"$geoWithin": {
                "$box": [[-60.0, -30.0], [60.0, 30.0]],
            }}},
            {"location": {"$geoWithin": {
                # ~1000 km exclusion disc around the origin, in radians
                "$centerSphere": [[0.0, 0.0], 1000.0 / 6371.0088],
            }}},
        ]},
    )
    return out.select(
        "doc_id",
        F.round(F.col("location").getItem(0), 6).alias("lon"),
        F.round(F.col("location").getItem(1), 6).alias("lat"),
    )


_GEO_WITHIN_SQL = f"""
WITH pts AS (
  SELECT doc_id, {_LAT} AS lat, {_LON} AS lon FROM documents
)
SELECT doc_id, ROUND(lon, 6) AS lon, ROUND(lat, 6) AS lat
FROM pts
WHERE lon BETWEEN -60.0 AND 60.0 AND lat BETWEEN -30.0 AND 30.0
  AND {_HAV_RAW.format(lat1="0.0", lon1="0.0", lat2="lat", lon2="lon")}
      <= (1000.0 / 6371.0088) * 6371.0088
"""


# a pentagon over the Atlantic — closed GeoJSON ring, no horizontal edges
_PENTAGON = [
    [-40.0, -10.0], [-10.0, -20.0], [5.0, 5.0], [-15.0, 25.0],
    [-45.0, 15.0], [-40.0, -10.0],
]


def q_mql_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$geoWithin $geometry Polygon (round 9): planar even-odd ray
    casting unrolled at compile time into one boolean-XOR chain over
    the literal vertex edges (slopes precomputed in Python, pure
    Catalyst comparisons pushed into the scan). The oracle generates
    the IDENTICAL unrolled expression as SQL text from the same vertex
    list, so membership value-hashes exactly."""
    from providenciasbigdata_spark.compat.ir import mql_find

    pts = _points(spark, sf_dir).select(
        "doc_id", F.array("lon", "lat").alias("location")
    )
    out = mql_find(
        pts,
        {"location": {"$geoWithin": {"$geometry": {
            "type": "Polygon", "coordinates": [_PENTAGON],
        }}}},
    )
    return out.select(
        "doc_id",
        F.round(F.col("location").getItem(0), 6).alias("lon"),
        F.round(F.col("location").getItem(1), 6).alias("lat"),
    )


def _point_in_polygon_sql(verts, lon: str, lat: str) -> str:
    """The same literal-unrolled even-odd XOR chain, as DuckDB SQL —
    generated from the one vertex list the engine compiles, slope
    literals repr'd so both engines parse identical doubles."""
    terms = []
    for (x1, y1), (x2, y2) in zip(verts, verts[1:]):
        if y1 == y2:
            continue
        slope = (x2 - x1) / (y2 - y1)
        terms.append(
            f"((({y1!r} > {lat}) <> ({y2!r} > {lat})) AND "
            f"{lon} < {x1!r} + ({lat} - {y1!r}) * {slope!r})"
        )
    expr = "FALSE"
    for t in terms:
        expr = f"({expr} <> {t})"
    return expr


_GEO_POLYGON_SQL = f"""
WITH pts AS (
  SELECT doc_id, {_LAT} AS lat, {_LON} AS lon FROM documents
)
SELECT doc_id, ROUND(lon, 6) AS lon, ROUND(lat, 6) AS lat
FROM pts
WHERE {_point_in_polygon_sql([(float(x), float(y)) for x, y in _PENTAGON], "lon", "lat")}
"""


QUERIES = {
    "mql_geo_near": (q_mql_geo_near, _GEO_NEAR_SQL),
    "mql_geo_within": (q_mql_geo_within, _GEO_WITHIN_SQL),
    "mql_geo_polygon": (q_mql_geo_polygon, _GEO_POLYGON_SQL),
    "geo_radius_join": (q_geo_radius_join, _GEO_RADIUS_SQL),
}

WHY_NO_ORACLE: dict[str, str] = {}
