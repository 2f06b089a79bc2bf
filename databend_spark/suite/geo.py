"""Geo suite — distance, geohash, containment, spatial join (§2.8 geo).

Reference: ``src/query/functions/src/scalars/geographic/src/geo.rs``
(distance family, geohash, point_in_polygon) and ``plans/spatial_join.rs``.

Coordinates are derived deterministically from integer keys with identical
integer arithmetic on both engines, so quantization (floor) and containment
(strict inequalities on .005-offset points vs integer-edged boxes) are
bit-reproducible; only the trig-based distances need a rounding guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databend_spark.functions.geo import (
    chars_sql,
    geohash_oracle_sql,
    interleave_sql,
    point_in_polygon,
    quantize_sql,
    with_geohash,
)
from databend_spark.suite.base import register

# point coords from customer keys — integer-derived, .005 off any integer edge
# CAST-to-DOUBLE happens BEFORE any division so both engines execute the
# identical IEEE double op sequence (int ops are exact; double +-*/ are
# correctly rounded per IEEE-754 → bit-identical results across engines).
_PX = "(CAST((c_custkey * 104729) % 35000 AS DOUBLE) / 100.0 - 170.0 + 0.005)"
_PY = "(CAST((c_custkey * 7919) % 17000 AS DOUBLE) / 100.0 - 85.0 + 0.005)"
# second point (for distances): same formulas on a shifted key
_QX = "(CAST(((c_custkey + 1000) * 104729) % 35000 AS DOUBLE) / 100.0 - 170.0 + 0.005)"
_QY = "(CAST(((c_custkey + 1000) * 7919) % 17000 AS DOUBLE) / 100.0 - 85.0 + 0.005)"

# integer-edged boxes from nation keys
_BOX = {
    "x0": "CAST((n_nationkey * 37) % 300 - 180 AS DOUBLE)",
    "w": "CAST(20 + (n_nationkey % 5) * 15 AS DOUBLE)",
    "y0": "CAST((n_nationkey * 53) % 140 - 80 AS DOUBLE)",
    "h": "CAST(15 + (n_nationkey % 7) * 10 AS DOUBLE)",
}

_HAVERSINE_KM = (
    "round(2 * 6371.0088 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))), 3)"
)


@register(
    "geo_haversine",
    oracle=f"""
    SELECT c_custkey,
           {_HAVERSINE_KM.format(lat1=_PY, lon1=_PX, lat2=_QY, lon2=_QX)}
             AS dist_km
    FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey
    """,
    doc="haversine distance in km (reference geometry.rs:139), trig built-ins",
)
def geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    expr = _HAVERSINE_KM.format(lat1=_PY, lon1=_PX, lat2=_QY, lon2=_QX)
    return (
        spark.table("customer")
        .filter("c_custkey <= 500")
        .selectExpr("c_custkey", f"{expr} AS dist_km")
        .orderBy("c_custkey")
    )


def _geohash_duck_oracle() -> str:
    lon_q, lat_q = quantize_sql("px", "py")
    return f"""
    WITH pts AS (
      SELECT c_custkey, {_PX} AS px, {_PY} AS py
      FROM customer WHERE c_custkey <= 300
    ), q AS (
      SELECT c_custkey, {lon_q} AS lon_q, {lat_q} AS lat_q FROM pts
    ), v AS (
      SELECT c_custkey, {interleave_sql('lon_q', 'lat_q', 'duckdb')} AS iv
      FROM q
    )
    SELECT c_custkey, {chars_sql('iv', 'duckdb')} AS geohash FROM v
    ORDER BY c_custkey
    """


@register(
    "geo_geohash",
    oracle=_geohash_duck_oracle(),
    doc="12-char geohash_encode via codegen'd bit interleave (geo.rs:145); "
    "oracle runs the IDENTICAL integer expression in DuckDB",
)
def geo_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        spark.table("customer")
        .filter("c_custkey <= 300")
        .selectExpr("c_custkey", f"{_PX} AS px", f"{_PY} AS py")
    )
    return with_geohash(pts, "px", "py").select("c_custkey", "geohash").orderBy(
        "c_custkey"
    )


def _boxes(spark: SparkSession) -> DataFrame:
    b = _BOX
    return spark.table("nation").selectExpr(
        "n_nationkey",
        f"{b['x0']} AS x0",
        f"{b['x0']} + {b['w']} AS x1",
        f"{b['y0']} AS y0",
        f"{b['y0']} + {b['h']} AS y1",
    )


_RING = (
    "array(named_struct('x', x0, 'y', y0), named_struct('x', x1, 'y', y0), "
    "named_struct('x', x1, 'y', y1), named_struct('x', x0, 'y', y1))"
)


@register(
    "geo_point_in_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_PX} AS px, {_PY} AS py
      FROM customer WHERE c_custkey <= 200
    ), box AS (
      SELECT {_BOX['x0']} AS x0, {_BOX['x0']} + {_BOX['w']} AS x1,
             {_BOX['y0']} AS y0, {_BOX['y0']} + {_BOX['h']} AS y1
      FROM nation WHERE n_nationkey = 7
    )
    SELECT c_custkey,
           (px > x0 AND px < x1 AND py > y0 AND py < y1) AS inside
    FROM pts, box ORDER BY c_custkey
    """,
    doc="ray-cast point-in-polygon as a pure HOF expression (geo.rs:383); "
    "oracle is the strict-box equivalent for an axis-aligned ring",
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        spark.table("customer")
        .filter("c_custkey <= 200")
        .selectExpr("c_custkey", f"{_PX} AS px", f"{_PY} AS py")
    )
    ring = (
        _boxes(spark)
        .filter("n_nationkey = 7")
        .selectExpr(f"{_RING} AS poly")
    )
    return (
        pts.crossJoin(F.broadcast(ring))
        .withColumn("inside", point_in_polygon("px", "py", "poly"))
        .select("c_custkey", "inside")
        .orderBy("c_custkey")
    )


@register(
    "geo_spatial_join",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_PX} AS px, {_PY} AS py FROM customer
    ), box AS (
      SELECT n_nationkey, {_BOX['x0']} AS x0, {_BOX['x0']} + {_BOX['w']} AS x1,
             {_BOX['y0']} AS y0, {_BOX['y0']} + {_BOX['h']} AS y1
      FROM nation
    )
    SELECT c_custkey, n_nationkey
    FROM pts JOIN box
      ON px > x0 AND px < x1 AND py > y0 AND py < y1
    ORDER BY c_custkey, n_nationkey
    """,
    doc="grid-bucketed spatial join (plans/spatial_join.rs analog): "
    "polygon bbox → grid cells → equi-join on cell → exact ray-cast refine; "
    "shuffles on (long,long) cell keys, no crossJoin",
)
def geo_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databend_spark.operators.spatial_join import points_in_polygons

    pts = spark.table("customer").selectExpr(
        "c_custkey", f"{_PX} AS x", f"{_PY} AS y"
    )
    polys = _boxes(spark).selectExpr("n_nationkey", f"{_RING} AS poly")
    return (
        points_in_polygons(pts, polys, cell=45.0)
        .select("c_custkey", "n_nationkey")
        .orderBy("c_custkey", "n_nationkey")
    )
