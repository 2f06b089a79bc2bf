"""Geo function tests — golden vectors + roundtrips + spatial join.

Golden geohash values are the public test vectors from the original
geohash.org algorithm description (e.g. (57.64911, 10.40744) → u4pruydqqvj).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from databend_spark.functions import geo


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) → New York (40.7128, -74.0060) ≈ 5837.2 km
    df = spark.range(1).select(
        geo.haversine(48.8566, 2.3522, 40.7128, -74.0060).alias("km")
    )
    km = df.first()["km"]
    assert abs(km - 5837.24) < 1.0


def test_great_circle_distance_meters(spark):
    # same point → 0; quarter meridian ≈ pi/2 * R
    row = spark.range(1).select(
        geo.great_circle_distance(0.0, 0.0, 0.0, 0.0).alias("zero"),
        geo.great_circle_distance(0.0, 0.0, 0.0, 90.0).alias("quarter"),
    ).first()
    assert row["zero"] == 0.0
    assert abs(row["quarter"] - math.pi / 2 * 6371007.180918475) < 1000


@pytest.mark.parametrize(
    "lat,lon,expect",
    [
        (57.64911, 10.40744, "u4pruydqqvj8"),  # geohash.org canonical vector
        (48.8566, 2.3522, "u09tvw0f64r7"),
        (-33.8688, 151.2093, "r3gx2f77bn44"),
    ],
)
def test_geohash_encode_golden(spark, lat, lon, expect):
    df = spark.range(1).selectExpr(
        f"CAST({lon} AS DOUBLE) AS lon", f"CAST({lat} AS DOUBLE) AS lat"
    )
    gh = geo.with_geohash(df, "lon", "lat").first()["geohash"]
    assert gh.startswith(expect), gh


def test_geohash_decode_roundtrip(spark):
    pts = spark.range(50).selectExpr(
        "CAST(((id * 104729) % 35000) / 100.0 - 170.0 AS DOUBLE) AS lon",
        "CAST(((id * 7919) % 17000) / 100.0 - 85.0 AS DOUBLE) AS lat",
    )
    dec = geo.with_geohash(pts, "lon", "lat").select(
        "lon", "lat", geo.geohash_decode("geohash").alias("d")
    )
    for r in dec.collect():
        # 12-char geohash cell is ~3.7cm; decoded center within 1e-5 deg
        assert abs(r["d"]["lon"] - r["lon"]) < 1e-5
        assert abs(r["d"]["lat"] - r["lat"]) < 1e-5


def test_geohash_decode_short_precision(spark):
    # 5-char geohash "ezs42" decodes near (42.605, -5.603)
    row = spark.range(1).select(
        geo.geohash_decode("'ezs42'").alias("d")
    ).first()
    assert abs(row["d"]["lat"] - 42.60498) < 0.03
    assert abs(row["d"]["lon"] + 5.60302) < 0.03


def test_point_in_polygon_triangle(spark):
    # triangle (0,0) (10,0) (0,10); (2,2) inside, (8,8) outside
    df = spark.createDataFrame(
        [(2.0, 2.0), (8.0, 8.0), (5.0, 4.9), (-1.0, 5.0)], "px double, py double"
    ).selectExpr(
        "px",
        "py",
        "array(named_struct('x', 0.0D, 'y', 0.0D), named_struct('x', 10.0D, 'y', 0.0D),"
        " named_struct('x', 0.0D, 'y', 10.0D)) AS poly",
    )
    got = [
        r["inside"]
        for r in df.withColumn("inside", geo.point_in_polygon("px", "py", "poly"))
        .orderBy("px")
        .collect()
    ]
    # ordered by px: -1 (out), 2 (in), 5/4.9 (in: 5+4.9<10), 8 (out)
    assert got == [False, True, True, False]


def test_point_in_ellipses(spark):
    row = (
        spark.range(1)
        .select(
            geo.point_in_ellipses(1.0, 0.0, [(0.0, 0.0, 2.0, 1.0)]).alias("a"),
            geo.point_in_ellipses(3.0, 0.0, [(0.0, 0.0, 2.0, 1.0)]).alias("b"),
        )
        .first()
    )
    assert row["a"] is True and row["b"] is False


def test_spatial_join_matches_bruteforce(spark):
    from databend_spark.operators.spatial_join import points_in_polygons

    pts = spark.range(500).selectExpr(
        "id",
        "((id * 104729) % 35000) / 100.0 - 170.0 + 0.005 AS x",
        "((id * 7919) % 17000) / 100.0 - 85.0 + 0.005 AS y",
    )
    polys = spark.range(20).selectExpr(
        "id AS pid",
        "CAST((id * 37) % 300 - 180 AS DOUBLE) AS x0",
        "CAST((id * 37) % 300 - 180 + 20 + (id % 5) * 15 AS DOUBLE) AS x1",
        "CAST((id * 53) % 140 - 80 AS DOUBLE) AS y0",
        "CAST((id * 53) % 140 - 80 + 15 + (id % 7) * 10 AS DOUBLE) AS y1",
    )
    rings = polys.selectExpr(
        "pid",
        "array(named_struct('x', x0, 'y', y0), named_struct('x', x1, 'y', y0),"
        " named_struct('x', x1, 'y', y1), named_struct('x', x0, 'y', y1)) AS poly",
    )
    got = {
        (r["id"], r["pid"])
        for r in points_in_polygons(pts, rings, cell=45.0).select("id", "pid").collect()
    }
    want = {
        (r["id"], r["pid"])
        for r in pts.crossJoin(polys)
        .filter("x > x0 AND x < x1 AND y > y0 AND y < y1")
        .select("id", "pid")
        .collect()
    }
    assert got == want and len(want) > 0


def test_geo_to_h3_is_explicit_capability_error():
    with pytest.raises(NotImplementedError):
        geo.geo_to_h3(0.0, 0.0, 7)
