"""Geospatial functions — Spark-first (pure Column expressions, no UDFs).

Reference surface (all Rust):
  * distance family — ``src/query/functions/src/scalars/geographic/src/geo.rs``
    (``geo_distance``/``great_circle_distance``/``great_circle_angle`` at
    geo.rs:119-143, EARTH_RADIUS = 6371007.180918475 m at geo.rs:69, the
    H3/WGS84 authalic radius; ``haversine`` at geometry.rs:139 returns
    kilometers rounded to 9 decimals using the geo-crate mean radius).
  * ``geohash_encode``/``geohash_decode`` — geo.rs:145-190 (12-char
    precision, lon/lat bit interleave, base-32 alphabet).
  * ``point_in_polygon`` — geo.rs:383 (ClickHouse-style ray casting).
  * geometry constructors ``st_makegeompoint``/``st_x``/``st_y``/
    ``st_distance``/``st_astext`` — geometry.rs:116+ (EWKB-backed there).

Spark design: geometry is a ``struct<x:double,y:double>`` (points) or
``array<struct<x,y>>`` (rings) — not WKB blobs — so every predicate stays
inside whole-stage codegen and shuffles carry 16-byte structs, not opaque
binaries. The reference's LUT-approximated f32 ``geo_distance`` is replaced
by the exact double haversine on the same radius (documented divergence:
their LUT has ~0.00063% max error by design).

Deliberately NOT implemented: the h3_* family (true H3 icosahedral indexing
needs the H3 library, absent from this image; a fake would silently corrupt
bucketing) — ``geo_to_h3`` raises with a clear message.

Cross-dialect generators: ``geohash_encode_sql`` emits the *same* integer
bit-interleave expression for Spark SQL and DuckDB so the driver's oracle
can verify geohashes exactly (integer ops are bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# geo-crate MEAN_EARTH_RADIUS (meters) — used by reference `haversine`
MEAN_EARTH_RADIUS_M = 6_371_008.8
# H3/WGS84 authalic radius — used by reference geo.rs:69 distance family
AUTHALIC_RADIUS_M = 6_371_007.180918475

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_Q = 1 << 30  # 30 bits of lon + 30 bits of lat = 12 base-32 chars


def _haversine_rad(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Central angle (radians) between two lat/lon points (degrees in)."""
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dlat) ** 2 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon) ** 2
    return 2.0 * F.asin(F.sqrt(a))


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def haversine(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in KILOMETERS, 9-decimal rounded.

    Parity: reference geometry.rs:139 — `Haversine.distance(p1,p2) * 0.001`
    rounded to 1e-9 km, geo-crate mean radius 6371008.8 m.
    """
    km = _haversine_rad(_c(lat1), _c(lon1), _c(lat2), _c(lon2)) * (
        MEAN_EARTH_RADIUS_M / 1000.0
    )
    return F.round(km, 9)


def great_circle_distance(lon1, lat1, lon2, lat2) -> Column:
    """Sphere distance in METERS (reference geo.rs:137, f32 output)."""
    m = _haversine_rad(_c(lat1), _c(lon1), _c(lat2), _c(lon2)) * AUTHALIC_RADIUS_M
    return m.cast("float")


def geo_distance(lon1, lat1, lon2, lat2) -> Column:
    """WGS84 distance in METERS (reference geo.rs:119).

    The reference uses a latitude-dependent quadratic LUT approximation of
    the WGS84 ellipsoid (max err ~0.00063%); we return the exact-sphere
    haversine on the same authalic radius — documented divergence.
    """
    return great_circle_distance(lon1, lat1, lon2, lat2)


def great_circle_angle(lon1, lat1, lon2, lat2) -> Column:
    """Central angle in DEGREES (reference geo.rs:128)."""
    return F.degrees(_haversine_rad(_c(lat1), _c(lon1), _c(lat2), _c(lon2))).cast("float")


# --------------------------------------------------------------------------
# geohash — cross-dialect SQL generators (Spark + DuckDB emit identical ints)
# --------------------------------------------------------------------------

def _shr(expr: str, n: int, dialect: str) -> str:
    if dialect == "spark":
        return f"shiftright({expr}, {n})"
    return f"(({expr}) >> {n})"


def quantize_sql(lon: str, lat: str) -> tuple[str, str]:
    """lon/lat (degrees) → 30-bit quantized ints; identical both dialects."""
    lon_q = (
        f"least(CAST(floor((({lon}) + 180.0) / 360.0 * {_Q}.0) AS BIGINT), {_Q - 1})"
    )
    lat_q = (
        f"least(CAST(floor((({lat}) + 90.0) / 180.0 * {_Q}.0) AS BIGINT), {_Q - 1})"
    )
    return lon_q, lat_q


def interleave_sql(lon_q: str, lat_q: str, dialect: str) -> str:
    """60-bit geohash bit stream: lon bit 0 is the MSB, then lat bit 0, …"""
    terms = []
    for i in range(30):
        lon_bit = f"({_shr(lon_q, 29 - i, dialect)} & 1)"
        lat_bit = f"({_shr(lat_q, 29 - i, dialect)} & 1)"
        terms.append(f"{lon_bit} * {1 << (59 - 2 * i)}")
        terms.append(f"{lat_bit} * {1 << (58 - 2 * i)}")
    return " + ".join(terms)


def chars_sql(v: str, dialect: str, precision: int = 12) -> str:
    """Interleaved 60-bit value → base-32 geohash string."""
    parts = []
    for k in range(precision):
        idx = f"CAST(({_shr(v, 55 - 5 * k, dialect)} & 31) AS INT)"
        parts.append(f"substr('{GEOHASH_BASE32}', {idx} + 1, 1)")
    return "concat(" + ", ".join(parts) + ")"


def with_geohash(df, lon_col: str, lat_col: str, out: str = "geohash"):
    """Add a 12-char geohash column, fully JVM-side (codegen'd bit math)."""
    lon_q, lat_q = quantize_sql(lon_col, lat_col)
    df = df.withColumn("_ghlonq", F.expr(lon_q)).withColumn("_ghlatq", F.expr(lat_q))
    df = df.withColumn("_ghv", F.expr(interleave_sql("_ghlonq", "_ghlatq", "spark")))
    df = df.withColumn(out, F.expr(chars_sql("_ghv", "spark")))
    return df.drop("_ghlonq", "_ghlatq", "_ghv")


def geohash_oracle_sql(lon: str, lat: str, alias: str = "geohash") -> str:
    """DuckDB expression computing the identical geohash (for oracles)."""
    lon_q, lat_q = quantize_sql(lon, lat)
    v = interleave_sql(f"({lon_q})", f"({lat_q})", "duckdb")
    return f"{chars_sql(f'({v})', 'duckdb')} AS {alias}"


def geohash_decode(gh: str) -> Column:
    """Geohash → struct(lon, lat) = center of the cell (reference geo.rs:182).

    `gh` is a SQL expression string (column name or literal expression).
    Each char contributes 5 bits; even stream positions refine lon, odd
    refine lat; the result is the decoded interval midpoint. Pure generated
    SQL (no UDF) — length-guarded terms handle any precision up to 12.
    """
    lon_terms, lat_terms = [], []
    lon_pos = lat_pos = 0
    for j in range(60):  # stream bit index, 0 = MSB
        p = j // 5 + 1  # 1-based char position
        shift = 4 - (j % 5)
        charval = f"(instr('{GEOHASH_BASE32}', substr({gh}, {p}, 1)) - 1)"
        bit = (
            f"IF(length({gh}) >= {p},"
            f" CAST((shiftright({charval}, {shift}) & 1) AS DOUBLE), 0.0D)"
        )
        if j % 2 == 0:
            lon_terms.append(f"{bit} * {0.5 ** (lon_pos + 1)!r}")
            lon_pos += 1
        else:
            lat_terms.append(f"{bit} * {0.5 ** (lat_pos + 1)!r}")
            lat_pos += 1
    # cell half-widths: lon gets ceil(5n/2) bits, lat floor(5n/2)
    lon_half = f"pow(0.5, CAST((length({gh}) * 5 + 1) DIV 2 AS DOUBLE)) / 2.0"
    lat_half = f"pow(0.5, CAST((length({gh}) * 5) DIV 2 AS DOUBLE)) / 2.0"
    lon = f"(({' + '.join(lon_terms)}) * 360.0 - 180.0 + ({lon_half}) * 360.0)"
    lat = f"(({' + '.join(lat_terms)}) * 180.0 - 90.0 + ({lat_half}) * 180.0)"
    return F.expr(f"named_struct('lon', {lon}, 'lat', {lat})")


# --------------------------------------------------------------------------
# planar geometry: point structs + ray-cast polygon containment
# --------------------------------------------------------------------------

def st_makegeompoint(x, y) -> Column:
    """POINT as struct<x,y> (reference geometry.rs st_makegeompoint)."""
    return F.struct(_c(x).cast("double").alias("x"), _c(y).cast("double").alias("y"))


def st_x(p: Column) -> Column:
    return p.getField("x")


def st_y(p: Column) -> Column:
    return p.getField("y")


def st_distance(p1: Column, p2: Column) -> Column:
    """Planar euclidean distance between two points (GEOMETRY semantics)."""
    dx = p1.getField("x") - p2.getField("x")
    dy = p1.getField("y") - p2.getField("y")
    return F.sqrt(dx * dx + dy * dy)


def st_astext(p: Column) -> Column:
    """WKT text of a point (reference st_astext/st_aswkt)."""
    return F.format_string("POINT(%s %s)", p.getField("x"), p.getField("y"))


def st_npoints(ring: Column) -> Column:
    return F.size(ring)


def point_in_polygon(px, py, poly: str) -> Column:
    """Ray-cast containment: point (px,py) inside ring column `poly`
    (array<struct<x,y>>, closed or open).  Reference geo.rs:383
    (`point_in_polygon_fn`, ClickHouse semantics).

    Pure HOF expression — `aggregate` over edge indices flips a parity
    boolean per crossing, so it runs inside codegen and vectorizes; no UDF,
    no explode, no shuffle.
    """
    px_s = px if isinstance(px, str) else str(px)
    py_s = py if isinstance(py, str) else str(py)
    # edge i joins vertex i and i+1 (wrapping); identical for closed rings
    # because the duplicate closing vertex yields a zero-length edge.
    return F.expr(
        f"""
        aggregate(
          sequence(1, size({poly})),
          false,
          (acc, i) -> (
            CASE WHEN (
              (element_at({poly}, i).y > ({py_s}))
                != (element_at({poly}, IF(i = size({poly}), 1, i + 1)).y > ({py_s}))
              AND ({px_s}) <
                (element_at({poly}, IF(i = size({poly}), 1, i + 1)).x
                   - element_at({poly}, i).x)
                * (({py_s}) - element_at({poly}, i).y)
                / (element_at({poly}, IF(i = size({poly}), 1, i + 1)).y
                   - element_at({poly}, i).y)
                + element_at({poly}, i).x
            ) THEN NOT acc ELSE acc END
          )
        )
        """
    )


def point_in_ellipses(px, py, ellipses: list[tuple[float, float, float, float]]) -> Column:
    """True if the point is inside ANY ellipse (cx, cy, a, b).
    Reference geo.rs:513 (`point_in_ellipses_fn`)."""
    px, py = _c(px), _c(py)
    cond = F.lit(False)
    for cx, cy, a, b in ellipses:
        d = ((px - F.lit(cx)) / F.lit(a)) ** 2 + ((py - F.lit(cy)) / F.lit(b)) ** 2
        cond = cond | (d <= 1.0)
    return cond


def geo_to_h3(lon, lat, res):  # pragma: no cover - capability stub
    """H3 indexing requires the real H3 icosahedral library (absent from
    this image); reference geo.rs:97 binds the `h3o` crate. A re-derivation
    would silently mis-bucket, so this is an explicit capability error."""
    raise NotImplementedError(
        "geo_to_h3 needs the H3 library (h3 PyPI package / h3-java jar); "
        "not available in this environment"
    )
