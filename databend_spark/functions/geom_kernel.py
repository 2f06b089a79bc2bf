"""Pure-Python computational-geometry kernel for the GEOMETRY type.

Implements the reference's geometry surface (constructors, predicates,
measures, transforms — reference
``src/query/functions/src/scalars/geographic/src/geometry.rs``, EWKB
model per ``types/geometry.rs``) without any native geo library: the
container has no shapely/pyproj, so everything here is from-scratch
classic computational geometry.

Internal model: ``(srid, kind, coords)`` where
  POINT              -> [x, y]            (None = EMPTY)
  LINESTRING/MULTIPOINT -> [[x, y], ...]
  POLYGON/MULTILINESTRING -> [ring/line, ...] (each a coord list)
  MULTIPOLYGON       -> [[ring, ...], ...]
  GEOMETRYCOLLECTION -> [(kind, coords), ...]

srid is None when never set (prints nothing, ST_SRID -> 0) and an int —
including 0 — when explicitly set (EWKB then carries the SRID flag, as
geozero does; EWKT omits ``SRID=0;``).

Numeric conventions copied from the reference (so SLT text matches):
measures round to 9 decimals, ST_TRANSFORM coordinates to 6.
"""

from __future__ import annotations

import json
import math
import re
import struct

_KINDS = {
    "POINT": 1,
    "LINESTRING": 2,
    "POLYGON": 3,
    "MULTIPOINT": 4,
    "MULTILINESTRING": 5,
    "MULTIPOLYGON": 6,
    "GEOMETRYCOLLECTION": 7,
}
_CODE_TO_KIND = {v: k for k, v in _KINDS.items()}

_GEOJSON_TYPES = {
    "Point": "POINT",
    "LineString": "LINESTRING",
    "Polygon": "POLYGON",
    "MultiPoint": "MULTIPOINT",
    "MultiLineString": "MULTILINESTRING",
    "MultiPolygon": "MULTIPOLYGON",
    "GeometryCollection": "GEOMETRYCOLLECTION",
}
_KIND_TO_GEOJSON = {v: k for k, v in _GEOJSON_TYPES.items()}


class GeometryError(ValueError):
    pass


# --------------------------------------------------------------------------
# WKT / EWKT parsing
# --------------------------------------------------------------------------

def parse_wkt(text: str):
    t = text.strip()
    srid = None
    m = re.match(r"^SRID\s*=\s*(\d+)\s*;\s*", t, re.I)
    if m:
        srid = int(m.group(1))
        t = t[m.end():]
    m = re.match(r"^([A-Za-z]+)\s*", t)
    if not m or m.group(1).upper() not in _KINDS:
        raise GeometryError(f"invalid WKT: {text[:80]!r}")
    kind = m.group(1).upper()
    rest = t[m.end():].strip()
    if rest.upper() == "EMPTY":
        return srid, kind, None if kind == "POINT" else []
    if not (rest.startswith("(") and rest.endswith(")")):
        raise GeometryError(f"invalid WKT body: {text[:80]!r}")
    body = rest[1:-1]
    return srid, kind, _parse_wkt_body(kind, body)


def _split_top(body: str) -> list[str]:
    """Split on top-level commas (depth 0)."""
    parts, depth, buf = [], 0, ""
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(buf)
            buf = ""
        else:
            buf += ch
    parts.append(buf)
    return parts


def _coord(tok: str) -> list[float]:
    xs = tok.split()
    if len(xs) < 2:
        raise GeometryError(f"bad coordinate {tok!r}")
    return [float(xs[0]), float(xs[1])]


def _coords(body: str) -> list:
    return [_coord(p.strip().strip("()").strip()) for p in _split_top(body)]


def _parse_wkt_body(kind: str, body: str):
    if kind == "POINT":
        return _coord(body.strip())
    if kind in ("LINESTRING", "MULTIPOINT"):
        return _coords(body)
    if kind in ("POLYGON", "MULTILINESTRING"):
        out = []
        for part in _split_top(body):
            p = part.strip()
            if p.upper() == "EMPTY":
                out.append([])
            else:
                out.append(_coords(p[1:-1]))
        return out
    if kind == "MULTIPOLYGON":
        out = []
        for part in _split_top(body):
            p = part.strip()
            if p.upper() == "EMPTY":
                out.append([])
            else:
                out.append(_parse_wkt_body("POLYGON", p[1:-1]))
        return out
    if kind == "GEOMETRYCOLLECTION":
        subs = []
        for part in _split_top(body):
            p = part.strip()
            if not p:
                continue
            _, k, c = parse_wkt(p)
            subs.append((k, c))
        return subs
    raise GeometryError(f"unsupported WKT type {kind}")


# --------------------------------------------------------------------------
# (E)WKB encode / decode
# --------------------------------------------------------------------------

def to_ewkb(srid, kind: str, coords, with_srid: bool = True) -> bytes:
    out = bytearray()
    _wkb_write(out, srid if with_srid else None, kind, coords, top=True)
    return bytes(out)


def _wkb_write(out: bytearray, srid, kind: str, coords, top: bool) -> None:
    out.append(1)  # little-endian
    code = _KINDS[kind]
    if top and srid is not None:
        out += struct.pack("<I", code | 0x20000000)
        out += struct.pack("<I", srid)
    else:
        out += struct.pack("<I", code)
    if kind == "POINT":
        if coords is None:  # POINT EMPTY = NaN NaN (PostGIS convention)
            out += struct.pack("<dd", float("nan"), float("nan"))
        else:
            out += struct.pack("<dd", coords[0], coords[1])
    elif kind == "LINESTRING":
        out += struct.pack("<I", len(coords))
        for p in coords:
            out += struct.pack("<dd", p[0], p[1])
    elif kind == "POLYGON":
        out += struct.pack("<I", len(coords))
        for ring in coords:
            out += struct.pack("<I", len(ring))
            for p in ring:
                out += struct.pack("<dd", p[0], p[1])
    elif kind == "MULTIPOINT":
        out += struct.pack("<I", len(coords))
        for p in coords:
            _wkb_write(out, None, "POINT", p, top=False)
    elif kind == "MULTILINESTRING":
        out += struct.pack("<I", len(coords))
        for line in coords:
            _wkb_write(out, None, "LINESTRING", line, top=False)
    elif kind == "MULTIPOLYGON":
        out += struct.pack("<I", len(coords))
        for poly in coords:
            _wkb_write(out, None, "POLYGON", poly, top=False)
    elif kind == "GEOMETRYCOLLECTION":
        out += struct.pack("<I", len(coords))
        for k, c in coords:
            _wkb_write(out, None, k, c, top=False)
    else:
        raise GeometryError(f"unsupported kind {kind}")


def parse_wkb(data: bytes):
    srid, kind, coords, _ = _wkb_read(data, 0)
    return srid, kind, coords


def _wkb_read(data: bytes, off: int):
    if off + 5 > len(data):
        raise GeometryError("truncated WKB")
    bo = data[off]
    if bo == 1:
        end = "<"
    elif bo == 0:
        end = ">"
    else:
        raise GeometryError("bad WKB byte order")
    (raw,) = struct.unpack_from(end + "I", data, off + 1)
    off += 5
    srid = None
    code = raw & 0xFF
    if raw & 0x20000000:
        (srid,) = struct.unpack_from(end + "I", data, off)
        off += 4
    kind = _CODE_TO_KIND.get(code)
    if kind is None:
        raise GeometryError(f"unsupported WKB type {raw}")

    def rd_point():
        nonlocal off
        x, y = struct.unpack_from(end + "dd", data, off)
        off += 16
        return [x, y]

    def rd_n():
        nonlocal off
        (n,) = struct.unpack_from(end + "I", data, off)
        off += 4
        return n

    if kind == "POINT":
        p = rd_point()
        if math.isnan(p[0]) and math.isnan(p[1]):
            return srid, kind, None, off
        return srid, kind, p, off
    if kind == "LINESTRING":
        return srid, kind, [rd_point() for _ in range(rd_n())], off
    if kind == "POLYGON":
        return (
            srid,
            kind,
            [[rd_point() for _ in range(rd_n())] for _ in range(rd_n())],
            off,
        )
    n = rd_n()
    subs = []
    for _ in range(n):
        s2, k2, c2, off = _wkb_read(data, off)
        subs.append((k2, c2))
    if kind == "MULTIPOINT":
        return srid, kind, [c for _, c in subs], off
    if kind == "MULTILINESTRING":
        return srid, kind, [c for _, c in subs], off
    if kind == "MULTIPOLYGON":
        return srid, kind, [c for _, c in subs], off
    return srid, kind, subs, off  # GEOMETRYCOLLECTION


# --------------------------------------------------------------------------
# GeoJSON
# --------------------------------------------------------------------------

def parse_geojson(obj):
    if isinstance(obj, str):
        obj = json.loads(obj)
    if not isinstance(obj, dict):
        raise GeometryError("GeoJSON must be an object")
    t = obj.get("type")
    kind = _GEOJSON_TYPES.get(t or "")
    if kind is None:
        raise GeometryError(f"bad GeoJSON type {t!r}")
    if kind == "GEOMETRYCOLLECTION":
        subs = []
        for g in obj.get("geometries", []):
            _, k, c = parse_geojson(g)
            subs.append((k, c))
        return None, kind, subs
    coords = obj.get("coordinates")
    if coords is None or coords == []:
        raise GeometryError("GeoJSON missing coordinates")

    def conv(c, depth):
        if depth == 0:
            return [float(c[0]), float(c[1])]
        return [conv(x, depth - 1) for x in c]

    depth = {
        "POINT": 0,
        "LINESTRING": 1,
        "MULTIPOINT": 1,
        "POLYGON": 2,
        "MULTILINESTRING": 2,
        "MULTIPOLYGON": 3,
    }[kind]
    return None, kind, conv(coords, depth)


# --------------------------------------------------------------------------
# Universal input: WKT / EWKT / hex WKB / raw WKB / GeoJSON
# --------------------------------------------------------------------------

def parse_any(value, srid=None):
    """TO_GEOMETRY input dispatch (reference geometry.rs to_geometry).

    value: str or bytes. Optional srid overrides the parsed one.
    Returns (srid, kind, coords)."""
    if value is None:
        return None
    if isinstance(value, (bytes, bytearray)):
        s, k, c = parse_wkb(bytes(value))
    else:
        t = str(value).strip()
        if t.lower() == "null":
            return None
        if t.startswith("{"):
            s, k, c = parse_geojson(t)
        elif re.fullmatch(r"(?:0[01])(?:[0-9a-fA-F]{2})+", t):
            s, k, c = parse_wkb(bytes.fromhex(t))
        else:
            s, k, c = parse_wkt(t)
    if srid is not None:
        s = int(srid)
    return s, k, c


# --------------------------------------------------------------------------
# Text output
# --------------------------------------------------------------------------

def fmt_num(v: float) -> str:
    """Rust f64 Display equivalent: integral values print without the
    fraction; others use the shortest round-trip form (Python repr uses
    the same shortest-repr algorithm)."""
    if v != v or v in (float("inf"), float("-inf")):
        return repr(v)
    if abs(v) < 1e16 and float(v).is_integer():
        return str(int(v))
    r = repr(float(v))
    if "e" in r or "E" in r:  # Rust Display never uses scientific form
        from decimal import Decimal

        r = format(Decimal(r), "f")
    return r


def _wkt_pt(p) -> str:
    return f"{fmt_num(p[0])} {fmt_num(p[1])}"


def _wkt_seq(coords) -> str:
    return ",".join(_wkt_pt(p) for p in coords)


def wkt_body(kind: str, coords) -> str:
    if kind == "POINT":
        if coords is None:
            return "POINT EMPTY"
        return f"POINT({_wkt_pt(coords)})"
    if kind == "LINESTRING":
        return f"LINESTRING({_wkt_seq(coords)})"
    if kind == "MULTIPOINT":
        return f"MULTIPOINT({_wkt_seq(coords)})"
    if kind == "POLYGON":
        rings = ",".join(f"({_wkt_seq(r)})" for r in coords)
        return f"POLYGON({rings})"
    if kind == "MULTILINESTRING":
        lines = ",".join(
            "EMPTY" if not ln else f"({_wkt_seq(ln)})" for ln in coords
        )
        return f"MULTILINESTRING({lines})"
    if kind == "MULTIPOLYGON":
        polys = ",".join(
            "(" + ",".join(f"({_wkt_seq(r)})" for r in poly) + ")"
            for poly in coords
        )
        return f"MULTIPOLYGON({polys})"
    if kind == "GEOMETRYCOLLECTION":
        subs = ",".join(wkt_body(k, c) for k, c in coords)
        return f"GEOMETRYCOLLECTION({subs})"
    raise GeometryError(f"unsupported kind {kind}")


def to_ewkt(srid, kind, coords) -> str:
    body = wkt_body(kind, coords)
    if srid:  # geozero omits SRID=0
        return f"SRID={srid};{body}"
    return body


def _gj_coords(kind: str, coords):
    def seq(cs):
        return "[" + ",".join(f"[{fmt_num(p[0])},{fmt_num(p[1])}]" for p in cs) + "]"

    if kind == "POINT":
        return f"[{fmt_num(coords[0])},{fmt_num(coords[1])}]"
    if kind in ("LINESTRING", "MULTIPOINT"):
        return seq(coords)
    if kind in ("POLYGON", "MULTILINESTRING"):
        return "[" + ",".join(seq(r) for r in coords) + "]"
    if kind == "MULTIPOLYGON":
        return (
            "["
            + ",".join("[" + ",".join(seq(r) for r in poly) + "]" for poly in coords)
            + "]"
        )
    raise GeometryError("GeoJSON output unsupported for collections")


def to_geojson_pretty(kind, coords) -> str:
    """geozero-style: {"type": "X", "coordinates": [...]}."""
    return (
        f'{{"type": "{_KIND_TO_GEOJSON[kind]}", '
        f'"coordinates": {_gj_coords(kind, coords)}}}'
    )


def to_geojson_compact(kind, coords) -> str:
    """serde-style alphabetical keys: {"coordinates":...,"type":"X"}."""
    return (
        f'{{"coordinates":{_gj_coords(kind, coords)},'
        f'"type":"{_KIND_TO_GEOJSON[kind]}"}}'
    )


# --------------------------------------------------------------------------
# Coordinate iterators
# --------------------------------------------------------------------------

def _all_points(kind, coords):
    if coords is None:
        return
    if kind == "POINT":
        yield coords
    elif kind in ("LINESTRING", "MULTIPOINT"):
        yield from coords
    elif kind in ("POLYGON", "MULTILINESTRING"):
        for part in coords:
            yield from part
    elif kind == "MULTIPOLYGON":
        for poly in coords:
            for ring in poly:
                yield from ring
    elif kind == "GEOMETRYCOLLECTION":
        for k, c in coords:
            yield from _all_points(k, c)


def _segments(kind, coords):
    """All line segments (boundary segments for polygons)."""
    if coords is None:
        return
    if kind == "LINESTRING":
        for a, b in zip(coords, coords[1:]):
            yield a, b
    elif kind in ("POLYGON", "MULTILINESTRING"):
        for part in coords:
            for a, b in zip(part, part[1:]):
                yield a, b
    elif kind == "MULTIPOLYGON":
        for poly in coords:
            for ring in poly:
                for a, b in zip(ring, ring[1:]):
                    yield a, b
    elif kind == "GEOMETRYCOLLECTION":
        for k, c in coords:
            yield from _segments(k, c)


def _polygons(kind, coords):
    """Yield each polygon as a ring list."""
    if kind == "POLYGON":
        yield coords
    elif kind == "MULTIPOLYGON":
        yield from coords
    elif kind == "GEOMETRYCOLLECTION":
        for k, c in coords:
            yield from _polygons(k, c)


# --------------------------------------------------------------------------
# Scalar geometry helpers
# --------------------------------------------------------------------------

_EPS = 1e-9


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _on_segment(p, a, b) -> bool:
    if abs(_cross(a, b, p)) > _EPS * max(
        1.0, abs(p[0]), abs(p[1]), abs(a[0]), abs(a[1]), abs(b[0]), abs(b[1])
    ):
        return False
    return (
        min(a[0], b[0]) - _EPS <= p[0] <= max(a[0], b[0]) + _EPS
        and min(a[1], b[1]) - _EPS <= p[1] <= max(a[1], b[1]) + _EPS
    )


def _segs_intersect(a, b, c, d) -> bool:
    """Closed-segment intersection (touching counts)."""
    d1 = _cross(c, d, a)
    d2 = _cross(c, d, b)
    d3 = _cross(a, b, c)
    d4 = _cross(a, b, d)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and d1 and d2 and d3 and d4:
        return True
    return (
        _on_segment(a, c, d)
        or _on_segment(b, c, d)
        or _on_segment(c, a, b)
        or _on_segment(d, a, b)
    )


def _segs_cross_properly(a, b, c, d) -> bool:
    """True when the open interiors cross (transversal crossing)."""
    d1 = _cross(c, d, a)
    d2 = _cross(c, d, b)
    d3 = _cross(a, b, c)
    d4 = _cross(a, b, d)
    scale = max(
        1.0,
        *(abs(v) for p in (a, b, c, d) for v in p),
    )
    tol = _EPS * scale * scale
    return (
        ((d1 > tol and d2 < -tol) or (d1 < -tol and d2 > tol))
        and ((d3 > tol and d4 < -tol) or (d3 < -tol and d4 > tol))
    )


def _pt_in_rings(p, rings) -> int:
    """2 = interior, 1 = boundary, 0 = outside (even-odd with holes)."""
    for ring in rings:
        for a, b in zip(ring, ring[1:]):
            if _on_segment(p, a, b):
                return 1
    inside = False
    x, y = p
    for ring in rings:
        n = len(ring) - 1
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[i + 1]
            if (y1 > y) != (y2 > y):
                xin = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                if xin > x:
                    inside = not inside
    return 2 if inside else 0


def _seg_pt_dist(p, a, b) -> float:
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    ln2 = dx * dx + dy * dy
    if ln2 == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / ln2))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def _ring_area(ring) -> float:
    s = 0.0
    for a, b in zip(ring, ring[1:]):
        s += a[0] * b[1] - b[0] * a[1]
    return s / 2.0


def _round9(v: float) -> float:
    return math.floor(v * 1e9 + 0.5) / 1e9 if v >= 0 else -math.floor(-v * 1e9 + 0.5) / 1e9


# --------------------------------------------------------------------------
# Measures
# --------------------------------------------------------------------------

def area(kind, coords) -> float:
    total = 0.0
    for poly in _polygons(kind, coords):
        if not poly:
            continue
        total += abs(_ring_area(poly[0]))
        for hole in poly[1:]:
            total -= abs(_ring_area(hole))
    return _round9(total)


def perimeter(kind, coords) -> float:
    total = 0.0
    for poly in _polygons(kind, coords):
        for ring in poly:
            for a, b in zip(ring, ring[1:]):
                total += math.hypot(b[0] - a[0], b[1] - a[1])
    return _round9(total)


def length(kind, coords) -> float:
    total = 0.0
    if kind in ("LINESTRING", "MULTILINESTRING") or kind == "GEOMETRYCOLLECTION":
        segs = (
            _segments(kind, coords)
            if kind != "GEOMETRYCOLLECTION"
            else (
                s
                for k, c in coords
                if k in ("LINESTRING", "MULTILINESTRING")
                for s in _segments(k, c)
            )
        )
        for a, b in segs:
            total += math.hypot(b[0] - a[0], b[1] - a[1])
    return _round9(total)


def bbox(kind, coords):
    xs, ys = [], []
    for p in _all_points(kind, coords):
        if p is None or math.isnan(p[0]):
            continue
        xs.append(p[0])
        ys.append(p[1])
    if not xs:
        return None
    return min(xs), min(ys), max(xs), max(ys)


def centroid(kind, coords):
    if kind == "POINT":
        return coords
    if kind == "MULTIPOINT":
        n = len(coords)
        return [sum(p[0] for p in coords) / n, sum(p[1] for p in coords) / n]
    if kind in ("LINESTRING", "MULTILINESTRING"):
        sx = sy = sl = 0.0
        for a, b in _segments(kind, coords):
            ln = math.hypot(b[0] - a[0], b[1] - a[1])
            sx += (a[0] + b[0]) / 2 * ln
            sy += (a[1] + b[1]) / 2 * ln
            sl += ln
        if sl == 0:
            return centroid("MULTIPOINT", [p for p in _all_points(kind, coords)])
        return [sx / sl, sy / sl]
    if kind in ("POLYGON", "MULTIPOLYGON"):
        sa = sx = sy = 0.0
        for poly in _polygons(kind, coords):
            for i, ring in enumerate(poly):
                a2 = _ring_area(ring)
                sgn = 1.0 if i == 0 else -1.0
                a2 = abs(a2) * sgn
                cx = cy = 0.0
                den = 0.0
                for p, q in zip(ring, ring[1:]):
                    w = p[0] * q[1] - q[0] * p[1]
                    cx += (p[0] + q[0]) * w
                    cy += (p[1] + q[1]) * w
                    den += w
                if den:
                    cx /= 3 * den
                    cy /= 3 * den
                sx += cx * a2
                sy += cy * a2
                sa += a2
        if sa == 0:
            return centroid("MULTIPOINT", [p for p in _all_points(kind, coords)])
        return [sx / sa, sy / sa]
    raise GeometryError(f"st_centroid: unsupported {kind}")


def distance(k1, c1, k2, c2) -> float:
    if intersects(k1, c1, k2, c2):
        return 0.0
    best = math.inf
    pts1 = list(_all_points(k1, c1))
    pts2 = list(_all_points(k2, c2))
    segs1 = list(_segments(k1, c1))
    segs2 = list(_segments(k2, c2))
    for p in pts1:
        for q in pts2:
            best = min(best, math.hypot(p[0] - q[0], p[1] - q[1]))
        for a, b in segs2:
            best = min(best, _seg_pt_dist(p, a, b))
    for q in pts2:
        for a, b in segs1:
            best = min(best, _seg_pt_dist(q, a, b))
    return _round9(best if best < math.inf else float("nan"))


def hausdorff(k1, c1, k2, c2) -> float:
    """Coordinate-based Hausdorff distance (matches the geo crate, which
    computes over the coordinate sets)."""
    a = list(_all_points(k1, c1))
    b = list(_all_points(k2, c2))

    def one_way(src, dst):
        worst = 0.0
        for p in src:
            best = min(math.hypot(p[0] - q[0], p[1] - q[1]) for q in dst)
            worst = max(worst, best)
        return worst

    return _round9(max(one_way(a, b), one_way(b, a)))


def azimuth(k1, c1, k2, c2):
    if k1 != "POINT" or k2 != "POINT":
        raise GeometryError("st_azimuth only accepts Point geometries")
    if c1 == c2:
        return None
    az = math.atan2(c2[0] - c1[0], c2[1] - c1[1])
    if az < 0:
        az += 2 * math.pi
    return _round9(az)


# --------------------------------------------------------------------------
# Predicates
# --------------------------------------------------------------------------

def intersects(k1, c1, k2, c2) -> bool:
    rings1 = [r for poly in _polygons(k1, c1) for r in [poly]]
    rings2 = [r for poly in _polygons(k2, c2) for r in [poly]]
    # any vertex of one inside/on the other's polygons
    for poly in rings1:
        for p in _all_points(k2, c2):
            if _pt_in_rings(p, poly):
                return True
    for poly in rings2:
        for p in _all_points(k1, c1):
            if _pt_in_rings(p, poly):
                return True
    segs1 = list(_segments(k1, c1))
    segs2 = list(_segments(k2, c2))
    for a, b in segs1:
        for c, d in segs2:
            if _segs_intersect(a, b, c, d):
                return True
    # point-vs-point / point-vs-line
    pts1 = list(_all_points(k1, c1))
    pts2 = list(_all_points(k2, c2))
    if k1 in ("POINT", "MULTIPOINT"):
        for p in pts1:
            for c, d in segs2:
                if _on_segment(p, c, d):
                    return True
            for q in pts2:
                if abs(p[0] - q[0]) <= _EPS and abs(p[1] - q[1]) <= _EPS:
                    return True
    if k2 in ("POINT", "MULTIPOINT"):
        for q in pts2:
            for a, b in segs1:
                if _on_segment(q, a, b):
                    return True
    return False


def _covers_impl(k1, c1, k2, c2, need_interior: bool) -> bool:
    """B inside closure(A); with need_interior, some point of B must be
    in A's interior (ST_CONTAINS vs ST_COVERS)."""
    polys = list(_polygons(k1, c1))
    if polys:
        probes = list(_all_points(k2, c2))
        # midpoints guard segments that would leave through a notch
        for a, b in _segments(k2, c2):
            probes.append([(a[0] + b[0]) / 2, (a[1] + b[1]) / 2])
        # a polygon B contributes an interior representative
        for poly in _polygons(k2, c2):
            if poly:
                ring = poly[0][:-1]
                probes.append(
                    [
                        sum(p[0] for p in ring) / len(ring),
                        sum(p[1] for p in ring) / len(ring),
                    ]
                )
        statuses = []
        for p in probes:
            s = max(_pt_in_rings(p, poly) for poly in polys)
            if s == 0:
                return False
            statuses.append(s)
        # no proper boundary crossing by B's segments
        for a, b in _segments(k2, c2):
            for poly in polys:
                for ring in poly:
                    for c, d in zip(ring, ring[1:]):
                        if _segs_cross_properly(a, b, c, d):
                            return False
        if need_interior and all(s == 1 for s in statuses):
            return False
        return True
    # line A covering points/lines
    segs1 = list(_segments(k1, c1))
    if segs1:
        probes = list(_all_points(k2, c2))
        for a, b in _segments(k2, c2):
            probes.append([(a[0] + b[0]) / 2, (a[1] + b[1]) / 2])
        return all(
            any(_on_segment(p, a, b) for a, b in segs1) for p in probes
        )
    # point A: covers only identical points
    pts1 = list(_all_points(k1, c1))
    pts2 = list(_all_points(k2, c2))
    if not pts2 or list(_segments(k2, c2)) or list(_polygons(k2, c2)):
        return False
    return all(
        any(abs(p[0] - q[0]) <= _EPS and abs(p[1] - q[1]) <= _EPS for q in pts1)
        for p in pts2
    )


def covers(k1, c1, k2, c2) -> bool:
    return _covers_impl(k1, c1, k2, c2, need_interior=False)


def contains(k1, c1, k2, c2) -> bool:
    return _covers_impl(k1, c1, k2, c2, need_interior=True)


def _canon_ring(ring):
    r = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else ring[:]
    if len(r) >= 3 and _ring_area(r + [r[0]]) < 0:
        r = list(reversed(r))
    i = min(range(len(r)), key=lambda j: (r[j][0], r[j][1]))
    return tuple(map(tuple, r[i:] + r[:i]))


def _canon(kind, coords):
    if kind == "POINT":
        return ("PT", (None if coords is None else tuple(coords),))
    if kind == "MULTIPOINT":
        return ("MPT", tuple(sorted(map(tuple, coords))))
    if kind in ("LINESTRING",):
        t = tuple(map(tuple, coords))
        return ("LN", frozenset([t, tuple(reversed(t))]))
    if kind == "MULTILINESTRING":
        return (
            "MLN",
            frozenset(
                frozenset([tuple(map(tuple, ln)), tuple(reversed([tuple(p) for p in ln]))])
                for ln in coords
            ),
        )
    if kind in ("POLYGON", "MULTIPOLYGON"):
        polys = list(_polygons(kind, coords))
        return (
            "PG",
            frozenset(
                tuple(sorted(_canon_ring(r) for r in poly)) for poly in polys
            ),
        )
    if kind == "GEOMETRYCOLLECTION":
        return ("GC", frozenset(_canon(k, c) for k, c in coords))
    raise GeometryError(kind)


def equals(k1, c1, k2, c2) -> bool:
    """Topological-ish equality: rotation/orientation-insensitive rings,
    polygon == its singleton multipolygon, reversed lines equal."""
    if k1 == "POINT" and k2 == "MULTIPOINT" and len(c2) == 1:
        return _canon(k1, c1)[1] == (tuple(c2[0]),)
    if k2 == "POINT" and k1 == "MULTIPOINT" and len(c1) == 1:
        return _canon(k2, c2)[1] == (tuple(c1[0]),)
    return _canon(k1, c1) == _canon(k2, c2)


def is_valid(kind, coords) -> bool:
    for poly in _polygons(kind, coords):
        for ring in poly:
            if len(ring) < 4 or ring[0] != ring[-1]:
                return False
            n = len(ring) - 1
            for i in range(n):
                for j in range(i + 1, n):
                    if j == i + 1 or (i == 0 and j == n - 1):
                        continue
                    if _segs_intersect(
                        ring[i], ring[i + 1], ring[j], ring[j + 1]
                    ):
                        return False
    return True


# --------------------------------------------------------------------------
# Constructive ops
# --------------------------------------------------------------------------

def envelope(kind, coords):
    bb = bbox(kind, coords)
    if bb is None:
        raise GeometryError("st_envelope of empty geometry")
    x0, y0, x1, y1 = bb
    return "POLYGON", [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]


def convex_hull(kind, coords):
    """geo-crate quick_hull parity: lexicographic min/max anchors; CCW
    output starting with the side scanned from max->min; inputs of fewer
    than 4 coords keep their order (trivial hull)."""
    pts = [tuple(p) for p in _all_points(kind, coords)]
    if not pts:
        raise GeometryError("st_convexhull of empty geometry")
    if len(pts) < 4:
        ring = [list(p) for p in pts]
        if len(ring) >= 3 and _ring_area(ring + [ring[0]]) < 0:
            ring.reverse()
        ring.append(list(ring[0]))
        return "POLYGON", [ring]
    mn = min(pts)
    mx = max(pts)
    rest = [p for p in pts if p != mn and p != mx]
    hull: list = []

    def is_ccw(a, b, p):
        return _cross(a, p, b) < 0  # p strictly left of a->b

    def hull_set(a, b, subset):
        if not subset:
            return
        furthest = max(subset, key=lambda p: abs(_cross(a, b, p)))
        left1 = [p for p in subset if is_ccw(a, furthest, p)]
        hull_set(a, furthest, left1)
        hull.append(furthest)
        left2 = [p for p in subset if is_ccw(furthest, b, p)]
        hull_set(furthest, b, left2)

    hull_set(mx, mn, [p for p in rest if is_ccw(mx, mn, p)])
    hull.append(mx)
    hull_set(mn, mx, [p for p in rest if is_ccw(mn, mx, p)])
    hull.append(mn)
    ring = [list(p) for p in hull]
    ring.append(list(ring[0]))
    return "POLYGON", [ring]


def _dp(points, eps):
    if len(points) < 3:
        return points[:]
    a, b = points[0], points[-1]
    idx, dmax = 0, 0.0
    for i in range(1, len(points) - 1):
        d = _seg_pt_dist(points[i], a, b)
        if d > dmax:
            idx, dmax = i, d
    if dmax > eps:
        left = _dp(points[: idx + 1], eps)
        right = _dp(points[idx:], eps)
        return left[:-1] + right
    return [points[0], points[-1]]


def simplify(kind, coords, eps):
    if kind == "GEOMETRYCOLLECTION":
        raise GeometryError("st_simplify does not support GeometryCollection")
    if kind == "POINT" or kind == "MULTIPOINT":
        return kind, coords
    if kind == "LINESTRING":
        return kind, _dp(coords, eps)
    if kind == "MULTILINESTRING":
        return kind, [_dp(ln, eps) for ln in coords]
    if kind == "POLYGON":
        return kind, [_dp(r, eps) for r in coords]
    if kind == "MULTIPOLYGON":
        return kind, [[_dp(r, eps) for r in poly] for poly in coords]
    raise GeometryError(kind)


def make_polygon(kind, coords, oriented: bool):
    if kind != "LINESTRING":
        raise GeometryError(
            f"Type {kind} is not supported as argument to st_makepolygon"
        )
    if len(coords) < 4:
        raise GeometryError(
            f"Input lines must have at least 4 points, but got {len(coords)}"
        )
    if coords[0] != coords[-1]:
        raise GeometryError("The first point and last point are not equal")
    poly = [list(map(list, coords))]
    if oriented and not is_valid("POLYGON", poly):
        raise GeometryError("Input line does not form a valid polygon")
    return "POLYGON", poly


def make_line(k1, c1, k2, c2):
    def seq(kind, coords):
        if kind == "POINT":
            return [coords]
        if kind in ("LINESTRING", "MULTIPOINT"):
            return list(coords)
        raise GeometryError(f"st_makeline does not support {kind}")

    return "LINESTRING", seq(k1, c1) + seq(k2, c2)


def point_n(kind, coords, n: int):
    if kind != "LINESTRING":
        raise GeometryError("st_pointn expects a LineString")
    ln = len(coords)
    i = n - 1 if n > 0 else ln + n
    if not (0 <= i < ln):
        raise GeometryError(f"point index {n} out of range")
    return "POINT", list(coords[i])


def dimension(kind, coords):
    if kind in ("POINT", "MULTIPOINT"):
        return 0
    if kind in ("LINESTRING", "MULTILINESTRING"):
        return 1
    if kind in ("POLYGON", "MULTIPOLYGON"):
        return 2
    if kind == "GEOMETRYCOLLECTION":
        dims = [dimension(k, c) for k, c in coords if c not in (None, [])]
        return max(dims) if dims else 0
    raise GeometryError(kind)


def n_points(kind, coords) -> int:
    return sum(1 for _ in _all_points(kind, coords))


# --------------------------------------------------------------------------
# Buffer (reference: geo buffer_with_style; result is a MultiPolygon)
# --------------------------------------------------------------------------

_CIRCLE_SEGS = 32


def _disk(cx, cy, r):
    ring = []
    for i in range(_CIRCLE_SEGS):
        a = 2 * math.pi * i / _CIRCLE_SEGS
        ring.append([cx + r * math.cos(a), cy + r * math.sin(a)])
    ring.append(list(ring[0]))
    return [ring]


def _capsule(a, b, r):
    """Rounded rectangle around segment ab."""
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    ln = math.hypot(dx, dy)
    if ln == 0:
        return _disk(ax, ay, r)
    ux, uy = dx / ln, dy / ln
    nx, ny = -uy, ux
    half = _CIRCLE_SEGS // 2
    base = math.atan2(ny, nx)
    ring = [[ax + r * nx, ay + r * ny], [bx + r * nx, by + r * ny]]
    for i in range(1, half):
        t = base - math.pi * i / half
        ring.append([bx + r * math.cos(t), by + r * math.sin(t)])
    ring.append([bx - r * nx, by - r * ny])
    ring.append([ax - r * nx, ay - r * ny])
    for i in range(1, half):
        t = base + math.pi + -math.pi * i / half
        ring.append([ax + r * math.cos(t), ay + r * math.sin(t)])
    ring.append(list(ring[0]))
    return [ring]


def _offset_ring(ring, d):
    """Miter-offset a closed ring outward by d (CCW ring, positive d =
    outward). Returns None when the offset collapses."""
    pts = ring[:-1]
    n = len(pts)
    if n < 3:
        return None
    ccw = _ring_area(ring) > 0
    out = []
    kept = []
    for i in range(n):
        p0 = pts[(i - 1) % n]
        p1 = pts[i]
        p2 = pts[(i + 1) % n]
        # edge normals (outward for CCW = right-hand of direction)
        def norm(a, b):
            dx, dy = b[0] - a[0], b[1] - a[1]
            ln = math.hypot(dx, dy)
            if ln == 0:
                return None
            if ccw:
                return (dy / ln, -dx / ln)
            return (-dy / ln, dx / ln)

        n1 = norm(p0, p1)
        n2 = norm(p1, p2)
        if n1 is None or n2 is None:
            continue
        sx, sy = n1[0] + n2[0], n1[1] + n2[1]
        ln2 = sx * sx + sy * sy
        if ln2 < 1e-12:
            continue
        k = 2 * d / ln2
        out.append([p1[0] + k * sx, p1[1] + k * sy])
        kept.append(i)
    if len(out) < 3:
        return None
    out.append(list(out[0]))
    # collapsed / inverted offsets flip orientation or reverse an edge's
    # direction (an inward offset past the width maps the square onto an
    # inside-out copy with the SAME orientation — the edge-direction dot
    # test catches that case too)
    if (_ring_area(out) > 0) != ccw:
        return None
    for j in range(len(kept)):
        i0, i1 = kept[j], kept[(j + 1) % len(kept)]
        odx = pts[i1][0] - pts[i0][0]
        ody = pts[i1][1] - pts[i0][1]
        ndx = out[j + 1][0] - out[j][0]
        ndy = out[j + 1][1] - out[j][1]
        if odx * ndx + ody * ndy <= 0:
            return None
    return out


def buffer(kind, coords, dist):
    """Returns (kind, coords) of a MULTIPOLYGON, or None (empty)."""
    if kind == "GEOMETRYCOLLECTION":
        raise GeometryError("ST_BUFFER is not supported for GeometryCollection")
    eff = abs(dist) if kind in (
        "POINT", "MULTIPOINT", "LINESTRING", "MULTILINESTRING"
    ) else dist
    if eff == 0.0:
        if kind == "POLYGON":
            return "MULTIPOLYGON", [coords]
        if kind == "MULTIPOLYGON":
            return "MULTIPOLYGON", coords
        return None
    if kind == "POINT":
        return "MULTIPOLYGON", [_disk(coords[0], coords[1], eff)]
    if kind == "MULTIPOINT":
        return "MULTIPOLYGON", [_disk(p[0], p[1], eff) for p in coords]
    if kind in ("LINESTRING", "MULTILINESTRING"):
        lines = [coords] if kind == "LINESTRING" else coords
        polys = []
        for ln in lines:
            for a, b in zip(ln, ln[1:]):
                polys.append(_capsule(a, b, eff))
            if len(ln) == 1:
                polys.append(_disk(ln[0][0], ln[0][1], eff))
        if not polys:
            return None
        return "MULTIPOLYGON", polys
    # polygons: miter offset of each ring (exterior by d, holes by -d)
    polys_in = [coords] if kind == "POLYGON" else coords
    polys_out = []
    for poly in polys_in:
        ext = _offset_ring(poly[0], eff)
        if ext is None:
            continue
        rings = [ext]
        for hole in poly[1:]:
            h = _offset_ring(hole, -eff)
            if h is not None:
                rings.append(h)
        polys_out.append(rings)
    if not polys_out:
        return None
    return "MULTIPOLYGON", polys_out


# --------------------------------------------------------------------------
# Set operations (point-set exact; polygon boolean ops are out of scope —
# the reference corpus only exercises point/identical-geometry cases)
# --------------------------------------------------------------------------

def geom_union(k1, c1, k2, c2):
    if equals(k1, c1, k2, c2):
        return k1, c1
    pts = _as_point_set(k1, c1), _as_point_set(k2, c2)
    if pts[0] is not None and pts[1] is not None:
        merged = pts[0] + [p for p in pts[1] if p not in pts[0]]
        if len(merged) == 1:
            return "POINT", merged[0]
        return "MULTIPOINT", merged
    raise GeometryError("st_union supports point sets and equal geometries")


def geom_intersection(k1, c1, k2, c2):
    if equals(k1, c1, k2, c2):
        return k1, c1
    pts = _as_point_set(k1, c1), _as_point_set(k2, c2)
    if pts[0] is not None and pts[1] is not None:
        inter = [p for p in pts[0] if p in pts[1]]
        if not inter:
            return "GEOMETRYCOLLECTION", []
        if len(inter) == 1:
            return "POINT", inter[0]
        return "MULTIPOINT", inter
    raise GeometryError(
        "st_intersection supports point sets and equal geometries"
    )


def geom_difference(k1, c1, k2, c2):
    if equals(k1, c1, k2, c2):
        return "GEOMETRYCOLLECTION", []
    pts = _as_point_set(k1, c1), _as_point_set(k2, c2)
    if pts[0] is not None and pts[1] is not None:
        diff = [p for p in pts[0] if p not in pts[1]]
        if not diff:
            return "GEOMETRYCOLLECTION", []
        if len(diff) == 1:
            return "POINT", diff[0]
        return "MULTIPOINT", diff
    raise GeometryError(
        "st_difference supports point sets and equal geometries"
    )


def geom_symdifference(k1, c1, k2, c2):
    if equals(k1, c1, k2, c2):
        return "GEOMETRYCOLLECTION", []
    pts = _as_point_set(k1, c1), _as_point_set(k2, c2)
    if pts[0] is not None and pts[1] is not None:
        sym = [p for p in pts[0] if p not in pts[1]] + [
            p for p in pts[1] if p not in pts[0]
        ]
        if not sym:
            return "GEOMETRYCOLLECTION", []
        if len(sym) == 1:
            return "POINT", sym[0]
        return "MULTIPOINT", sym
    raise GeometryError(
        "st_symdifference supports point sets and equal geometries"
    )


def _as_point_set(kind, coords):
    if kind == "POINT":
        return [list(coords)]
    if kind == "MULTIPOINT":
        return [list(p) for p in coords]
    return None


# --------------------------------------------------------------------------
# Geography (lon/lat, SRID 4326): haversine distance, geodesic length,
# spherical area — reference scalars/geographic geography functions
# --------------------------------------------------------------------------

_EARTH_MEAN_R = 6371008.7714150598  # geo crate MEAN_EARTH_RADIUS


def _haversine_m(a, b) -> float:
    la1, lo1 = math.radians(a[1]), math.radians(a[0])
    la2, lo2 = math.radians(b[1]), math.radians(b[0])
    h = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 2 * _EARTH_MEAN_R * math.asin(min(1.0, math.sqrt(h)))


def _vincenty_m(a, b) -> float:
    """WGS84 geodesic segment length (Vincenty inverse)."""
    f = _WGS84_F
    a_ax = _WGS84_A
    b_ax = a_ax * (1 - f)
    L = math.radians(b[0] - a[0])
    u1 = math.atan((1 - f) * math.tan(math.radians(a[1])))
    u2 = math.atan((1 - f) * math.tan(math.radians(b[1])))
    su1, cu1 = math.sin(u1), math.cos(u1)
    su2, cu2 = math.sin(u2), math.cos(u2)
    lam = L
    for _ in range(100):
        sl, cl = math.sin(lam), math.cos(lam)
        s_sig = math.hypot(cu2 * sl, cu1 * su2 - su1 * cu2 * cl)
        if s_sig == 0:
            return 0.0
        c_sig = su1 * su2 + cu1 * cu2 * cl
        sig = math.atan2(s_sig, c_sig)
        sa = cu1 * cu2 * sl / s_sig
        c2a = 1 - sa * sa
        c2sm = c_sig - 2 * su1 * su2 / c2a if c2a else 0.0
        C = f / 16 * c2a * (4 + f * (4 - 3 * c2a))
        lam_prev = lam
        lam = L + (1 - C) * f * sa * (
            sig + C * s_sig * (c2sm + C * c_sig * (-1 + 2 * c2sm * c2sm))
        )
        if abs(lam - lam_prev) < 1e-12:
            break
    u_sq = c2a * (a_ax**2 - b_ax**2) / b_ax**2
    A = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    B = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    d_sig = B * s_sig * (
        c2sm
        + B / 4 * (
            c_sig * (-1 + 2 * c2sm**2)
            - B / 6 * c2sm * (-3 + 4 * s_sig**2) * (-3 + 4 * c2sm**2)
        )
    )
    return b_ax * A * (sig - d_sig)


def geog_distance(k1, c1, k2, c2) -> float:
    best = math.inf
    for p in _all_points(k1, c1):
        for q in _all_points(k2, c2):
            best = min(best, _haversine_m(p, q))
    return _round9(best if best < math.inf else float("nan"))


def geog_length(kind, coords) -> float:
    total = 0.0
    for a, b in _segments(kind, coords):
        total += _vincenty_m(a, b)
    if kind in ("POLYGON", "MULTIPOLYGON"):
        return 0.0
    return _round9(total)


def geog_area(kind, coords) -> float:
    """Spherical polygon area (l'Huilier excess) on the mean radius."""
    total = 0.0
    for poly in _polygons(kind, coords):
        if not poly:
            continue
        for i, ring in enumerate(poly):
            pts = [
                (math.radians(p[0]), math.radians(p[1]))
                for p in ring[:-1]
            ]
            n = len(pts)
            if n < 3:
                continue
            s = 0.0
            for j in range(n):
                lo1, la1 = pts[j]
                lo2, la2 = pts[(j + 1) % n]
                s += (lo2 - lo1) * (
                    2 + math.sin(la1) + math.sin(la2)
                )
            area = abs(s) / 2 * _EARTH_MEAN_R**2
            total += area if i == 0 else -area
    return _round9(abs(total))


# --------------------------------------------------------------------------
# Geohash
# --------------------------------------------------------------------------

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lon: float, lat: float, precision: int = 12) -> str:
    lat_r = [-90.0, 90.0]
    lon_r = [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            if lon > mid:
                bits.append(1)
                lon_r[0] = mid
            else:
                bits.append(0)
                lon_r[1] = mid
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat > mid:
                bits.append(1)
                lat_r[0] = mid
            else:
                bits.append(0)
                lat_r[1] = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[i * 5: i * 5 + 5]:
            v = (v << 1) | b
        out.append(_GH32[v])
    return "".join(out)


def geohash_bounds(gh: str):
    lat_r = [-90.0, 90.0]
    lon_r = [-180.0, 180.0]
    even = True
    for ch in gh.lower():
        v = _GH32.index(ch)
        for shift in range(4, -1, -1):
            bit = (v >> shift) & 1
            if even:
                mid = (lon_r[0] + lon_r[1]) / 2
                lon_r[1 - bit] = mid
            else:
                mid = (lat_r[0] + lat_r[1]) / 2
                lat_r[1 - bit] = mid
            even = not even
    return lon_r[0], lat_r[0], lon_r[1], lat_r[1]


def geohash_cell_polygon(gh: str):
    x0, y0, x1, y1 = geohash_bounds(gh)
    return "POLYGON", [[[x1, y0], [x1, y1], [x0, y1], [x0, y0], [x1, y0]]]


def geohash_center_point(gh: str):
    x0, y0, x1, y1 = geohash_bounds(gh)
    return "POINT", [(x0 + x1) / 2, (y0 + y1) / 2]


# --------------------------------------------------------------------------
# Hilbert index (reference expression/src/hilbert/spatial.rs semantics:
# f32 bit-mapped coordinates onto a 16-level Hilbert curve)
# --------------------------------------------------------------------------

def _f32_to_sortable_u32(v: float) -> int:
    bits = struct.unpack("<I", struct.pack("<f", v))[0]
    if bits & 0x80000000:
        return bits ^ 0xFFFFFFFF
    return bits | 0x80000000


def _interleave32(x: int) -> int:
    # u32-wrapping bit spread, full 32-bit input (NOT masked to 16 —
    # the reference feeds f32-mapped 32-bit values straight in)
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x & 0xFFFFFFFF


def _hilbert_encode16(x: int, y: int) -> int:
    M = 0xFFFFFFFF
    a = (x ^ y) & M
    b = (0xFFFF ^ a) & M
    c = (0xFFFF ^ (x | y)) & M
    d = (x & ((y ^ 0xFFFF) & M)) & M
    a0 = (a | (b >> 1)) & M
    b0 = ((a >> 1) ^ a) & M
    c0 = (((c >> 1) ^ (b & (d >> 1))) ^ c) & M
    d0 = (((a & (c >> 1)) ^ (d >> 1)) ^ d) & M
    a, b, c, d = a0, b0, c0, d0
    a0 = ((a & (a >> 2)) ^ (b & (b >> 2))) & M
    b0 = ((a & (b >> 2)) ^ (b & ((a ^ b) >> 2))) & M
    c0 = (c0 ^ ((a & (c >> 2)) ^ (b & (d >> 2)))) & M
    d0 = (d0 ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))) & M
    a, b, c, d = a0, b0, c0, d0
    a0 = ((a & (a >> 4)) ^ (b & (b >> 4))) & M
    b0 = ((a & (b >> 4)) ^ (b & ((a ^ b) >> 4))) & M
    c0 = (c0 ^ ((a & (c >> 4)) ^ (b & (d >> 4)))) & M
    d0 = (d0 ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))) & M
    a, b, c, d = a0, b0, c0, d0
    c0 = (c0 ^ ((a & (c >> 8)) ^ (b & (d >> 8)))) & M
    d0 = (d0 ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))) & M
    a = (c0 ^ (c0 >> 1)) & M
    b = (d0 ^ (d0 >> 1)) & M
    i0 = (x ^ y) & M
    i1 = (b | ((0xFFFF ^ (i0 | a)) & M)) & M
    return (((_interleave32(i1) << 1) & M) | _interleave32(i0)) & M


def hilbert_index(kind, coords, bounds=None) -> int:
    bb = bbox(kind, coords)
    if bb is None:
        raise GeometryError("ST_HILBERT of empty geometry")
    x = (bb[0] + bb[2]) / 2
    y = (bb[1] + bb[3]) / 2
    if bounds is None:
        xu = _f32_to_sortable_u32(x)
        yu = _f32_to_sortable_u32(y)
    else:
        if len(bounds) != 4:
            raise GeometryError("ST_HILBERT bounds must have 4 elements")
        xmin, ymin, xmax, ymax = bounds
        if xmax - xmin <= 0 or ymax - ymin <= 0:
            raise GeometryError("ST_HILBERT bounds must be increasing")
        mx = 0xFFFF
        xu = int(min(max((x - xmin) * mx / (xmax - xmin), 0.0), mx))
        yu = int(min(max((y - ymin) * mx / (ymax - ymin), 0.0), mx))
    return _hilbert_encode16(xu, yu)


# --------------------------------------------------------------------------
# Projections (ST_TRANSFORM): spherical WebMercator (3857), WGS84 (4326),
# UTM northern zones (326xx) via 6th-order Krueger series
# --------------------------------------------------------------------------

_WGS84_A = 6378137.0
_WGS84_F = 1 / 298.257223563


def _utm_params():
    f = _WGS84_F
    n = f / (2 - f)
    # Krueger series coefficients (Karney 2011, order 6)
    alpha = [
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630
        - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    ]
    beta = [
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    ]
    A = _WGS84_A / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
    return n, alpha, beta, A


_UTM_N, _UTM_ALPHA, _UTM_BETA, _UTM_A = _utm_params()
_UTM_K0 = 0.9996
_UTM_E0 = 500000.0


def _utm_inverse(easting: float, northing: float, zone: int):
    """UTM (northern) -> lon/lat degrees."""
    n, alpha, beta, A = _UTM_N, _UTM_ALPHA, _UTM_BETA, _UTM_A
    xi = northing / (_UTM_K0 * A)
    eta = (easting - _UTM_E0) / (_UTM_K0 * A)
    xi_p = xi
    eta_p = eta
    for j, b in enumerate(beta, start=1):
        xi_p -= b * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        eta_p -= b * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    chi = math.asin(math.sin(xi_p) / math.cosh(eta_p))
    lam = math.atan2(math.sinh(eta_p), math.cos(xi_p))
    # geodetic latitude from conformal latitude: fixed-point iteration on
    # chi(phi) = asin(tanh(atanh(sin phi) - e*atanh(e*sin phi)))
    e2 = _WGS84_F * (2 - _WGS84_F)
    e = math.sqrt(e2)
    phi = chi
    for _ in range(20):
        s = math.sin(phi)
        chi_of_phi = math.asin(
            math.tanh(math.atanh(s) - e * math.atanh(e * s))
        )
        dchi = chi - chi_of_phi
        phi += dchi
        if abs(dchi) < 1e-14:
            break
    lon0 = (zone - 30) * 6 - 3
    return math.degrees(lam) + lon0, math.degrees(phi)


def _utm_forward(lon: float, lat: float, zone: int):
    n, alpha, beta, A = _UTM_N, _UTM_ALPHA, _UTM_BETA, _UTM_A
    e2 = _WGS84_F * (2 - _WGS84_F)
    e = math.sqrt(e2)
    lon0 = (zone - 30) * 6 - 3
    lam = math.radians(lon - lon0)
    phi = math.radians(lat)
    s = math.sin(phi)
    t = math.tanh(math.atanh(s) - e * math.atanh(e * s))
    xi_p = math.atan2(t, math.cos(lam))
    eta_p = math.atanh(math.sin(lam) / math.hypot(t, math.cos(lam)))
    xi = xi_p
    eta = eta_p
    for j, a in enumerate(alpha, start=1):
        xi += a * math.sin(2 * j * xi_p) * math.cosh(2 * j * eta_p)
        eta += a * math.cos(2 * j * xi_p) * math.sinh(2 * j * eta_p)
    return _UTM_K0 * A * eta + _UTM_E0, _UTM_K0 * A * xi


def _to_lonlat(x: float, y: float, srid: int):
    if srid == 4326:
        return x, y
    if srid == 3857:
        lon = math.degrees(x / _WGS84_A)
        lat = math.degrees(2 * math.atan(math.exp(y / _WGS84_A)) - math.pi / 2)
        return lon, lat
    if 32601 <= srid <= 32660:
        return _utm_inverse(x, y, srid - 32600)
    raise GeometryError(f"transform from {srid} not supported")


def _from_lonlat(lon: float, lat: float, srid: int):
    if srid == 4326:
        return lon, lat
    if srid == 3857:
        x = _WGS84_A * math.radians(lon)
        y = _WGS84_A * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
        return x, y
    if 32601 <= srid <= 32660:
        return _utm_forward(lon, lat, srid - 32600)
    raise GeometryError(f"transform to {srid} not supported")


def transform(kind, coords, from_srid: int, to_srid: int):
    def conv(p):
        lon, lat = _to_lonlat(p[0], p[1], from_srid)
        x, y = _from_lonlat(lon, lat, to_srid)
        return [round(x * 1e6) / 1e6, round(y * 1e6) / 1e6]

    def walk(c, depth):
        if depth == 0:
            return conv(c)
        return [walk(x, depth - 1) for x in c]

    depth = {
        "POINT": 0,
        "LINESTRING": 1,
        "MULTIPOINT": 1,
        "POLYGON": 2,
        "MULTILINESTRING": 2,
        "MULTIPOLYGON": 3,
    }.get(kind)
    if depth is None:
        raise GeometryError(f"st_transform unsupported for {kind}")
    if coords is None:
        return kind, coords
    return kind, walk(coords, depth)
