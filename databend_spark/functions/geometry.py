"""Minimal GEOMETRY/GEOGRAPHY support: WKT/EWKT parsing and (E)WKB
encoding (reference ``src/query/expression/src/types/geometry.rs`` via
geozero; EWKB layout is the PostGIS standard).

Only the shapes the SLT corpus exercises are implemented — POINT,
LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING, MULTIPOLYGON — in
little-endian byte order.
"""

from __future__ import annotations

import re
import struct

_TYPE_CODES = {
    "POINT": 1,
    "LINESTRING": 2,
    "POLYGON": 3,
    "MULTIPOINT": 4,
    "MULTILINESTRING": 5,
    "MULTIPOLYGON": 6,
    "GEOMETRYCOLLECTION": 7,
}


def parse_ewkt(text: str) -> tuple[int | None, str, list]:
    """EWKT/WKT → (srid, type, coords). Coords: POINT → [x, y];
    LINESTRING/MULTIPOINT → [[x, y], …]; POLYGON/MULTILINESTRING →
    [[[x, y], …], …]; MULTIPOLYGON adds one more level."""
    t = text.strip()
    srid = None
    m = re.match(r"^SRID\s*=\s*(\d+)\s*;\s*", t, re.I)
    if m:
        srid = int(m.group(1))
        t = t[m.end():]
    m = re.match(r"^([A-Za-z]+)\s*\((.*)\)\s*$", t, re.S)
    if not m:
        raise ValueError(f"invalid WKT: {text[:60]!r}")
    kind = m.group(1).upper()
    if kind not in _TYPE_CODES:
        raise ValueError(f"unsupported WKT type {kind}")
    body = m.group(2)

    def pairs(s: str) -> list:
        out = []
        for tok in s.split(","):
            xy = tok.split()
            out.append([float(xy[0]), float(xy[1])])
        return out

    def rings(s: str) -> list:
        return [
            pairs(r.strip().strip("()"))
            for r in re.findall(r"\(([^()]*)\)", s)
        ]

    if kind == "POINT":
        xy = body.split()
        coords: list = [float(xy[0]), float(xy[1])]
    elif kind in ("LINESTRING", "MULTIPOINT"):
        coords = pairs(body.replace("(", "").replace(")", ""))
    elif kind in ("POLYGON", "MULTILINESTRING"):
        coords = rings(body)
    elif kind == "MULTIPOLYGON":
        coords = [
            rings(p)
            for p in re.findall(r"\((\s*\([^()]*\)(?:\s*,\s*\([^()]*\))*\s*)\)", body)
        ]
    else:
        raise ValueError("GEOMETRYCOLLECTION is not supported")
    return srid, kind, coords


def to_ewkb(
    srid: int | None, kind: str, coords: list, with_srid: bool = True
) -> bytes:
    """(E)WKB little-endian bytes; the SRID flag 0x20000000 is set only
    when with_srid and an SRID is present (GEOGRAPHY binaries omit it)."""
    code = _TYPE_CODES[kind]
    out = bytearray()
    out.append(1)  # little-endian
    if with_srid and srid is not None:
        out += struct.pack("<I", code | 0x20000000)
        out += struct.pack("<I", srid)
    else:
        out += struct.pack("<I", code)

    def w_point(p):
        out.extend(struct.pack("<dd", p[0], p[1]))

    def w_ring(r):
        out.extend(struct.pack("<I", len(r)))
        for p in r:
            w_point(p)

    if kind == "POINT":
        w_point(coords)
    elif kind == "LINESTRING":
        w_ring(coords)
    elif kind == "MULTIPOINT":
        out.extend(struct.pack("<I", len(coords)))
        for p in coords:
            out.append(1)
            out.extend(struct.pack("<I", 1))
            w_point(p)
    elif kind in ("POLYGON",):
        out.extend(struct.pack("<I", len(coords)))
        for r in coords:
            w_ring(r)
    elif kind == "MULTILINESTRING":
        out.extend(struct.pack("<I", len(coords)))
        for r in coords:
            out.append(1)
            out.extend(struct.pack("<I", 2))
            w_ring(r)
    elif kind == "MULTIPOLYGON":
        out.extend(struct.pack("<I", len(coords)))
        for poly in coords:
            out.append(1)
            out.extend(struct.pack("<I", 3))
            out.extend(struct.pack("<I", len(poly)))
            for r in poly:
                w_ring(r)
    return bytes(out)


def wkt_to_ewkb(text, srid=None, with_srid=True):
    """UDF body: WKT/EWKT text → (E)WKB bytes."""
    if text is None:
        return None
    s, kind, coords = parse_ewkt(str(text))
    if srid is not None:
        s = int(srid)
    return to_ewkb(s, kind, coords, with_srid)
