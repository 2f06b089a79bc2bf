"""Minimal Avro Object Container File reader (pure Python).

Implements the public Avro 1.11 spec (container format + binary
encoding + common logical types) — enough to load the reference's
``tests/data/avro/*.avro`` fixtures without an external avro package
(none is available in this image). Reference behavior parity:
``src/query/storages/stage/src/read/avro/`` decodes the same logical
types (decimal, date, timestamp-millis/micros, uuid) controlled by the
``use_logic_type`` format option.

Output is a ``pyarrow.Table`` whose columns hold plain Python values
(dict/list for maps/arrays/records), matching what the stage shim's
``_arrow_cast`` expects from the other binary formats.
"""

from __future__ import annotations

import json
import struct
import zlib
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

_MAGIC = b"Obj\x01"
_EPOCH = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def zlong(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def zbytes(self) -> bytes:
        return self.read(self.zlong())

    def zstr(self) -> str:
        return self.zbytes().decode("utf-8")


def _decode(r: _Reader, schema, use_logic: bool = True):
    if isinstance(schema, str):
        schema = {"type": schema}
    if isinstance(schema, list):  # union
        idx = r.zlong()
        return _decode(r, schema[idx], use_logic)
    t = schema["type"]
    logical = schema.get("logicalType") if use_logic else None
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        v = r.zlong()
        if logical == "date":
            return _EPOCH + timedelta(days=v)
        if logical == "time-millis":
            return v
        if logical == "timestamp-millis" or logical == "local-timestamp-millis":
            return _EPOCH_DT + timedelta(milliseconds=v)
        if logical == "timestamp-micros" or logical == "local-timestamp-micros":
            return _EPOCH_DT + timedelta(microseconds=v)
        return v
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        b = r.zbytes()
        if logical == "decimal":
            return _dec_from_bytes(b, schema.get("scale", 0))
        return b
    if t == "string":
        s = r.zstr()
        return s
    if t == "fixed":
        b = r.read(schema["size"])
        if logical == "decimal":
            return _dec_from_bytes(b, schema.get("scale", 0))
        return b
    if t == "enum":
        return schema["symbols"][r.zlong()]
    if t == "array":
        out = []
        while True:
            n = r.zlong()
            if n == 0:
                break
            if n < 0:
                r.zlong()  # block byte size, unused
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"], use_logic))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.zlong()
            if n == 0:
                break
            if n < 0:
                r.zlong()
                n = -n
            for _ in range(n):
                k = r.zstr()
                out[k] = _decode(r, schema["values"], use_logic)
        return out
    if t == "record":
        return {
            f["name"]: _decode(r, f["type"], use_logic)
            for f in schema["fields"]
        }
    if t == "union":
        idx = r.zlong()
        return _decode(r, schema["types"][idx], use_logic)
    raise ValueError(f"unsupported avro type {t!r}")


def _dec_from_bytes(b: bytes, scale: int) -> Decimal:
    unscaled = int.from_bytes(b, "big", signed=True)
    return Decimal(unscaled).scaleb(-scale)


def read_avro_records(
    raw: bytes, use_logic_type: bool = True
) -> tuple[list[dict], dict]:
    """Decode an Avro container file -> (records, parsed schema)."""
    r = _Reader(raw)
    if r.read(4) != _MAGIC:
        raise ValueError("[1046] not an Avro object container file")
    meta = {}
    while True:
        n = r.zlong()
        if n == 0:
            break
        if n < 0:
            r.zlong()
            n = -n
        for _ in range(n):
            k = r.zstr()
            meta[k] = r.zbytes()
    sync = r.read(16)
    schema = json.loads(meta[b"avro.schema".decode()]
                        if isinstance(meta.get("avro.schema"), str)
                        else meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records: list[dict] = []
    while not r.at_end():
        count = r.zlong()
        size = r.zlong()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            import pyarrow as pa

            block = pa.Codec("snappy").decompress(block[:-4], asbytes=True)
        elif codec not in ("null", ""):
            raise ValueError(f"[1046] unsupported avro codec {codec}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema, use_logic_type))
        if r.read(16) != sync:
            raise ValueError("[1046] avro sync marker mismatch")
    return records, schema


def read_avro_table(path: str, use_logic_type: bool = True):
    """Avro file -> pyarrow.Table (column-wise python values)."""
    import pyarrow as pa

    raw = open(path, "rb").read()
    records, schema = read_avro_records(raw, use_logic_type)
    if schema.get("type") != "record":
        names = ["value"]
        cols = [[rec for rec in records]]
    else:
        names = [f["name"] for f in schema["fields"]]
        cols = [[rec.get(n) for rec in records] for n in names]
    arrays = []
    for c in cols:
        try:
            arrays.append(pa.array(c))
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            # mixed / nested values pyarrow can't infer -> keep python
            # objects via a json round-trip string? no — use object col
            arrays.append(pa.array([_as_py_safe(v) for v in c], type=pa.string()))
    return pa.Table.from_arrays(arrays, names=names)


def _as_py_safe(v):
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex().upper()
    if isinstance(v, (dict, list)):
        return json.dumps(v, default=str, separators=(",", ":"))
    return str(v)
