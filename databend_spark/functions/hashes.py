"""Exact hash functions matching the reference's bit-for-bit values
(reference src/query/functions/src/scalars/hash.rs: SipHasher13 via
DFHash byte encodings, twox_hash::XxHash64, XxHash32).

The reference hashes each value's canonical byte encoding:
strings/binary → raw bytes, integers → little-endian at their storage
width, floats → IEEE-754 bits little-endian, decimals → scaled i128
little-endian. Results display as unsigned 64-bit.
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1


def _rotl64(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & _M64


def _rotl32(x: int, b: int) -> int:
    return ((x << b) | (x >> (32 - b))) & _M32


def siphash13(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """SipHash-1-3 (Rust std hasher family used by the reference)."""
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573

    def rnd():
        nonlocal v0, v1, v2, v3
        v0 = (v0 + v1) & _M64
        v1 = _rotl64(v1, 13)
        v1 ^= v0
        v0 = _rotl64(v0, 32)
        v2 = (v2 + v3) & _M64
        v3 = _rotl64(v3, 16)
        v3 ^= v2
        v0 = (v0 + v3) & _M64
        v3 = _rotl64(v3, 21)
        v3 ^= v0
        v2 = (v2 + v1) & _M64
        v1 = _rotl64(v1, 17)
        v1 ^= v2
        v2 = _rotl64(v2, 32)

    b = len(data) & 0xFF
    end = len(data) - (len(data) % 8)
    for i in range(0, end, 8):
        m = int.from_bytes(data[i : i + 8], "little")
        v3 ^= m
        rnd()
        v0 ^= m
    last = data[end:] + bytes(7 - (len(data) % 8)) + bytes([b])
    m = int.from_bytes(last[:8], "little")
    v3 ^= m
    rnd()
    v0 ^= m
    v2 ^= 0xFF
    rnd()
    rnd()
    rnd()
    return (v0 ^ v1 ^ v2 ^ v3) & _M64


_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64

        def lane(acc: int, piece: bytes) -> int:
            return (
                _rotl64(
                    (acc + int.from_bytes(piece, "little") * _P2) & _M64, 31
                )
                * _P1
            ) & _M64

        while i + 32 <= n:
            v1 = lane(v1, data[i : i + 8])
            v2 = lane(v2, data[i + 8 : i + 16])
            v3 = lane(v3, data[i + 16 : i + 24])
            v4 = lane(v4, data[i + 24 : i + 32])
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64

        def merge(hh: int, v: int) -> int:
            vv = (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            return (((hh ^ vv) * _P1) + _P4) & _M64

        h = merge(h, v1)
        h = merge(h, v2)
        h = merge(h, v3)
        h = merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (
            _rotl64((int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31)
            * _P1
        ) & _M64
        h = ((_rotl64(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        k = (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = ((_rotl64(h ^ k, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


_Q1 = 0x9E3779B1
_Q2 = 0x85EBCA77
_Q3 = 0xC2B2AE3D
_Q4 = 0x27D4EB2F
_Q5 = 0x165667B1


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _Q1 + _Q2) & _M32
        v2 = (seed + _Q2) & _M32
        v3 = seed & _M32
        v4 = (seed - _Q1) & _M32

        def lane(acc: int, piece: bytes) -> int:
            return (
                _rotl32(
                    (acc + int.from_bytes(piece, "little") * _Q2) & _M32, 13
                )
                * _Q1
            ) & _M32

        while i + 16 <= n:
            v1 = lane(v1, data[i : i + 4])
            v2 = lane(v2, data[i + 4 : i + 8])
            v3 = lane(v3, data[i + 8 : i + 12])
            v4 = lane(v4, data[i + 12 : i + 16])
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _Q5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        k = (int.from_bytes(data[i : i + 4], "little") * _Q3) & _M32
        h = ((_rotl32((h + k) & _M32, 17)) * _Q4) & _M32
        i += 4
    while i < n:
        h = ((_rotl32((h + data[i] * _Q5) & _M32, 11)) * _Q1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _Q2) & _M32
    h ^= h >> 13
    h = (h * _Q3) & _M32
    h ^= h >> 16
    return h


_B3_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
_B3_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)


def _b3_compress(cv, block_words, counter, block_len, flags):
    state = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        _B3_IV[0], _B3_IV[1], _B3_IV[2], _B3_IV[3],
        counter & _M32, (counter >> 32) & _M32, block_len, flags,
    ]
    m = list(block_words)

    def g(a, b, c, d, mx, my):
        state[a] = (state[a] + state[b] + mx) & _M32
        state[d] = _rotl32(state[d] ^ state[a], 16)
        state[c] = (state[c] + state[d]) & _M32
        state[b] = _rotl32(state[b] ^ state[c], 20)
        state[a] = (state[a] + state[b] + my) & _M32
        state[d] = _rotl32(state[d] ^ state[a], 24)
        state[c] = (state[c] + state[d]) & _M32
        state[b] = _rotl32(state[b] ^ state[c], 25)

    for r in range(7):
        g(0, 4, 8, 12, m[0], m[1])
        g(1, 5, 9, 13, m[2], m[3])
        g(2, 6, 10, 14, m[4], m[5])
        g(3, 7, 11, 15, m[6], m[7])
        g(0, 5, 10, 15, m[8], m[9])
        g(1, 6, 11, 12, m[10], m[11])
        g(2, 7, 8, 13, m[12], m[13])
        g(3, 4, 9, 14, m[14], m[15])
        if r < 6:
            m = [m[_B3_PERM[i]] for i in range(16)]
    return [state[i] ^ state[i + 8] for i in range(8)] + [
        (state[i + 8] ^ cv[i]) & _M32 for i in range(8)
    ]


def blake3_hex(data: bytes) -> str:
    """BLAKE3 of inputs up to one chunk (1024 bytes) — the sizes the
    reference test surface uses. rotl here is a LEFT rotation helper,
    BLAKE3 specifies right rotations: rotr(x, n) == rotl(x, 32-n)."""
    if len(data) > 1024:
        raise ValueError("blake3: only single-chunk inputs supported")
    CHUNK_START, CHUNK_END, ROOT = 1, 2, 8
    cv = list(_B3_IV)
    blocks = [data[i : i + 64] for i in range(0, len(data), 64)] or [b""]
    out = None
    for bi, blk in enumerate(blocks):
        padded = blk + bytes(64 - len(blk))
        words = list(struct.unpack("<16I", padded))
        flags = 0
        if bi == 0:
            flags |= CHUNK_START
        if bi == len(blocks) - 1:
            flags |= CHUNK_END | ROOT
        out = _b3_compress(cv, words, 0, len(blk), flags)
        cv = out[:8]
    return b"".join(struct.pack("<I", w) for w in cv).hex()


_CK0 = 0xC3A5C85C97CB3127
_CK1 = 0xB492B66FBE98F273
_CK2 = 0x9AE16A3B2F90404F
_CK3 = 0xC949D7C7509E6557


def _fetch64(s, i=0):
    return int.from_bytes(s[i : i + 8], "little")


def _fetch32(s, i=0):
    return int.from_bytes(s[i : i + 4], "little")


def _rotate(v, s):
    return v if s == 0 else ((v >> s) | (v << (64 - s))) & _M64


def _smix(v):
    return v ^ (v >> 47)


def _hash128to64(lo, hi):
    kmul = 0x9DDFEA08EB382D69
    a = ((lo ^ hi) * kmul) & _M64
    a ^= a >> 47
    b = ((hi ^ a) * kmul) & _M64
    b ^= b >> 47
    return (b * kmul) & _M64


def _hashlen16(u, v):
    return _hash128to64(u, v)


def _hashlen0to16(s):
    n = len(s)
    if n > 8:
        a = _fetch64(s)
        b = _fetch64(s, n - 8)
        return (
            _hashlen16(a, _rotate((b + n) & _M64, n & 63)) ^ b
        ) & _M64
    if n >= 4:
        a = _fetch32(s)
        return _hashlen16((n + (a << 3)) & _M64, _fetch32(s, n - 4))
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & _M32
        z = (n + (c << 2)) & _M32
        return (_smix((y * _CK2 ^ z * _CK3) & _M64) * _CK2) & _M64
    return _CK2


def _hashlen17to32(s):
    n = len(s)
    a = (_fetch64(s) * _CK1) & _M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * _CK2) & _M64
    d = (_fetch64(s, n - 16) * _CK0) & _M64
    return _hashlen16(
        (_rotate((a - b) & _M64, 43) + _rotate(c, 30) + d) & _M64,
        (a + _rotate((b ^ _CK3), 20) - c + n) & _M64,
    )


def _weakhashlen32withseeds(s, i, a, b):
    w, x, y, z = (
        _fetch64(s, i),
        _fetch64(s, i + 8),
        _fetch64(s, i + 16),
        _fetch64(s, i + 24),
    )
    a = (a + w) & _M64
    b = _rotate((b + a + z) & _M64, 21)
    c = a
    a = (a + x + y) & _M64
    b = (b + _rotate(a, 44)) & _M64
    return (a + z) & _M64, (b + c) & _M64


def _hashlen33to64(s):
    n = len(s)
    z = _fetch64(s, 24)
    a = (_fetch64(s) + (n + _fetch64(s, n - 16)) * _CK0) & _M64
    b = _rotate((a + z) & _M64, 52)
    c = _rotate(a, 37)
    a = (a + _fetch64(s, 8)) & _M64
    c = (c + _rotate(a, 7)) & _M64
    a = (a + _fetch64(s, 16)) & _M64
    vf = (a + z) & _M64
    vs = (b + _rotate(a, 31) + c) & _M64
    a = (_fetch64(s, 16) + _fetch64(s, n - 32)) & _M64
    z = _fetch64(s, n - 8)
    b = _rotate((a + z) & _M64, 52)
    c = _rotate(a, 37)
    a = (a + _fetch64(s, n - 24)) & _M64
    c = (c + _rotate(a, 7)) & _M64
    a = (a + _fetch64(s, n - 16)) & _M64
    wf = (a + z) & _M64
    ws = (b + _rotate(a, 31) + c) & _M64
    r = _smix(((vf + ws) * _CK2 + (wf + vs) * _CK0) & _M64)
    return (_smix((r * _CK0 + vs) & _M64) * _CK2) & _M64


def cityhash64(s: bytes) -> int:
    n = len(s)
    if n <= 16:
        return _hashlen0to16(s)
    if n <= 32:
        return _hashlen17to32(s)
    if n <= 64:
        return _hashlen33to64(s)
    x = _fetch64(s, n - 40)
    y = (_fetch64(s, n - 16) + _fetch64(s, n - 56)) & _M64
    z = _hashlen16(
        (_fetch64(s, n - 48) + n) & _M64, _fetch64(s, n - 24)
    )
    v = _weakhashlen32withseeds(s, n - 64, n, z)
    w = _weakhashlen32withseeds(s, n - 32, (y + _CK1) & _M64, x)
    x = (x * _CK1 + _fetch64(s)) & _M64
    i = 0
    end = (n - 1) & ~63
    while True:
        x = (_rotate((x + y + v[0] + _fetch64(s, i + 8)) & _M64, 37) * _CK1) & _M64
        y = (_rotate((y + v[1] + _fetch64(s, i + 48)) & _M64, 42) * _CK1) & _M64
        x ^= w[1]
        y = (y + v[0] + _fetch64(s, i + 40)) & _M64
        z = (_rotate((z + w[0]) & _M64, 33) * _CK1) & _M64
        v = _weakhashlen32withseeds(s, i, (v[1] * _CK1) & _M64, (x + w[0]) & _M64)
        w = _weakhashlen32withseeds(
            s, i + 32, (z + w[1]) & _M64, (y + _fetch64(s, i + 16)) & _M64
        )
        z, x = x, z
        i += 64
        if i == end:
            break
    return _hashlen16(
        (_hashlen16(v[0], w[0]) + _smix(y) * _CK1 + z) & _M64,
        (_hashlen16(v[1], w[1]) + x) & _M64,
    )


def cityhash64_with_seed(s: bytes, seed: int) -> int:
    return _hashlen16((cityhash64(s) - _CK2) & _M64, seed & _M64)


def _encode(v) -> bytes | None:
    """Canonical byte encoding per DFHash (hash.rs:455-524)."""
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return bytes([1 if v else 0])
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, int):
        # narrowest-unsigned literal typing (Databend literal inference)
        for width in (1, 2, 4, 8):
            try:
                return v.to_bytes(width, "little", signed=v < 0)
            except OverflowError:
                continue
        return v.to_bytes(16, "little", signed=v < 0)
    if isinstance(v, float):
        return struct.pack("<d", v)
    if isinstance(v, decimal.Decimal):
        # decimal_hash (decimal/src/hash.rs:160): scale byte first,
        # then the unscaled i128 little-endian
        sign, digits, exp = v.as_tuple()
        unscaled = int("".join(map(str, digits))) * (-1 if sign else 1)
        return bytes([max(0, -exp)]) + unscaled.to_bytes(16, "little", signed=True)
    import datetime

    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        us = round((v - epoch).total_seconds() * 1_000_000)
        return us.to_bytes(8, "little", signed=True)
    if isinstance(v, datetime.date):
        return (v - datetime.date(1970, 1, 1)).days.to_bytes(
            4, "little", signed=True
        )
    if isinstance(v, list):
        # nested values contribute no bytes in the reference (DFHash is
        # only implemented for scalars — arrays hash as empty input)
        return b""
    return str(v).encode("utf-8")


def blake3_value(v) -> str | None:
    b = _encode(v)
    return None if b is None else blake3_hex(b)


def city64_seed_value(v, seed) -> str | None:
    b = _encode(v)
    if b is None or seed is None:
        return None
    return str(cityhash64_with_seed(b, int(seed)))


def siphash64_value(v) -> str | None:
    b = _encode(v)
    return None if b is None else str(siphash13(b))


def xxhash64_value(v) -> str | None:
    b = _encode(v)
    return None if b is None else str(xxh64(b))


def xxhash32_value(v) -> str | None:
    b = _encode(v)
    return None if b is None else str(xxh32(b))
