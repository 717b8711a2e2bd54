"""Pure-Python replica of Spark's ``xxhash64`` expression.

The model-baked DuckDB oracles (plans/model_oracles.py) must reproduce the
hash_presample fit pools bit-for-bit without a SparkSession. Spark's
XxHash64 expression (sql/catalyst XXH64.java) chains one finalized XXH64
block per input column: starting from seed 42, each column's value is
hashed with the running hash as the seed. Scalar types hash their fixed
8/4-byte form (doubles via doubleToLongBits with -0.0 normalized to 0.0);
arrays hash each element in order with the running seed.

Parity with the JVM implementation is pinned by tests/test_sparkhash.py,
which compares against F.xxhash64 on live data.
"""
from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte block (XXH64.hashLong)."""
    value &= _M64
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((value * _P2) & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte block (XXH64.hashInt)."""
    value &= 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M64
    h ^= (value * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Full XXH64 over a byte string (Spark's UTF8String/binary path)."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        i = 0
        while i <= n - 32:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                k = struct.unpack_from("<Q", data, i + off)[0]
                cur = (v1, v2, v3, v4)[v - 1]
                cur = (cur + k * _P2) & _M64
                cur = (_rotl(cur, 31) * _P1) & _M64
                if v == 1:
                    v1 = cur
                elif v == 2:
                    v2 = cur
                elif v == 3:
                    v3 = cur
                else:
                    v4 = cur
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        i = 0
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k = struct.unpack_from("<Q", data, i)[0]
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        k = struct.unpack_from("<I", data, i)[0]
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= ((data[i] & 0xFF) * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _double_bits(v: float) -> int:
    if v == 0.0:
        v = 0.0  # normalize -0.0 like Spark's hash expressions
    return struct.unpack(">q", struct.pack(">d", v))[0]


def _float_bits(v: float) -> int:
    if v == 0.0:
        v = 0.0
    return struct.unpack(">i", struct.pack(">f", v))[0]


def _step(value, typ: str, seed: int) -> int:
    if typ == "double":
        return hash_long(_double_bits(float(value)), seed)
    if typ == "float":
        return hash_int(_float_bits(float(value)), seed)
    if typ == "long":
        return hash_long(int(value), seed)
    if typ == "int":
        return hash_int(int(value), seed)
    if typ == "string":
        return hash_bytes(str(value).encode("utf-8"), seed)
    if typ == "float_array":
        for x in value:
            seed = hash_int(_float_bits(float(x)), seed)
        return seed
    if typ == "double_array":
        for x in value:
            seed = hash_long(_double_bits(float(x)), seed)
        return seed
    raise ValueError(f"unsupported type: {typ}")


def spark_xxhash64(items: list[tuple[str, object]]) -> int:
    """F.xxhash64(col1, col2, ...) replica: ``items`` = [(type, value), ...]
    in column order. Returns the SIGNED 64-bit hash (Java long), matching
    the LongType column Spark produces."""
    h = SPARK_SEED
    for typ, value in items:
        h = _step(value, typ, h)
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def pmod(h: int, m: int) -> int:
    """Spark's pmod for a signed hash."""
    return ((h % m) + m) % m
