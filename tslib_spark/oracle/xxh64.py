"""Independent xxHash64 reference implementation (test-oracle use only).

Implements the public xxHash64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash — public spec) in plain Python so the
test suite and frozen-oracle scripts can reproduce Spark's ``xxhash64``
column function without touching the JVM. Spark chains multi-argument
calls by feeding each field's hash in as the next seed (default first
seed 42), hashing longs as their 8-byte two's-complement value and strings
as UTF-8 bytes — ``spark_xxhash64`` mirrors that contract and is verified
against the real expression in tests/test_oracle_xxh64.py.

This is deliberately slow, simple Python — an oracle, never the engine.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _MASK


def xxh64_bytes(data: bytes, seed: int) -> int:
    seed &= _MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """xxHash64 of one 32-bit integer — Spark's hashInt fast path
    (identical to hashing the 4-byte little-endian representation)."""
    h = (seed + _P5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * _P1) & _MASK
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """xxHash64 of one 64-bit integer — Spark's hashLong fast path
    (identical to hashing the 8-byte little-endian representation)."""
    h = (seed + _P5 + 8) & _MASK
    h ^= _round(0, value & _MASK)
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


class Int32:
    """Marker wrapping a value that Spark sees as IntegerType (xxhash64
    hashes 4-byte ints via a different fast path than longs)."""

    __slots__ = ("v",)

    def __init__(self, v: int):
        self.v = v


def spark_xxhash64(*fields, seed: int = 42) -> int:
    """Replicates Spark's ``F.xxhash64(*cols)``: fold each field through
    the hash, previous result seeding the next. Accepts int (long column),
    Int32 (int column), str, and bytes fields; returns a signed 64-bit int
    like the Spark expression."""
    h = seed & _MASK
    for f in fields:
        if isinstance(f, bool):
            raise TypeError("bool fields not supported")
        if isinstance(f, Int32):
            h = xxh64_int(f.v, h)
        elif isinstance(f, int):
            h = xxh64_long(f, h)
        elif isinstance(f, str):
            h = xxh64_bytes(f.encode("utf-8"), h)
        elif isinstance(f, bytes):
            h = xxh64_bytes(f, h)
        else:
            raise TypeError(f"unsupported field type {type(f)}")
    return _to_signed(h)
