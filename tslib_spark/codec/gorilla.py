"""Gorilla-style codec: XOR float compression + delta-of-delta timestamps.

Pure numpy, vectorized bit-packing — no per-value Python on the encode path
(BASELINE.json input_hint: no per-row Python). The scheme follows the
Facebook Gorilla paper (Pelkonen et al., VLDB 2015):

Values (float64):
- first value: 64 raw bits
- then per value, x = bits(v) XOR bits(prev):
    x == 0      → '0'
    x != 0      → '1' + 5-bit leading-zero count (clamped 31) +
                   6-bit meaningful-bit length (64 stored as 0) +
                   the meaningful bits
  (single non-zero mode: we always emit the header instead of the paper's
  "reuse previous window" mode — simpler, fully vectorizable, and within
  ~1 byte/point of the two-mode variant on real series)

Timestamps (int64, any unit):
- first ts: 64 raw bits; second: delta as 64 raw bits
- then per ts, zigzag(dod) where dod = Δi − Δi−1:
    dod == 0    → '0'
    z < 2^7     → '10'   + 7 bits
    z < 2^12    → '110'  + 12 bits
    z < 2^20    → '1110' + 20 bits
    else        → '1111' + 64 bits
  On a regular 1-minute grid every dod is 0 → ~1 bit/point (documented
  degenerate case per SURVEY §2.12).

Encode vectorization: each code is ≤ 128 bits, carried as (hi, lo) uint64
pairs with a width; a (n × maxwidth) bit matrix is materialized by shifted
masking and flattened through the per-row validity mask — ragged
concatenation without a Python loop — then ``np.packbits``.

Decode is a sequential bit-reader (variable-length prefix codes are
inherently serial); it runs inside Arrow kernels over bounded chunks
(≤ CHUNK_SIZE points), so the Python-level loop is per *point in a chunk*,
never per row of a DataFrame partition boundary.
"""

from __future__ import annotations

import numpy as np

CHUNK_SIZE = 4096  # max points per encoded chunk

_U64 = np.uint64
_POW2 = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)).astype(np.uint64)


def _pack_codes(hi: np.ndarray, lo: np.ndarray, width: np.ndarray) -> bytes:
    """Concatenate n variable-width codes (≤128 bits each, MSB-first in
    (hi,lo)) into a packed byte string. Fully vectorized."""
    n = width.size
    if n == 0:
        return b""
    maxw = int(width.max())
    j = np.arange(maxw, dtype=np.int64)[None, :]  # bit position within code
    shift = width[:, None].astype(np.int64) - 1 - j  # bit index from LSB
    valid = shift >= 0
    sh = np.where(valid, shift, 0)
    from_hi = sh >= 64
    sh_lo = np.where(from_hi, 0, sh).astype(np.uint64)
    sh_hi = np.where(from_hi, sh - 64, 0).astype(np.uint64)
    bits = np.where(
        from_hi,
        (hi[:, None] >> sh_hi) & _U64(1),
        (lo[:, None] >> sh_lo) & _U64(1),
    ).astype(np.uint8)
    flat = bits[valid]
    return np.packbits(flat).tobytes()


def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 (vectorized); clz(0) = 64."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    # bit_length via float log2 is unsafe at 64 bits; use progressive halving
    v = x[nz].copy()
    n = np.zeros(v.shape, dtype=np.int64)
    for shift_amt in (32, 16, 8, 4, 2, 1):
        mask = v >> _U64(shift_amt) == 0
        n[mask] += shift_amt
        v[~mask] >>= _U64(shift_amt)
    out[nz] = n
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 (vectorized); ctz(0) = 64."""
    low = (x & (~x + _U64(1)))  # isolate lowest set bit
    return np.where(x == 0, 64, 63 - _clz64(low))


def encode_values(values: np.ndarray) -> bytes:
    """Gorilla-XOR encode a float64 array (NaN round-trips bit-exactly)."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = v.size
    if n == 0:
        return b""
    xor = np.empty(n, dtype=np.uint64)
    xor[0] = v[0]
    xor[1:] = v[1:] ^ v[:-1]

    lead = np.minimum(_clz64(xor), 31)
    mlen = 64 - lead - _ctz64(xor)  # meaningful bits (≥1 when xor != 0)
    mlen = np.maximum(mlen, 1)
    meaningful = xor >> (_U64(64) - lead.astype(np.uint64) - mlen.astype(np.uint64))

    zero = xor == 0
    width = np.where(zero, 1, 1 + 5 + 6 + mlen)
    # header: '1' + lead(5) + (mlen & 63)(6), then meaningful bits
    header = (
        _U64(1) << _U64(11)
    ) | (lead.astype(np.uint64) << _U64(6)) | (mlen.astype(np.uint64) & _U64(63))
    code = np.where(zero, _U64(0), header)
    # full code = header(12) followed by mlen meaningful bits → shift left
    lo = np.where(zero, _U64(0), (code << mlen.astype(np.uint64)) | meaningful)
    hi = np.where(
        zero, _U64(0), np.where(mlen + 12 > 64, code >> (_U64(64) - mlen.astype(np.uint64)), _U64(0))
    )
    # first value: raw 64 bits
    width[0] = 64
    lo[0] = v[0]
    hi[0] = 0
    header_bytes = np.uint32(n).tobytes()
    return header_bytes + _pack_codes(hi, lo, width)


def decode_values(buf: bytes) -> np.ndarray:
    if not buf:
        return np.empty(0, dtype=np.float64)
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    bits = np.unpackbits(np.frombuffer(buf[4:], dtype=np.uint8)).astype(np.uint64)

    def read(pos: int, width: int) -> tuple[int, int]:
        val = int(bits[pos : pos + width] @ _POW2[64 - width :])
        return val, pos + width

    out = np.empty(n, dtype=np.uint64)
    prev, pos = read(0, 64)
    out[0] = prev
    for i in range(1, n):
        ctrl, pos = read(pos, 1)
        if ctrl == 0:
            out[i] = prev
            continue
        lead, pos = read(pos, 5)
        mlen, pos = read(pos, 6)
        if mlen == 0:
            mlen = 64
        meaningful, pos = read(pos, mlen)
        xor = meaningful << (64 - lead - mlen)
        prev = prev ^ xor
        out[i] = prev
    return out.view(np.float64)


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 array (timestamps in any fixed unit)."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = t.size
    header_bytes = np.uint32(n).tobytes()
    if n == 0:
        return header_bytes
    raw = t.view(np.uint64)
    if n == 1:
        return header_bytes + _pack_codes(
            np.zeros(1, np.uint64), raw[:1].copy(), np.array([64], np.int64)
        )

    delta = np.diff(t)
    dod = np.empty(n - 2, dtype=np.int64) if n > 2 else np.empty(0, dtype=np.int64)
    if n > 2:
        dod[:] = delta[1:] - delta[:-1]
    z = _zigzag(dod)

    width = np.empty(dod.size, dtype=np.int64)
    lo = np.empty(dod.size, dtype=np.uint64)
    hi = np.zeros(dod.size, dtype=np.uint64)
    zero = dod == 0
    b7 = (~zero) & (z < (1 << 7))
    b12 = (~zero) & (~b7) & (z < (1 << 12))
    b20 = (~zero) & (~b7) & (~b12) & (z < (1 << 20))
    b64 = (~zero) & (~b7) & (~b12) & (~b20)
    width[zero] = 1
    lo[zero] = 0
    width[b7] = 2 + 7
    lo[b7] = (_U64(0b10) << _U64(7)) | z[b7]
    width[b12] = 3 + 12
    lo[b12] = (_U64(0b110) << _U64(12)) | z[b12]
    width[b20] = 4 + 20
    lo[b20] = (_U64(0b1110) << _U64(20)) | z[b20]
    width[b64] = 4 + 64
    lo[b64] = z[b64]
    hi[b64] = _U64(0b1111)

    all_hi = np.concatenate([np.zeros(2, np.uint64), hi])
    all_lo = np.concatenate([raw[:1], delta[:1].view(np.uint64), lo])
    all_w = np.concatenate([np.array([64, 64], np.int64), width])
    return header_bytes + _pack_codes(all_hi, all_lo, all_w)


def decode_timestamps(buf: bytes) -> np.ndarray:
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(buf[4:], dtype=np.uint8)).astype(np.uint64)

    def read(pos: int, width: int) -> tuple[int, int]:
        val = int(bits[pos : pos + width] @ _POW2[64 - width :])
        return val, pos + width

    out = np.empty(n, dtype=np.int64)
    first, pos = read(0, 64)
    out[0] = np.uint64(first).astype(np.int64)
    if n == 1:
        return out
    delta_u, pos = read(pos, 64)
    delta = int(np.uint64(delta_u).astype(np.int64))
    out[1] = out[0] + delta
    for i in range(2, n):
        c, pos = read(pos, 1)
        if c == 0:
            dod = 0
        else:
            c2, pos = read(pos, 1)
            if c2 == 0:
                z, pos = read(pos, 7)
            else:
                c3, pos = read(pos, 1)
                if c3 == 0:
                    z, pos = read(pos, 12)
                else:
                    c4, pos = read(pos, 1)
                    z, pos = (read(pos, 20) if c4 == 0 else read(pos, 64))
            dod = _unzigzag(z)
        delta += dod
        out[i] = out[i - 1] + delta
    return out
