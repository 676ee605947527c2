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

Decode vectorization: variable-length prefix codes make code *positions*
inherently serial, but only the positions. Decode is two passes:

1. a position scan — a tight pure-Python-int loop (no numpy scalars) that
   reads each ≤12-bit control/header via a precomputed 32-bit sliding
   window and records (payload offset, payload width) per point;
2. a fully vectorized numpy pass — 9-byte gathers extract every payload
   at once, then ``np.bitwise_xor.accumulate`` (values) / double
   ``np.cumsum`` (delta-of-delta timestamps) reconstruct the series.

Pass 1 costs ~5 int ops/point; pass 2 is O(n) numpy. Both run inside
Arrow kernels over bounded chunks (≤ CHUNK_SIZE points), so Python-level
work is per point *in a chunk*, never per DataFrame row.
"""

from __future__ import annotations

import numpy as np

CHUNK_SIZE = 4096  # max points per encoded chunk

_U64 = np.uint64


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


def _pack_spans(
    hi: np.ndarray, lo: np.ndarray, width: np.ndarray, starts: np.ndarray
) -> list[bytes]:
    """Pack codes into ONE payload per span (series), vectorized across all
    spans at once: one (n × maxw) bit matrix for the whole batch, then a
    cheap per-span packbits over its flat-bit slice. ``starts`` are span
    start indices into the code arrays (first span starts at 0).

    This is what makes many-small-series encoding cheap: the per-series
    cost collapses to ~10 µs (slice + packbits) instead of a full encode
    call (~1 ms of numpy/pandas fixed overhead).

    The (slab × maxw) bit matrix is materialized in bounded slabs — for
    millions of codes a single matrix plus its int temporaries would run
    to gigabytes."""
    n = width.size
    if n == 0:
        return []
    SLAB = 1 << 18
    flats = []
    for a in range(0, n, SLAB):
        b = min(a + SLAB, n)
        w = width[a:b].astype(np.int32)
        maxw = int(w.max())
        j = np.arange(maxw, dtype=np.int32)[None, :]
        shift = w[:, None] - 1 - j
        valid = shift >= 0
        sh = np.where(valid, shift, 0)
        from_hi = sh >= 64
        sh_lo = np.where(from_hi, 0, sh).astype(np.uint64)
        sh_hi = np.where(from_hi, sh - 64, 0).astype(np.uint64)
        bits = np.where(
            from_hi,
            (hi[a:b, None] >> sh_hi) & _U64(1),
            (lo[a:b, None] >> sh_lo) & _U64(1),
        ).astype(np.uint8)
        flats.append(bits[valid])
    flat = np.concatenate(flats) if len(flats) > 1 else flats[0]
    # bit offset of each span within the flat stream
    cum_w = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(width, out=cum_w[1:])
    bounds = np.append(cum_w[starts], cum_w[-1])
    return [
        np.packbits(flat[bounds[i] : bounds[i + 1]]).tobytes()
        for i in range(starts.size)
    ]


def encode_values_multi(values: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Gorilla-XOR encode many series in one vectorized pass.

    ``values`` is the concatenation of all series; ``starts`` marks each
    series' first index (starts[0] == 0). Bit-identical per series to
    encode_values — the XOR chain just resets at every start."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = v.size
    if n == 0:
        return []
    xor = np.empty(n, dtype=np.uint64)
    xor[0] = v[0]
    xor[1:] = v[1:] ^ v[:-1]
    xor[starts] = v[starts]  # chain reset per series

    lead = np.minimum(_clz64(xor), 31)
    mlen = 64 - lead - _ctz64(xor)
    mlen = np.maximum(mlen, 1)
    meaningful = xor >> (_U64(64) - lead.astype(np.uint64) - mlen.astype(np.uint64))

    zero = xor == 0
    width = np.where(zero, 1, 1 + 5 + 6 + mlen)
    header = (
        _U64(1) << _U64(11)
    ) | (lead.astype(np.uint64) << _U64(6)) | (mlen.astype(np.uint64) & _U64(63))
    code = np.where(zero, _U64(0), header)
    lo = np.where(zero, _U64(0), (code << mlen.astype(np.uint64)) | meaningful)
    hi = np.where(
        zero, _U64(0), np.where(mlen + 12 > 64, code >> (_U64(64) - mlen.astype(np.uint64)), _U64(0))
    )
    width[starts] = 64
    lo[starts] = v[starts]
    hi[starts] = 0
    lens = np.diff(np.append(starts, n)).astype(np.uint32)
    payloads = _pack_spans(hi, lo, width, starts)
    return [ln.tobytes() + p for ln, p in zip(lens, payloads)]


def encode_timestamps_multi(ts: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Delta-of-delta encode many series in one vectorized pass; per-series
    bit-identical to encode_timestamps."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = t.size
    if n == 0:
        return []
    lens = np.diff(np.append(starts, n))
    raw = t.view(np.uint64)
    is_start = np.zeros(n, dtype=bool)
    is_start[starts] = True
    second = np.zeros(n, dtype=bool)
    second[starts[lens >= 2] + 1] = True

    delta = np.zeros(n, dtype=np.int64)
    delta[1:] = t[1:] - t[:-1]
    dod = np.zeros(n, dtype=np.int64)
    dod[2:] = delta[2:] - delta[1:-1]
    z = _zigzag(dod)

    width = np.empty(n, dtype=np.int64)
    lo = np.empty(n, dtype=np.uint64)
    hi = np.zeros(n, dtype=np.uint64)
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
    # first two codes of each series are raw 64-bit (ts, then first delta)
    width[is_start] = 64
    lo[is_start] = raw[is_start]
    hi[is_start] = 0
    width[second] = 64
    lo[second] = delta[second].view(np.uint64)
    hi[second] = 0

    payloads = _pack_spans(hi, lo, width, starts)
    return [np.uint32(ln).tobytes() + p for ln, p in zip(lens, payloads)]


def _read_tables(payload: bytes) -> tuple[list[int], np.ndarray]:
    """Fast-read helpers over a packed bit stream.

    Returns ``(quad, pbytes)``: ``quad[k]`` is the big-endian 32-bit word
    at byte offset k (a plain Python list — pass-1 loops index it with
    native ints, ~100 ns cheaper per read than numpy scalar indexing), and
    ``pbytes`` is the zero-padded byte array for pass-2 vector gathers.
    Reading ``w ≤ 25`` bits at bit position p:
    ``(quad[p >> 3] >> (32 - (p & 7) - w)) & ((1 << w) - 1)``.
    """
    padded = np.frombuffer(payload + b"\x00" * 12, dtype=np.uint8)
    b = padded.astype(np.uint32)
    quad = ((b[:-3] << 8 | b[1:-2]) << 16 | (b[2:-1] << 8 | b[3:])).tolist()
    return quad, padded


def _gather64(pbytes: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Vectorized read of 64 bits at each bit offset in ``off`` (MSB-first).

    Gathers 9 bytes per offset (a 64-bit payload at bit-in-byte offset r
    spans at most 9 bytes) and aligns; ``pbytes`` must be padded so
    ``(off >> 3) + 8`` is in range.
    """
    pb = pbytes.astype(np.uint64)
    k = (off >> 3).astype(np.int64)
    r = (off & 7).astype(np.uint64)
    w = pb[k]
    for j in range(1, 8):
        w = (w << _U64(8)) | pb[k + j]
    # r == 0 → tail byte shifted out entirely (uint64 >> 8 of a byte = 0)
    return (w << r) | (pb[k + 8] >> (_U64(8) - r))


def decode_values(buf: bytes) -> np.ndarray:
    if not buf:
        return np.empty(0, dtype=np.float64)
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    payload = buf[4:]
    quad, pbytes = _read_tables(payload)

    # fast path: constant series — every xor code is the 1-bit '0', so the
    # stream is exactly 64 + (n-1) bits; any non-constant point adds ≥12
    # bits, so byte length alone discriminates. (The common case for
    # gap-filled / boilerplate-flat tiers.)
    if n > 1 and len(payload) == (64 + n - 1 + 7) // 8:
        v0 = _gather64(pbytes, np.array([0], np.int64)).view(np.float64)[0]
        return np.full(n, v0)

    # pass 1: position scan — record (payload offset, lead, mlen) per point
    # (plain Python lists: per-element numpy stores cost ~300 ns each, list
    # appends ~50 ns — this loop is the decode bottleneck)
    moff_l = [0]
    lead_l = [0]
    mlen_l = [64]  # first value: raw 64 bits (lead 0 → xor == raw bits)
    pos = 64
    for _ in range(1, n):
        hdr = (quad[pos >> 3] >> (20 - (pos & 7))) & 0xFFF  # ctrl+lead+mlen
        if hdr < 0x800:  # ctrl bit 0 → repeat previous value
            moff_l.append(-1)
            lead_l.append(0)
            mlen_l.append(1)  # any nonzero width; payload masked out below
            pos += 1
        else:
            m = (hdr & 63) or 64
            lead_l.append((hdr >> 6) & 31)
            mlen_l.append(m)
            pos += 12
            moff_l.append(pos)
            pos += m
    moff = np.array(moff_l, dtype=np.int64)
    lead = np.array(lead_l, dtype=np.uint64)
    mlen = np.array(mlen_l, dtype=np.uint64)

    # pass 2: vectorized payload extraction + XOR-prefix reconstruction
    repeat = moff < 0
    w = _gather64(pbytes, np.where(repeat, 0, moff))
    meaningful = w >> (_U64(64) - mlen)
    xor = np.where(repeat, _U64(0), meaningful << (_U64(64) - lead - mlen))
    return np.bitwise_xor.accumulate(xor).view(np.float64)


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)



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
    payload = buf[4:]
    quad, pbytes = _read_tables(payload)

    head = _gather64(pbytes, np.array([0, 64], np.int64)).view(np.int64)
    t0 = int(head[0])
    if n == 1:
        return np.array([t0], np.int64)
    delta0 = int(head[1])

    # fast path: regular grid — every dod code is the 1-bit '0', so the
    # stream is exactly 128 + (n-2) bits; any non-zero dod adds ≥8 bits,
    # so byte length alone discriminates. (The 1-minute-tier common case:
    # SURVEY §2.12's ~1 bit/point degenerate grid.)
    if len(payload) == (128 + n - 2 + 7) // 8:
        return t0 + delta0 * np.arange(n, dtype=np.int64)

    # pass 1: position scan — classify each prefix, record (z offset, width)
    m = n - 2
    zoff_l: list[int] = []
    zw_l: list[int] = []
    pos = 128
    for _ in range(m):
        c = (quad[pos >> 3] >> (28 - (pos & 7))) & 0xF
        if c < 0b1000:  # '0' → dod == 0
            zoff_l.append(0)
            zw_l.append(0)
            pos += 1
        elif c < 0b1100:  # '10' + 7 bits
            zoff_l.append(pos + 2)
            zw_l.append(7)
            pos += 9
        elif c < 0b1110:  # '110' + 12 bits
            zoff_l.append(pos + 3)
            zw_l.append(12)
            pos += 15
        elif c == 0b1110:  # '1110' + 20 bits
            zoff_l.append(pos + 4)
            zw_l.append(20)
            pos += 24
        else:  # '1111' + 64 bits
            zoff_l.append(pos + 4)
            zw_l.append(64)
            pos += 68
    zoff = np.array(zoff_l, dtype=np.int64)
    zw = np.array(zw_l, dtype=np.uint64)

    # pass 2: vectorized zigzag extraction + double prefix-sum
    w = _gather64(pbytes, zoff)
    z = np.where(zw == 0, _U64(0), w >> ((_U64(64) - zw) & _U64(63)))
    dod = (z >> _U64(1)).view(np.int64) ^ -(z & _U64(1)).view(np.int64)
    # delta_i = delta0 + cumsum(dod); out_i = t0 + cumsum(delta)
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = delta0
    if m:
        np.cumsum(dod, out=deltas[1:])
        deltas[1:] += delta0
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    np.cumsum(deltas, out=out[1:])
    out[1:] += t0
    return out
