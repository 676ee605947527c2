"""Gorilla-style codec: XOR float compression + delta-of-delta timestamps.

Pure numpy, vectorized bit-packing — no per-value Python on either the
encode or the decode path (BASELINE.json input_hint: no per-row Python).
The bit scheme follows the Facebook Gorilla paper (Pelkonen et al., VLDB
2015):

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

Buffer layout (v2 — decode-index sidecar):

    [hdr: uint32] [sidecar?] [payload bits]

``hdr`` packs the point count in the low 29 bits, an explicit 2-bit
layout version in bits 30-29 (this layout = 1; version 0 is the
historical unversioned v1, rejected with a clear error instead of being
silently mis-decoded), and a ``has_sidecar`` flag in the top bit. Variable-length prefix codes make code *positions*
serial to recover from the payload alone; since the encoder already knows
every code width, it emits them as a sidecar so decode is 100% numpy:

- values sidecar: a bitmap over points 1..n-1 (bit = xor != 0, i.e. the
  code is a 12+mlen-bit header code rather than the 1-bit repeat code),
  then a 6-bit (mlen & 63) entry per set bit, MSB-first packed.
- timestamp sidecar: a bitmap over points 2..n-1 (bit = dod != 0), then a
  2-bit bucket class (7/12/20/64-bit) entry per set bit.

Degenerate streams — constant values, regular time grids — have an
all-zero bitmap, so the encoder drops the sidecar entirely (flag = 0) and
the ~1 bit/point cost of those cases is preserved; decode reconstructs
them arithmetically. Non-degenerate streams pay bitmap (1 bit/point) +
entries (6 or 2 bits per non-trivial point), a few % of payload size.

Decode is then two fully-vectorized steps: code positions from a cumsum
of sidecar-derived widths, payloads via 9-byte ``_gather64`` gathers,
then ``np.bitwise_xor.accumulate`` (values) / double ``np.cumsum``
(delta-of-delta timestamps). Everything runs inside Arrow kernels over
bounded chunks (≤ CHUNK_SIZE points); there is no per-point Python loop
anywhere in the codec.
"""

from __future__ import annotations

import numpy as np

CHUNK_SIZE = 4096  # max points per encoded chunk

_U64 = np.uint64
_FLAG_SIDECAR = np.uint32(1 << 31)
# explicit layout version in header bits 30-29 (counts are chunk-bounded
# ≤ 4096, nowhere near 2^29): version 0b00 is the historical unversioned
# v1 layout whose top bit was always 0 — without the marker a durably
# persisted v1 blob would silently decode on the v2 degenerate path as a
# constant series / regular grid instead of erroring, and future layout
# changes would be equally undetectable
_VER_SHIFT = 29
_VERSION = 1  # the sidecar ("v2") layout
_VER_BITS = np.uint32(_VERSION << _VER_SHIFT)
_VER_MASK = 0b11 << _VER_SHIFT
_N_MASK = (1 << _VER_SHIFT) - 1


def _check_version(hdr: int) -> None:
    ver = (hdr & _VER_MASK) >> _VER_SHIFT
    if ver != _VERSION:
        raise ValueError(
            f"unrecognized Gorilla blob layout (version bits {ver}, expected "
            f"{_VERSION}) — refusing to guess: unversioned/v1 blobs would "
            "silently mis-decode on the degenerate path"
        )


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


def _pack_sidecars(
    include: np.ndarray,
    flags: np.ndarray,
    entry_vals: np.ndarray,
    ebits: int,
    starts: np.ndarray,
) -> list[bytes]:
    """Per-span decode-index sidecars (see module docstring).

    ``include`` masks the points that belong to the bitmap domain (the
    raw-coded first point(s) of each span are excluded), ``flags`` marks
    non-trivial codes, ``entry_vals`` carries the per-point entry value
    (only read where ``flags & include``), ``ebits`` its fixed width.
    Returns b"" for degenerate spans (all-zero bitmap)."""
    n = include.size
    incl_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(include, out=incl_cum[1:])
    sub_flags = flags[include]
    sub_bounds = np.append(incl_cum[starts], incl_cum[-1])
    sel = flags & include
    sel_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sel, out=sel_cum[1:])
    ent = entry_vals[sel].astype(np.uint64)
    ent_bounds = np.append(sel_cum[starts], sel_cum[-1])
    shifts = np.arange(ebits - 1, -1, -1, dtype=np.uint64)
    ent_bits = ((ent[:, None] >> shifts) & _U64(1)).astype(np.uint8)
    out: list[bytes] = []
    for i in range(starts.size):
        fb = sub_flags[sub_bounds[i] : sub_bounds[i + 1]]
        if not fb.any():
            out.append(b"")
            continue
        bm = np.packbits(fb).tobytes()
        eb = np.packbits(ent_bits[ent_bounds[i] : ent_bounds[i + 1]].ravel()).tobytes()
        out.append(bm + eb)
    return out


def _hdr(n: int, sidecar: bytes) -> bytes:
    h = np.uint32(n) | _VER_BITS
    if sidecar:
        h |= _FLAG_SIDECAR
    return h.tobytes()


def encode_values(values: np.ndarray) -> bytes:
    """Gorilla-XOR encode a float64 array (NaN round-trips bit-exactly)."""
    arr = np.ascontiguousarray(values, dtype=np.float64)
    if arr.size == 0:
        return b""
    return encode_values_multi(arr, np.zeros(1, dtype=np.int64))[0]


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 array (timestamps in any fixed unit)."""
    arr = np.ascontiguousarray(ts, dtype=np.int64)
    if arr.size == 0:
        return _VER_BITS.tobytes()
    return encode_timestamps_multi(arr, np.zeros(1, dtype=np.int64))[0]


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


def encode_values_multi(values: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Gorilla-XOR encode many series in one vectorized pass.

    ``values`` is the concatenation of all series; ``starts`` marks each
    series' first index (starts[0] == 0). Bit-identical per series to
    encode_values — the XOR chain just resets at every start."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = v.size
    if n == 0:
        return []
    starts = np.asarray(starts, dtype=np.int64)
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
    payloads = _pack_spans(hi, lo, width, starts)

    include = np.ones(n, dtype=bool)
    include[starts] = False  # first point is raw-coded, not in the bitmap
    sidecars = _pack_sidecars(include, ~zero, mlen.astype(np.uint64) & _U64(63), 6, starts)

    lens = np.diff(np.append(starts, n))
    return [
        _hdr(int(ln), sc) + sc + p for ln, sc, p in zip(lens, sidecars, payloads)
    ]


def encode_timestamps_multi(ts: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Delta-of-delta encode many series in one vectorized pass; per-series
    bit-identical to encode_timestamps."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = t.size
    if n == 0:
        return []
    starts = np.asarray(starts, dtype=np.int64)
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
    cls = np.zeros(n, dtype=np.uint64)  # sidecar bucket class per non-zero dod
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
    cls[b12] = 1
    width[b20] = 4 + 20
    lo[b20] = (_U64(0b1110) << _U64(20)) | z[b20]
    cls[b20] = 2
    width[b64] = 4 + 64
    lo[b64] = z[b64]
    hi[b64] = _U64(0b1111)
    cls[b64] = 3
    # first two codes of each series are raw 64-bit (ts, then first delta)
    width[is_start] = 64
    lo[is_start] = raw[is_start]
    hi[is_start] = 0
    width[second] = 64
    lo[second] = delta[second].view(np.uint64)
    hi[second] = 0

    payloads = _pack_spans(hi, lo, width, starts)
    include = ~(is_start | second)  # raw-coded heads are not in the bitmap
    sidecars = _pack_sidecars(include, ~zero, cls, 2, starts)
    return [
        _hdr(int(ln), sc) + sc + p for ln, sc, p in zip(lens, sidecars, payloads)
    ]


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


def _padded(payload: bytes) -> np.ndarray:
    """Zero-padded byte array for ``_gather64`` (9-byte reads at any valid
    bit offset stay in range)."""
    return np.frombuffer(payload + b"\x00" * 12, dtype=np.uint8)


def _unpack_entries(buf: bytes, count: int, ebits: int) -> np.ndarray:
    """Read ``count`` MSB-first fixed-width entries from packed bytes."""
    if count == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=count * ebits)
    weights = (1 << np.arange(ebits - 1, -1, -1)).astype(np.int64)
    return bits.reshape(count, ebits).astype(np.int64) @ weights


def decode_values(buf: bytes) -> np.ndarray:
    if not buf:
        return np.empty(0, dtype=np.float64)
    hdr = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    _check_version(hdr)
    n = hdr & _N_MASK
    if n == 0:
        return np.empty(0, dtype=np.float64)

    if not hdr >> 31:
        # degenerate: every xor code is the 1-bit repeat → constant series
        # (the common case for gap-filled / boilerplate-flat tiers)
        v0 = _gather64(_padded(buf[4:]), np.zeros(1, np.int64)).view(np.float64)[0]
        return np.full(n, v0)

    # sidecar → per-point code widths → positions by cumsum; all numpy
    m = n - 1
    bm_bytes = (m + 7) // 8
    bitmap = np.unpackbits(
        np.frombuffer(buf[4 : 4 + bm_bytes], dtype=np.uint8), count=m
    ).astype(bool)
    nz = np.flatnonzero(bitmap) + 1  # point indices with a header code
    k = nz.size
    ent_bytes = (k * 6 + 7) // 8
    mlen6 = _unpack_entries(buf[4 + bm_bytes : 4 + bm_bytes + ent_bytes], k, 6)
    mlen = np.where(mlen6 == 0, 64, mlen6).astype(np.uint64)

    widths = np.ones(n, dtype=np.int64)
    widths[0] = 64
    widths[nz] = 12 + mlen.astype(np.int64)
    pos = np.zeros(n, dtype=np.int64)
    np.cumsum(widths[:-1], out=pos[1:])

    pbytes = _padded(buf[4 + bm_bytes + ent_bytes :])
    heads = _gather64(pbytes, pos[nz])
    lead = (heads >> _U64(58)) & _U64(31)
    pay = _gather64(pbytes, pos[nz] + 12)
    meaningful = pay >> (_U64(64) - mlen)

    xor = np.zeros(n, dtype=np.uint64)
    xor[0] = _gather64(pbytes, np.zeros(1, np.int64))[0]
    xor[nz] = meaningful << (_U64(64) - lead - mlen)
    return np.bitwise_xor.accumulate(xor).view(np.float64)


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


# dod bucket class → (code width, zigzag payload width)
_TS_WIDTH = np.array([9, 15, 24, 68], dtype=np.int64)
_TS_ZW = np.array([7, 12, 20, 64], dtype=np.int64)


def decode_timestamps(buf: bytes) -> np.ndarray:
    hdr = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    _check_version(hdr)
    n = hdr & _N_MASK
    if n == 0:
        return np.empty(0, dtype=np.int64)

    if not hdr >> 31:
        # degenerate: every dod is 0 → regular grid (the 1-minute-tier
        # common case: SURVEY §2.12's ~1 bit/point grid)
        pbytes = _padded(buf[4:])
        t0 = int(_gather64(pbytes, np.zeros(1, np.int64)).view(np.int64)[0])
        if n == 1:
            return np.array([t0], np.int64)
        delta0 = int(_gather64(pbytes, np.full(1, 64, np.int64)).view(np.int64)[0])
        return t0 + delta0 * np.arange(n, dtype=np.int64)

    m = n - 2  # flag implies at least one non-zero dod → n ≥ 3
    bm_bytes = (m + 7) // 8
    bitmap = np.unpackbits(
        np.frombuffer(buf[4 : 4 + bm_bytes], dtype=np.uint8), count=m
    ).astype(bool)
    nz = np.flatnonzero(bitmap)
    k = nz.size
    ent_bytes = (k * 2 + 7) // 8
    cls = _unpack_entries(buf[4 + bm_bytes : 4 + bm_bytes + ent_bytes], k, 2)

    widths = np.ones(m, dtype=np.int64)
    widths[nz] = _TS_WIDTH[cls]
    pos = np.full(m, 128, dtype=np.int64)
    if m > 1:
        pos[1:] += np.cumsum(widths[:-1])

    pbytes = _padded(buf[4 + bm_bytes + ent_bytes :])
    head = _gather64(pbytes, np.array([0, 64], np.int64)).view(np.int64)
    t0, delta0 = int(head[0]), int(head[1])

    zw = _TS_ZW[cls]
    w = _gather64(pbytes, pos[nz] + (_TS_WIDTH[cls] - zw))
    zval = w >> ((_U64(64) - zw.astype(np.uint64)) & _U64(63))
    dod = np.zeros(m, dtype=np.int64)
    dod[nz] = (zval >> _U64(1)).view(np.int64) ^ -(zval & _U64(1)).view(np.int64)

    # delta_i = delta0 + cumsum(dod); out_i = t0 + cumsum(delta)
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = delta0
    np.cumsum(dod, out=deltas[1:])
    deltas[1:] += delta0
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    np.cumsum(deltas, out=out[1:])
    out[1:] += t0
    return out


def migrate_v1_blob(buf: bytes, kind: str) -> bytes:
    """One-shot migration for blobs persisted before the header gained its
    version bits (the "v1" sidecar layout: identical payload, version
    field 0). The payload layout never changed — only bits 30-29 of the
    header — so migration is a 4-byte header rewrite, VERIFIED by decoding
    the migrated blob and re-encoding the points: the encoder is
    deterministic, so a genuine v1 blob re-encodes byte-for-byte to the
    migrated form. Anything older (pre-sidecar layouts) fails that check
    and raises instead of silently mis-decoding.

    ``kind`` is ``"values"`` (float64 XOR codec) or ``"timestamps"``
    (int64 delta-of-delta). Idempotent: current-version blobs return
    unchanged."""
    if kind not in ("values", "timestamps"):
        raise ValueError(f"kind must be 'values' or 'timestamps', got {kind!r}")
    if not buf:
        return buf
    hdr = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    ver = (hdr & _VER_MASK) >> _VER_SHIFT
    if ver == _VERSION:
        return buf
    if ver != 0:
        raise ValueError(f"cannot migrate blob with unknown version bits {ver}")
    migrated = (np.uint32(hdr) | _VER_BITS).tobytes() + buf[4:]
    if kind == "values":
        pts = decode_values(migrated)
        re_enc = encode_values(pts)
    else:
        pts = decode_timestamps(migrated)
        re_enc = encode_timestamps(pts)
    if re_enc != migrated:
        raise ValueError(
            "blob is not the v1 sidecar layout (re-encode verification "
            "failed) — re-materialize this tier from raw data instead"
        )
    return migrated


def migrate_v1_state_chunks(chunks):
    """Migrate a compressed tier-STATE DataFrame (codec/statechunks.py
    schema) whose blobs were written by a pre-version-bits build: every
    blob column gets the verified 4-byte header rewrite, Arrow-batched.
    Returns a DataFrame with identical schema; write it back through the
    TierStore backend to complete the one-shot migration."""
    import pandas as pd

    ts_cols = ("ts_blob", "cnt_blob", "sum_blob")
    val_cols = ("min_blob", "max_blob")

    def _migrate(iterator):
        for pdf in iterator:
            for c in ts_cols:
                pdf[c] = pd.Series(
                    [migrate_v1_blob(bytes(b), "timestamps") for b in pdf[c]],
                    index=pdf.index, dtype=object,
                )
            for c in val_cols:
                pdf[c] = pd.Series(
                    [migrate_v1_blob(bytes(b), "values") for b in pdf[c]],
                    index=pdf.index, dtype=object,
                )
            yield pdf

    return chunks.mapInPandas(_migrate, schema=chunks.schema)
