"""Baseline JPEG (SOF0) decoder — pure numpy + stdlib, no codec libraries.

Scope (the overwhelmingly common web-JPEG shape), per ITU-T T.81:
- baseline sequential DCT, 8-bit samples, Huffman entropy coding;
- grayscale or YCbCr with arbitrary sampling factors (4:4:4, 4:2:0, ...);
- restart markers (DRI/RSTn) and APPn/COM segments handled;
- progressive (SOF2), arithmetic coding, 12-bit, and hierarchical modes
  raise ValueError — detected, never mis-decoded.

Design: the entropy decode is inherently serial (Huffman codes have no
sidecar here, unlike our Gorilla codec), so symbols are decoded in a
Python loop per 8×8 block; everything after the symbol stream —
dezigzag, dequantization, the 2-D IDCT (one (blocks × 64) @ (64 × 64)
matmul per component), chroma upsampling (np.repeat), color transform —
is vectorized numpy over all blocks at once. Per-payload cost is
dominated by the numpy stages for typical images; this runs inside the
same Arrow-batched ``mapInPandas`` as the other media decoders
(operators/multimodal.py), where per-payload Python IS the decode work.

The features contract matches PNG/PPM: 8×8 mean-pooled grayscale. For
JPEG the luma plane *is* the grayscale (Rec. 601 Y), so features pool Y
directly — bit-identical to computing RGB first and re-deriving luma.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: row u, column x
_C = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)
# 64x64 separable IDCT operator on flattened row-major blocks:
# pixels = coefs @ _IDCT64  (coef layout: row-major frequency u,v)
_IDCT64 = np.einsum("ui,vj->uvij", _C, _C).reshape(64, 64)


class _BitReader:
    """MSB-first bit reader over a destuffed entropy-coded segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a ``size``-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _HuffTable:
    """Canonical JPEG Huffman table → (code, length) → symbol decode."""

    def __init__(self, bits: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _destuff(data: bytes) -> list[bytes]:
    """Split the entropy-coded data at restart markers and remove 0xFF00
    byte stuffing; returns the list of restart intervals."""
    segs: list[bytes] = []
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            if i + 1 >= n:
                break
            m = data[i + 1]
            if m == 0x00:
                out.append(0xFF)
                i += 2
                continue
            if m == 0xFF:  # T.81 B.1.1.2 fill byte before a marker
                i += 1
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segs.append(bytes(out))
                out = bytearray()
                i += 2
                continue
            break  # next real marker — scan is over
        out.append(b)
        i += 1
    segs.append(bytes(out))
    return segs


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """JPEG → (width, height, 8×8 mean-pooled luma features in [0, 1])."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at byte {i}")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes —
        # real crawled files pad with them, so skip runs of 0xFF before
        # reading the marker byte instead of parsing a bogus segment length
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            break
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0xF
                j += 1
                if prec == 0:
                    tbl = np.frombuffer(body[j : j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
                else:
                    tbl = np.frombuffer(body[j : j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                if tbl.size != 64:
                    raise ValueError("truncated JPEG DQT")
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                syms = body[j + 17 : j + 17 + cnt]
                if len(syms) != cnt:
                    raise ValueError("truncated JPEG DHT")
                huff[(cls, tid)] = _HuffTable(bits, syms)
                j += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(+ext seq)
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (got {prec})")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/1) supported "
                f"(got SOF marker 0x{marker:02X} — progressive/arithmetic/"
                "hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0xF))
            ecs_start = i + 2 + seglen
            return _decode_scan(
                payload[ecs_start:], frame, scan, qt, huff, restart_interval
            )
        # APPn / COM / others: skip
        i += 2 + seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(data, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcols = -(-w // mcu_w)
    mrows = -(-h // mcu_h)
    n_mcus = mcols * mrows

    segs = _destuff(data)
    # per component: list of dezigzagged coefficient blocks in MCU order
    coef_blocks = {c["id"]: [] for c in comps}
    pred = {c["id"]: 0 for c in comps}
    seg_idx = 0
    reader = _BitReader(segs[0])
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("truncated JPEG: missing restart interval")
            reader = _BitReader(segs[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        for comp, td, ta in scan:
            dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
            for _ in range(comp["v"] * comp["h"]):
                zz = np.zeros(64, dtype=np.int32)
                t = dc_tab.decode(reader)
                diff = _extend(reader.receive(t), t)
                pred[comp["id"]] += diff
                zz[0] = pred[comp["id"]]
                k = 1
                while k < 64:
                    rs = ac_tab.decode(reader)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past end of block")
                    zz[k] = _extend(reader.receive(s), s)
                    k += 1
                coef_blocks[comp["id"]].append(zz)

    # vectorized tail: dequant → dezigzag → one IDCT matmul per component
    planes = {}
    for comp in comps:
        blocks = np.stack(coef_blocks[comp["id"]])  # (nblocks, 64) zigzag
        blocks = blocks * qt[comp["tq"]][None, :]
        deZ = np.zeros_like(blocks)
        deZ[:, ZIGZAG] = blocks  # natural row-major frequency order
        pix = deZ.astype(np.float64) @ _IDCT64  # (nblocks, 64) spatial
        pix = np.clip(np.rint(pix) + 128, 0, 255)
        # blocks arrive MCU-major: reshape (mrows, mcols, v, h, 8, 8)
        v_i, h_i = comp["v"], comp["h"]
        arr = pix.reshape(mrows, mcols, v_i, h_i, 8, 8)
        plane = arr.transpose(0, 2, 4, 1, 3, 5).reshape(
            mrows * v_i * 8, mcols * h_i * 8
        )
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // v_i, axis=0), hmax // h_i, axis=1)
        planes[comp["id"]] = plane[:h, :w]

    luma = planes[comps[0]["id"]]  # Y (or the single grayscale component)
    return w, h, luma / 255.0
