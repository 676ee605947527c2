"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema contracts, Arrow batch
iteration (``mapInPandas``), partition sizing, deterministic sampling —
and ``decode_media`` now has a REAL decode branch for the two formats
parseable without external media libraries:

- **PPM (P6)** images: pure-Python header parse + numpy pixel decode,
  features = 8×8 mean-pooled grayscale (FEATURE_DIM floats), width/height
  from the header;
- **WAV (RIFF/PCM)** audio: chunk walk for fmt/data, 8/16/32-bit PCM
  decode, features = FEATURE_DIM-bin mean-|amplitude| envelope of the
  mono mix, duration from sample count / rate.

Other containers (JPEG/PNG/MP4/...) still raise ``NotImplementedError``
— honestly env-gated on the absent codec libraries — and the
deterministic fake decoder (``fake=True``) remains for pipeline tests
that don't care about pixel math.

At 100 TB the decode stage is the CPU hot spot: mapInPandas keeps it
Arrow-batched (no per-row Python dispatch; the numpy work is per-payload,
which IS the decode work), ``media_repartition`` sizes partitions by
*bytes* (not rows) so a shard of 4K videos doesn't OOM an executor that
was sized for thumbnails.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 64
_POOL = 8  # image features = _POOL x _POOL mean-pooled grid


def make_media_table(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap an arbitrary binary column into the typed media contract."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def media_repartition(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition by payload volume: ceil(total_bytes / target) partitions.

    Row-count partitioning is wrong for media (payload sizes vary 1000×);
    this keeps per-task memory bounded by bytes.
    """
    total = df.select(F.sum(F.length("payload"))).collect()[0][0] or 0
    n = max(1, int(-(-total // target_bytes)))
    return df.repartition(n)


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes → FEATURE_DIM floats."""
    dig = hashlib.sha256(payload).digest()
    seed = int.from_bytes(dig[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM)


def _ppm_tokens(b: bytes, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated integer tokens from a PPM header
    (comment lines ``#...`` allowed), returning (tokens, offset past the
    single whitespace byte that terminates the last token)."""
    toks: list[int] = []
    i = 2  # past the 'P6' magic
    n = len(b)
    while len(toks) < count:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i] == ord("#"):
            while i < n and b[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(b[i:j]))
        i = j
    return toks, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """P6 PPM → (width, height, features): pure Python header parse, numpy
    pixel math. Features are the 8×8 mean-pooled grayscale (ITU-R 601
    luma), row-major, scaled to [0, 1]."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    (w, h, maxval), off = _ppm_tokens(payload, 3)
    if maxval <= 0 or maxval > 65535:
        raise ValueError(f"bad PPM maxval {maxval}")
    bpc = 1 if maxval < 256 else 2
    need = w * h * 3 * bpc
    if len(payload) - off < need:
        raise ValueError(f"PPM payload truncated: {len(payload) - off} < {need} bytes")
    raw = np.frombuffer(payload, dtype=">u2" if bpc == 2 else np.uint8, offset=off, count=w * h * 3)
    rgb = raw.reshape(h, w, 3).astype(np.float64) / maxval
    gray = rgb @ np.array([0.299, 0.587, 0.114])
    # mean-pool onto the _POOL x _POOL grid via bucketed bincount (handles
    # dimensions not divisible by _POOL)
    ri = np.minimum((np.arange(h) * _POOL) // h, _POOL - 1)
    ci = np.minimum((np.arange(w) * _POOL) // w, _POOL - 1)
    cell = (ri[:, None] * _POOL + ci[None, :]).ravel()
    sums = np.bincount(cell, weights=gray.ravel(), minlength=_POOL * _POOL)
    cnts = np.bincount(cell, minlength=_POOL * _POOL)
    return w, h, sums / np.maximum(cnts, 1)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM → (duration_ms, features): chunk walk, numpy sample
    decode. Features are the FEATURE_DIM-bin mean-|amplitude| envelope of
    the mono mix, amplitudes normalized to [-1, 1]."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(payload)
    fmt = None
    data = None
    while i + 8 <= n:
        cid, clen = payload[i : i + 4], struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format {audio_format})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    n_samp = x.size
    duration_ms = int(round(n_samp / rate * 1000)) if rate else 0
    if n_samp == 0:
        return duration_ms, np.zeros(FEATURE_DIM)
    bins = np.minimum((np.arange(n_samp) * FEATURE_DIM) // n_samp, FEATURE_DIM - 1)
    sums = np.bincount(bins, weights=np.abs(x), minlength=FEATURE_DIM)
    cnts = np.bincount(bins, minlength=FEATURE_DIM)
    return duration_ms, sums / np.maximum(cnts, 1)


def _decode_real(payload: bytes) -> dict:
    """Dispatch on magic bytes. PPM and WAV decode for real; anything else
    needs codec libraries absent from this container → NotImplementedError
    (the honest env gate, now behind two real branches instead of zero)."""
    if payload[:2] == b"P6":
        w, h, feats = decode_ppm(payload)
        return {"mime": "image/x-portable-pixmap", "width": w, "height": h,
                "duration_ms": None, "features": feats}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        dur, feats = decode_wav(payload)
        return {"mime": "audio/wav", "width": None, "height": None,
                "duration_ms": dur, "features": feats}
    raise NotImplementedError(
        "only PPM (P6) and WAV (PCM) decode without external media libs; "
        "this container ships none — pass fake=True for the deterministic stub"
    )


def decode_media(df: DataFrame, fake: bool = False, batch_note_col: bool = False) -> DataFrame:
    """payload → (detected mime, dimensions/duration, feature vector) via
    Arrow-batched mapInPandas.

    ``fake=False`` decodes PPM/WAV payloads for real and raises
    NotImplementedError for formats whose codecs aren't in this container;
    ``fake=True`` derives deterministic features from the bytes alone
    (sha256-seeded) so pipelines exercise identical plans without pixel
    math. Both paths share the schema, partitioning, and batch shape.
    """
    schema = (
        "media_id long, kind string, mime string, n_bytes long, "
        "width int, height int, duration_ms int, features array<double>"
    )
    if batch_note_col:
        schema += ", batch_rows int"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["payload"]:
                b = bytes(p)
                if fake:
                    rows.append({"mime": None, "width": None, "height": None,
                                 "duration_ms": None, "features": _fake_features(b)})
                else:
                    rows.append(_decode_real(b))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "mime": [r["mime"] for r in rows],
                    "n_bytes": pdf["payload"].map(len).to_numpy(),
                    "width": pd.array([r["width"] for r in rows], dtype="Int32"),
                    "height": pd.array([r["height"] for r in rows], dtype="Int32"),
                    "duration_ms": pd.array([r["duration_ms"] for r in rows], dtype="Int32"),
                    "features": [np.asarray(r["features"]).tolist() for r in rows],
                }
            )
            if batch_note_col:
                out["batch_rows"] = len(pdf)
            yield out

    return df.mapInPandas(_decode, schema=schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling *plan*: one output row per sampled frame offset.

    Pure relational expansion (sequence + explode) — the per-frame decode
    then flows through decode_media. Null-duration media yields no frames.
    """
    offsets = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return df.filter(F.col("duration_ms").isNotNull()).select(
        "media_id", "kind", "payload", F.explode(offsets).alias("frame_ms")
    )
