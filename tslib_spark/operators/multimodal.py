"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema contracts, Arrow batch
iteration (``mapInPandas``), partition sizing, deterministic sampling. The
actual media decoding is STUBBED: the image/audio libraries are not in this
container, so ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested (``fake=True``), which derives a
fixed-shape feature vector from the bytes alone (xxhash-seeded) so the
full pipeline — including batch shapes and downstream joins — is testable.

At 100 TB the decode stage is the CPU hot spot: mapInPandas keeps it
Arrow-batched (no per-row Python dispatch), ``media_repartition`` sizes
partitions by *bytes* (not rows) so a shard of 4K videos doesn't OOM an
executor that was sized for thumbnails.
"""

from __future__ import annotations

import hashlib
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


def decode_media(df: DataFrame, fake: bool = False, batch_note_col: bool = False) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    With ``fake=False`` this raises NotImplementedError at execution time
    (media libs absent in this container — see module docstring); the
    surrounding plan (schema, partitioning, batch shape) is identical to
    the real path.
    """
    schema = f"media_id long, kind string, n_bytes long, features array<double>"
    if batch_note_col:
        schema += ", batch_rows int"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this container; pass fake=True for the deterministic stub"
                )
            feats = [
                _fake_features(bytes(p)) for p in pdf["payload"]
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": pdf["payload"].map(len).to_numpy(),
                    "features": [f.tolist() for f in feats],
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
