"""Arrow-backed chunk tables: Gorilla-compressed series storage on Spark.

A compressed series table holds one row per (series, chunk):
``(<key cols...>, chunk_id long, n_points int, ts_start long,
ts_blob binary, val_blob binary)`` — the storage format of the 1-minute
tier per the north star ("raw 1-minute buckets compressed with Gorilla XOR
value encoding + delta-of-delta timestamps inside Arrow-backed binary
columns").

Encode/decode are grouped Arrow kernels (one Python crossing per series
group); chunks are capped at CHUNK_SIZE points so a head-url series becomes
many bounded rows rather than one unbounded blob — the same skew-safety
argument as the kernel group-size assertion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tslib_spark.codec.gorilla import (
    CHUNK_SIZE,
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


def encode_chunks(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "bucket_idx",
    value_col: str = "value",
    chunk_size: int = CHUNK_SIZE,
    kernel_buckets: int = 256,
) -> DataFrame:
    """Tidy series rows → compressed chunk rows (one kernel pass).

    Kernel granularity matters at scale: one applyInPandas group per
    *series* pays the JVM↔Python Arrow crossing (~ms) per series — with
    10^5+ short series that fixed cost dominates the actual bit-packing.
    Instead the shuffle groups by ``pmod(xxhash64(keys), kernel_buckets)``
    and one kernel call encodes every series in its bucket (pandas groupby
    inside). The bucket count doubles as skew salting: a head url shares
    its bucket with ~n_series/kernel_buckets others, never a whole task.
    """
    key_fields = ", ".join(f"`{k}` string" for k in keys)
    schema = (
        f"{key_fields}, chunk_id long, n_points int, ts_start long, "
        "ts_blob binary, val_blob binary"
    )

    def _encode_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([*keys, ts_col])
        rows = []
        for keyvals, sub in pdf.groupby(keys, sort=False):
            if not isinstance(keyvals, tuple):
                keyvals = (keyvals,)
            ts = sub[ts_col].to_numpy(dtype=np.int64)
            vals = sub[value_col].to_numpy(dtype=np.float64)
            for ci, start in enumerate(range(0, len(ts), chunk_size)):
                t = ts[start : start + chunk_size]
                v = vals[start : start + chunk_size]
                rows.append(
                    (*keyvals, ci, len(t), int(t[0]), encode_timestamps(t), encode_values(v))
                )
        return pd.DataFrame(
            rows, columns=[*keys, "chunk_id", "n_points", "ts_start", "ts_blob", "val_blob"]
        )

    tidy = df.select(
        *[F.col(k).cast("string") for k in keys],
        F.col(ts_col).cast("long").alias(ts_col),
        F.col(value_col).cast("double").alias(value_col),
        F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(kernel_buckets)).alias("_bucket"),
    )
    return tidy.groupBy("_bucket").applyInPandas(_encode_bucket, schema=schema)


def decode_chunks(
    chunks: DataFrame,
    keys: list[str],
    ts_col: str = "bucket_idx",
    value_col: str = "value",
) -> DataFrame:
    """Compressed chunk rows → tidy series rows (inverse of encode_chunks)."""
    key_fields = ", ".join(f"`{k}` string" for k in keys)
    schema = f"{key_fields}, {ts_col} long, {value_col} double"

    def _decode(iterator):
        # column-wise loop over the blob arrays (never pdf.iterrows — that
        # materializes a pandas Series per chunk row); key columns are
        # np.repeat-broadcast by decoded lengths, all vectorized.
        for pdf in iterator:
            if not len(pdf):
                yield pd.DataFrame(columns=[*keys, ts_col, value_col])
                continue
            ts_all = [decode_timestamps(bytes(b)) for b in pdf["ts_blob"].to_numpy()]
            val_all = [decode_values(bytes(b)) for b in pdf["val_blob"].to_numpy()]
            lens = np.fromiter((t.size for t in ts_all), dtype=np.int64, count=len(ts_all))
            out = pd.DataFrame(
                {k: np.repeat(pdf[k].to_numpy(), lens) for k in keys}
            )
            out[ts_col] = np.concatenate(ts_all) if ts_all else np.empty(0, np.int64)
            out[value_col] = np.concatenate(val_all) if val_all else np.empty(0, np.float64)
            yield out

    return chunks.mapInPandas(_decode, schema=schema)


def chunk_stats(chunks: DataFrame) -> DataFrame:
    """Compression accounting: bytes per chunk vs raw 16 B/point."""
    return chunks.select(
        F.sum("n_points").alias("points"),
        F.sum(F.length("ts_blob") + F.length("val_blob")).alias("compressed_bytes"),
        (F.sum("n_points") * 16).alias("raw_bytes"),
    ).select(
        "points",
        "compressed_bytes",
        "raw_bytes",
        (F.col("raw_bytes") / F.col("compressed_bytes")).alias("compression_ratio"),
    )
