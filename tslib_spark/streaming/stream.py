"""Structured Streaming rollup: the streaming variant of the 1-minute tier.

The production path for this engine is incremental *batch* over tier
snapshots (TierStore + checkpoint, sidestepping watermarks — SURVEY §2.10);
this module provides the true streaming shape for append-only arrivals:
readStream → watermark → windowed aggregation with the same associative
tier state, suitable for ``foreachBatch`` upserts into the TierStore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tslib_spark.operators.rollup import SUM_DECIMAL


def streaming_rollup(
    spark: SparkSession,
    path: str,
    schema: str,
    keys: list[str],
    ts_col: str,
    measure_col: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming 1-minute rollup over a parquet directory source.

    Late rows beyond ``watermark`` are dropped (the reference has no late-
    data concept; crawl ingestion is append-mostly). Output schema matches
    the batch rollup, so foreachBatch can upsert into the same tier tables.
    """
    stream = spark.readStream.schema(schema).parquet(path)
    # watermarks require TIMESTAMP (with TZ); parquet often yields NTZ
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*[F.col(k) for k in keys], F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col(measure_col).cast(SUM_DECIMAL)).alias("val_sum"),
            F.min(F.col(measure_col).cast("double")).alias("val_min"),
            F.max(F.col(measure_col).cast("double")).alias("val_max"),
        )
        .select(*keys, F.col("w.start").alias("bucket_ts"), "cnt", "val_sum", "val_min", "val_max")
    )
    return agg


def streaming_dedup(
    spark: SparkSession,
    path: str,
    schema: str,
    content_cols: list[str],
    ts_col: str,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact content-dedup for append-only ingestion.

    The streaming counterpart of ``operators.dedup.exact_dedup``: rows
    whose content fingerprint (``xxhash64`` over ``content_cols``, same
    8-byte key as the batch path) already arrived within the watermark
    horizon are dropped. State is the fingerprint set, bounded by the
    watermark — Spark evicts fingerprints older than the horizon, which
    is the standard streaming trade-off (a dup arriving later than the
    watermark re-enters; the batch exact_dedup pass downstream catches
    those). Checkpointed, so dedup state survives restarts.
    """
    stream = spark.readStream.schema(schema).parquet(path)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withColumn("_fp", F.xxhash64(*[F.col(c) for c in content_cols]))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
