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
