"""Streaming model maintenance: updateSVD driven by Structured Streaming.

The reference's update loop is "new block arrives → updateSVD(D)"
(/root/reference/src/models/tsSVDModel.py:194-232, driver-called). The
streaming shape here: ``readStream`` over an append-only bucket source →
``foreachBatch`` folds each micro-batch into the parquet-backed model
state table via update_state (cogrouped kernel), with an atomic
write-then-rename swap so a kill mid-batch leaves the previous state
intact — the same resumability contract as the TierStore checkpoint.

State swap instead of in-place write: streaming epochs may retry; the
swap makes a replayed epoch idempotent at the storage level (the rename
is the commit point).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from tslib_spark.streaming.incremental import update_state


def stream_update_svd(
    spark: SparkSession,
    source_path: str,
    source_schema: str,
    state_dir: str,
    method: str = "folding-in",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Fold arriving bucket files into the model state table, one block per
    micro-batch. ``state_dir`` must hold an initial fit_state parquet.

    Returns the started query (caller awaits/stops). Each epoch:
    read current state → cogrouped update_state with the batch → write to
    ``state_dir + ".next"`` → rename over ``state_dir``.
    """

    def _upsert(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = spark.read.parquet(state_dir)
        new_state = update_state(state, batch_df, method=method)
        nxt = state_dir + ".next"
        shutil.rmtree(nxt, ignore_errors=True)
        new_state.write.mode("overwrite").parquet(nxt)
        old = state_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(state_dir, old)
        os.rename(nxt, state_dir)  # commit point
        shutil.rmtree(old, ignore_errors=True)

    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    writer = stream.writeStream.foreachBatch(_upsert).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
