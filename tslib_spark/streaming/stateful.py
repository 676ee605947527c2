"""Custom stateful streaming operator via applyInPandasWithState.

A running per-series tier accumulator: each micro-batch folds new events
into persistent per-key state ``(cnt, val_sum, val_min, val_max)`` and
emits the updated state row. This is the streaming analogue of the batch
tier rollup — same associative state, maintained incrementally across
micro-batches instead of recomputed (the applyInPandasWithState shape the
brief calls out for custom stateful operators).

val_sum is carried as a scaled integer (1e-9 fixed point, same scale as
the batch decimal(38,9) state) so cross-batch accumulation stays exact —
GroupState rows can't hold decimals, and accumulating float64 across
batches would break bit-parity with the batch tiers.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "series_key string, cnt long, val_sum_scaled long, val_min double, val_max double"
STATE_SCHEMA = "cnt long, val_sum_scaled long, val_min double, val_max double"
SCALE = 1_000_000_000  # 1e-9 fixed point, matching decimal(38,9)


def _accumulate(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    if state.exists:
        cnt, vsum, vmin, vmax = state.get
    else:
        cnt, vsum, vmin, vmax = 0, 0, float("inf"), float("-inf")
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        cnt += len(vals)
        if len(vals):
            # round each value to the 1e-9 quantum BEFORE summing (exact
            # int64 adds), matching the batch tier's cast-to-decimal(38,9)
            # -then-sum semantics; a float64 batch sum rounded once can
            # drift past the quantum on large batches (~n*eps*sum|x|).
            # The quantum rounding must be HALF_UP (away from zero) like
            # Spark's Decimal cast — pandas .round() is banker's
            # half-to-even, which diverges by 1e-9 on exact half-quantum
            # values (e.g. 2.5e-9) and breaks streaming/batch parity.
            v = vals.to_numpy(dtype="float64")
            scaled = np.sign(v) * np.floor(np.abs(v) * SCALE + 0.5)
            vsum += int(scaled.astype("int64").sum())
            vmin = min(vmin, float(vals.min()))
            vmax = max(vmax, float(vals.max()))
    state.update((cnt, vsum, vmin, vmax))
    yield pd.DataFrame(
        [{"series_key": key[0], "cnt": cnt, "val_sum_scaled": vsum, "val_min": vmin, "val_max": vmax}]
    )


def stateful_running_rollup(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """events stream → continuously updated per-key tier state rows."""
    tidy = stream.selectExpr(f"{key_col} as series_key", f"CAST({value_col} AS double) as value")
    return tidy.groupBy("series_key").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
