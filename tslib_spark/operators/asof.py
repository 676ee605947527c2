"""As-of join: match each left row to the latest right row with
right_ts <= left_ts per key.

Spark has no native as-of join (SURVEY §2.3 / pyspark guide). The
shuffle-minimal implementation is the union-tag trick: interleave both
sides into one keyed, time-sorted stream and forward-fill the right-side
payload with a *running* window frame — one shuffle on the key, one sort,
O(n) window evaluation (cf. the O(n²) trap documented in gapfill.py).
Equal timestamps match inclusively (right row wins at its own instant),
matching DuckDB/pandas ``merge_asof`` semantics.

Alternative at extreme scale: bucketize by time range + equi-join (guide
§"As-of / range join"); the union-tag form wins when the right side is
comparable in size to the left and both are already key-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Returns every left row + the as-of payload columns (NULL if no
    right row precedes it).

    ``right_tiebreak``: payload column names that order right rows sharing
    an exact (key, ts) — the highest wins. Without it, ties resolve
    arbitrarily (any SQL engine's ASOF does the same); pass it whenever the
    right side isn't unique per (key, ts) and determinism matters.
    """
    lcols = [c for c in left.columns]
    l_tag = left.select(
        *keys,
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_is_right"),
        *[F.col(c) for c in lcols if c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    r_tag = right.select(
        *keys,
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    tb = [F.col(f"_p_{c}").asc_nulls_first() for c in (right_tiebreak or [])]
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_is_right").desc(), *tb)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload_cols
        ],
    )
    return filled.filter(F.col("_is_right") == 0).select(
        *keys,
        F.col("_t").alias(left_ts),
        *[F.col(c) for c in lcols if c not in keys and c != left_ts],
        *[F.col(f"_asof_{c}").alias(c) for c in payload_cols],
    )
