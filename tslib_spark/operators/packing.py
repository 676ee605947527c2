"""Sequence packing: assign documents to fixed token-budget training bins.

Pretraining pipelines concatenate the corpus in a deterministic order and
slice it into fixed-length blocks ("concat-and-chunk"); the operator
labels every doc with the block its first token lands in and the offset
inside that block:

    bin_id     = floor(exclusive_prefix_tokens / budget)
    bin_offset = exclusive_prefix_tokens % budget

so a doc may straddle blocks (exactly the semantics of packed pretraining
batches — block boundaries cut documents, padding-free).

Scale design — the naive ``Window.orderBy(order)`` with no partition key
moves the corpus to ONE task (Spark even warns). Instead the classic
two-pass distributed prefix sum:

1. ``repartitionByRange(order)`` — the only corpus-wide shuffle, and the
   same range exchange a global sort would need anyway;
2. per-partition running totals with a window PARTITIONED by the stamped
   partition id (running O(n) frame, parallel across partitions);
3. per-partition grand totals → exclusive running offsets via a window
   over the #partitions-row totals (a single-task window over bounded
   metadata) → broadcast-joined back.

Stage 3 deliberately stays INSIDE the one returned plan, with no driver
collect: a collect would run the un-persisted repartitionByRange subtree
as a separate job, and Spark's RangePartitioner samples its boundaries
per execution (rdd.id-derived seed) — the _pid→offset table from job 1
could then disagree with the _pid assignment in job 2, silently
corrupting bin_id at scale. One plan has ONE range exchange (Catalyst's
ReuseExchange dedupes the two identical subtrees; verified in the
physical plan), so totals and prefixes always see the same partitioning.
It also makes the operator fully deterministic across repeated actions:
the output is a function of the global prefix order alone, and within
any single execution both branches share one boundary sample.

The result is bit-equal to the single-partition window at any partition
count (asserted in tests) while every stage stays parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Label each row with (bin_id, bin_offset) for fixed-``budget`` packing
    in ``order_col`` order.

    ``order_col`` must be unique per row (e.g. the doc id) — packing is a
    total order, ties would make the assignment nondeterministic.
    ``token_col`` must be a non-negative integral column.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        if num_partitions
        else df.repartitionByRange(F.col(order_col))
    )
    # stamp the range-partition id BEFORE any further exchange reads it;
    # rows within a range partition are contiguous in the global order, so
    # (partition offset + within-partition prefix) IS the global prefix
    stamped = ranged.withColumn("_pid", F.spark_partition_id())

    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = stamped.withColumn(
        "_local_excl", F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    )

    # per-partition totals → exclusive running offsets, all in-plan: the
    # orderBy window moves only #partitions rows to one task (bounded
    # metadata, same contract as tier checksums), and keeping it lazy is
    # what guarantees both branches read ONE reused range exchange
    totals = stamped.groupBy("_pid").agg(F.sum(token_col).cast("long").alias("_t"))
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off_df = totals.select(
        "_pid",
        F.coalesce(F.sum("_t").over(wo), F.lit(0)).cast("long").alias("_part_offset"),
    )

    packed = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn("_excl", F.col("_part_offset") + F.col("_local_excl"))
        # integer DIV, not double '/': exact past 2^53 prefix tokens
        .withColumn("bin_id", F.expr(f"_excl DIV {int(budget)}"))
        .withColumn("bin_offset", (F.col("_excl") % F.lit(int(budget))).cast("long"))
        .drop("_pid", "_local_excl", "_part_offset", "_excl")
    )
    return packed
