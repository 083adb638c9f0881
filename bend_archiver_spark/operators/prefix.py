"""Distributed ordered prefix sum.

A global cumulative sum is the one window shape Spark does NOT
distribute: ``Window.orderBy(...)`` with no ``partitionBy`` moves the
whole input through a SinglePartition exchange — fine at test scale,
a one-core bottleneck at 100 TB. This operator is the classic
two-phase scan instead:

1. ``repartitionByRange`` on the ordering key — partitions now hold
   contiguous, globally ordered key ranges;
2. an in-partition cumulative sum (window partitioned by the physical
   partition id — every window group is exactly one partition's
   contiguous range);
3. per-partition totals (one tiny row per partition) turned into
   exclusive offsets with a driver-size window, broadcast-joined back.

The result is bit-identical to the single-partition plan (sums are
exact decimal), but every phase is parallel and the only global data
movement is the range exchange the sort needed anyway.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["prefix_sum"]


def prefix_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "c",
    precision: str = "decimal(38,0)",
) -> DataFrame:
    """Add ``out_col`` = inclusive running total of ``value_col`` in
    the total order defined by ``order_cols`` (which must be a unique
    key for the order — and therefore the result — to be
    deterministic). The sum is carried in ``precision`` decimals;
    cast downstream if a narrower type is wanted."""
    # Both the local-cumsum branch and the offsets branch below read
    # this frame; ``_pid`` must be IDENTICAL in both. localCheckpoint
    # materializes the range exchange once, so the two consumers can
    # never re-sample range boundaries independently (exchange reuse
    # is an optimizer courtesy, not a guarantee — without this, plan
    # divergence could land boundary rows in different partitions per
    # branch and mis-join the offsets).
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "_local_c", F.sum(F.col(value_col).cast(precision)).over(w_in)
    )
    per_part = local.groupBy("_pid").agg(
        F.sum(F.col(value_col).cast(precision)).alias("_part_total")
    )
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_part.select(
        "_pid",
        F.coalesce(
            F.sum("_part_total").over(w_off), F.lit(0).cast(precision)
        ).alias("_offset"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_c") + F.col("_offset"))
        .drop("_pid", "_local_c", "_offset")
    )
