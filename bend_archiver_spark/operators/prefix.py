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

__all__ = ["prefix_sum", "prefix_max", "ntile_distributed", "grouped_rank"]


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


def prefix_max(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "run_max",
    exclusive: bool = False,
) -> DataFrame:
    """Add ``out_col`` = running maximum of ``value_col`` in the total
    order defined by ``order_cols`` — the two-phase scan shape of
    :func:`prefix_sum` with max as the (commutative, idempotent)
    combiner. ``exclusive=True`` gives the ``ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING`` frame (NULL for the global first row),
    the dominance test a skyline needs. ``order_cols`` must be a
    unique key for determinism, same contract as prefix_sum."""
    frame_hi = -1 if exclusive else 0
    ranged = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, frame_hi)
    )
    local = ranged.withColumn("_local_m", F.max(value_col).over(w_in))
    per_part = ranged.groupBy("_pid").agg(
        F.max(value_col).alias("_part_max")
    )
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_part.select(
        "_pid", F.max("_part_max").over(w_off).alias("_prior_m")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        # greatest() skips NULLs (first partition has no prior max;
        # each partition's first row has no local exclusive max) and
        # returns NULL only when both are — exactly the exclusive
        # frame's semantics for the global first row
        .withColumn(out_col, F.greatest("_local_m", "_prior_m"))
        .drop("_pid", "_local_m", "_prior_m")
    )


def ntile_distributed(
    df: DataFrame,
    order_cols: Sequence[str],
    k: int,
    out_col: str = "tile",
) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY order_cols)`` without the
    SinglePartition window: global rank comes from ``prefix_sum`` of
    ones over the total order (``order_cols`` must be a unique key),
    and the bucket is the ANSI ntile formula applied to (rank, n) —
    the first ``n % k`` buckets get ``n div k + 1`` rows, the rest
    ``n div k``. All arithmetic is int64 DIV/%, so the result is
    bit-identical to the window ntile at any partitioning. Cost: one
    range exchange (the sort a window ntile needs anyway, but spread
    over all partitions) plus a 1-row count broadcast."""
    ranked = (
        prefix_sum(
            df.withColumn("_one", F.lit(1)),
            order_cols,
            "_one",
            out_col="_rank",
            precision="decimal(38,0)",
        )
        .withColumn("_rank", F.col("_rank").cast("bigint"))
        .drop("_one")
    )
    # n = max rank, read from the ALREADY-CHECKPOINTED ranked frame —
    # a separate df.agg(count) would re-execute the whole upstream
    # lineage (chained ntile calls would each pay a full extra pass)
    n = ranked.agg(F.max("_rank").cast("bigint").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn("_base", F.expr(f"_n DIV {int(k)}"))
        .withColumn("_rem", F.expr(f"_n % {int(k)}"))
        .withColumn("_cut", F.col("_rem") * (F.col("_base") + 1))
        .withColumn(
            out_col,
            F.when(
                F.col("_rank") <= F.col("_cut"),
                # ceil(rank / (base+1)) in exact int64 arithmetic
                F.expr("(_rank + _base) DIV (_base + 1)"),
            )
            .otherwise(
                # rem + ceil((rank-cut) / base); greatest() keeps the
                # never-taken base=0 branch free of division by zero
                F.col("_rem")
                + F.expr("(_rank - _cut + _base - 1) DIV greatest(_base, 1)")
            )
            .cast("bigint"),
        )
        .drop("_n", "_base", "_rem", "_cut", "_rank")
    )


def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    out_col: str = "rank",
) -> DataFrame:
    """Within-group rank 1..n_g over the (group, *order_cols) total
    order WITHOUT per-group windows (groups can be corpus-
    proportional — a window would sort each group in one task): ONE
    global prefix-sum rank over (group_col, *order_cols), minus each
    group's broadcast start offset (exclusive running count over the
    |groups|-row table). Bit-identical to the per-group window form.

    Caller contract: filter NULL group keys first when any
    cross-group artifact (a group index, an interleave position)
    enters the output — Spark orders ASC NULLS FIRST while DuckDB
    defaults NULLS LAST, so a NULL group would shift every other
    group's cross-engine index. Pure within-group ranks are safe
    either way (each group's ranks are internally consistent)."""
    ranked = prefix_sum(
        df.withColumn("_one", F.lit(1)),
        [group_col, *order_cols],
        "_one",
        out_col="_grk",
        precision="decimal(38,0)",
    ).withColumn("_grk", F.col("_grk").cast("bigint")).drop("_one")
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt")
    )
    w_off = Window.orderBy(group_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        group_col,
        F.coalesce(
            F.sum("_cnt").over(w_off), F.lit(0).cast("bigint")
        ).alias("_goff"),
    )
    return (
        ranked.join(F.broadcast(offsets), group_col)
        .withColumn(out_col, F.col("_grk") - F.col("_goff"))
        .drop("_grk", "_goff")
    )
