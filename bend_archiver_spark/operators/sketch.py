"""Count-min sketch over a key column — broadcastable approximate
frequencies for heavy-key gating.

The sketch is a depth x width counter grid: row j counts keys bucketed
by ``xxhash64(key, j) % width``; the estimate for a key is the MIN of
its depth counters. Estimates never undercount (every counter a key
touches includes all of that key's rows, plus collisions), which is
the property gating logic relies on: "estimate <= k" PROVES the true
count is <= k, so a heavy key can never be misrouted to a light path.

Scale: building the sketch is one map-side-combinable groupBy over
(j, bucket) — depth*width cells (tiny, broadcastable) regardless of
key cardinality. This is the standard pre-pass for skew handling when
exact per-key counts would themselves be a shuffle over billions of
distinct keys. Deterministic (hash-derived, no sampling): results are
reproducible across runs and engines given the same hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .skew import salted_topk

__all__ = ["count_min", "estimate_counts", "sketch_gated_topk"]


def _bucket_pairs(key, depth: int, width: int):
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.pmod(F.xxhash64(key, F.lit(j)), F.lit(width)).alias(
                        "b"
                    ),
                )
                for j in range(depth)
            ]
        )
    )


def count_min(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 4096
) -> DataFrame:
    """(j, b, c): the sketch's non-zero counters. One combinable
    groupBy; at most depth*width rows out."""
    pairs = df.select(_bucket_pairs(F.col(key_col), depth, width).alias("p"))
    return pairs.groupBy(
        F.col("p.j").alias("j"), F.col("p.b").alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))


def estimate_counts(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
    alias: str = "est",
) -> DataFrame:
    """(key, est): per-key upper-bound count = MIN over the key's
    depth counters. ``sketch`` broadcasts (<= depth*width rows); keys
    present in the sketch's source always hit existing counters."""
    probes = keys.select(
        key_col, _bucket_pairs(F.col(key_col), depth, width).alias("p")
    ).select(key_col, F.col("p.j").alias("j"), F.col("p.b").alias("b"))
    return (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy(key_col)
        .agg(F.min("c").alias(alias))
    )


def sketch_gated_topk(
    df: DataFrame,
    part_col: str,
    order_by: list[Column],
    k: int,
    salt_expr: Column,
    rank_alias: str = "rank",
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Per-key top-k where a count-min sketch routes keys: keys the
    sketch PROVES hold <= k rows (estimates never undercount) rank in
    a plain window whose groups are <= k rows by construction, while
    only possibly-heavy keys pay the two-phase salted top-k
    (skew.salted_topk). Output is row-identical to a single exact
    window — the sketch changes the route, never the result. At scale
    with millions of mostly-tiny keys this keeps the skew machinery
    off the long tail without an exact count shuffle."""
    sk = count_min(df, part_col, depth=depth, width=width)
    # persist the per-key estimate table (|keys| rows): it is
    # broadcast into the routing join, and the routing join's output
    # feeds BOTH the light and heavy routes — without the barrier each
    # route re-runs the sketch build and the distinct-keys pass,
    # measured 6 input scans for what needs 4 (sketch, keys, one scan
    # per route). Callers clear cache between queries.
    est = estimate_counts(
        df.select(part_col).distinct(), sk, part_col,
        depth=depth, width=width,
    ).persist()
    flagged = df.join(F.broadcast(est), part_col)
    light_w = Window.partitionBy(part_col).orderBy(*order_by)
    light = flagged.filter(F.col("est") <= k).withColumn(
        rank_alias, F.row_number().over(light_w).cast("bigint")
    )
    heavy = salted_topk(
        flagged.filter(F.col("est") > k),
        part_col,
        order_by,
        k,
        salt_expr=salt_expr,
        rank_alias=rank_alias,
    )
    return light.unionByName(heavy).drop("est")
