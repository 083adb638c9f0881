"""Skew-mitigation utilities.

AQE's skew-join handles post-shuffle skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); explicit
salting remains the tool when one join key dominates so heavily that
even split partitions bottleneck — the classic hot-user / hot-null
problem in 100 TB fact-fact joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_topk"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the (large, skewed) left side gets a
    random salt in [0, salt_buckets); the (smaller) right side is
    replicated once per salt value. The hot key's rows spread over
    ``salt_buckets`` tasks instead of one.

    The salt is derived from a hash of the full left row (xxhash64 of
    all columns) rather than rand() so the plan stays deterministic
    and re-executable (task retries see the same salt).
    """
    salt = (F.abs(F.xxhash64(*left.columns)) % salt_buckets).alias("__salt")
    salted_left = left.withColumn("__salt", salt)
    replicated_right = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")


def salted_topk(
    df: DataFrame,
    part_col: str,
    order_by: list[Column],
    k: int,
    salt_expr: Column,
    salt_buckets: int = 16,
    rank_alias: str = "rank",
) -> DataFrame:
    """Two-phase per-group top-k that never sorts a whole skewed group
    in one task.

    Phase 1 ranks within ``(part_col, salt)`` — ``salt_buckets``
    deterministic sub-groups — and keeps ``rank <= k`` per sub-group,
    so the largest task sorts ~1/salt_buckets of the hottest group.
    Phase 2 computes the exact rank over the survivors, at most
    ``k * salt_buckets`` rows per group. Exactness argument: any row in
    a group's true top-k has fewer than k rows ahead of it in the whole
    group, hence fewer than k ahead of it within its own salt bucket,
    so it survives phase 1; phase-2 ranks of the kept rows therefore
    equal their full-group ranks. ``order_by`` must be a total order
    (include a unique tie-break column) or row_number is
    nondeterministic in both phases.

    ``salt_expr`` must be deterministic (hash of a unique column, not
    rand()) so task retries re-derive identical salts. WindowExec sorts
    the full partition — there is no per-group heap — which is exactly
    why the single-window form breaks down when one key dominates at
    100 TB; this shape bounds every sort and is a drop-in replacement
    with an unchanged oracle.
    """
    pre_w = Window.partitionBy(part_col, "__salt").orderBy(*order_by)
    survivors = (
        df.withColumn("__salt", F.pmod(salt_expr, F.lit(salt_buckets)))
        .withColumn("__prerank", F.row_number().over(pre_w))
        .filter(F.col("__prerank") <= k)
        .drop("__prerank")
    )
    final_w = Window.partitionBy(part_col).orderBy(*order_by)
    return (
        survivors.withColumn(
            rank_alias, F.row_number().over(final_w).cast("bigint")
        )
        .filter(F.col(rank_alias) <= k)
        .drop("__salt")
    )
