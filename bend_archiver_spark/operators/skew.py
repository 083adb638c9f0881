"""Skew-mitigation utilities.

AQE's skew-join handles post-shuffle skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); explicit
salting remains the tool when one join key dominates so heavily that
even split partitions bottleneck — the classic hot-user / hot-null
problem in 100 TB fact-fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


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
