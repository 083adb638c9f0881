"""Relational surface, part 6: ranking-window metrics and
unpivot/melt.

Fills two checklist gaps: the distribution-oriented window functions
(percent_rank / cume_dist / ntile — the quantile-bucketing family
used for per-group score normalization in data curation) and the
wide-to-long reshape (``DataFrame.unpivot``), which is the standard
way to turn per-column metrics into a metric dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import dec_sum, o_dec_sum, register, t

# Two windows, deliberately distinct:
# - the *peer* window orders by a low-cardinality key only, so rank /
#   percent_rank / cume_dist see real peer groups (tied rows);
# - the *total* window adds the unique key, because ntile and
#   row_number assign by position — under ties their output would be
#   partitioning-dependent, so they must see a total order.
_RANK_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority,
       CAST(rank() OVER peer AS BIGINT) AS rnk,
       CAST(dense_rank() OVER peer AS BIGINT) AS drnk,
       percent_rank() OVER peer AS pct_rank,
       cume_dist() OVER peer AS cdist,
       CAST(ntile(8) OVER total AS BIGINT) AS tile8,
       CAST(row_number() OVER total AS BIGINT) AS rn
FROM orders
WINDOW peer AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority),
       total AS (PARTITION BY o_orderstatus
                 ORDER BY o_orderpriority, o_orderkey)
"""


@register(
    "window_rank_metrics",
    oracle=_RANK_ORACLE,
    tags=("window", "rank"),
)
def window_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/distribution window family over orders: rank and
    dense_rank (peer-aware), percent_rank ((rank-1)/(n-1)) and
    cume_dist (exact IEEE divisions — bit-stable cross-engine), plus
    ntile(8) quantile bucketing and row_number over a total order.
    One shuffle on o_orderstatus serves all six functions."""
    o = t(spark, sf_dir, "orders")
    peer = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    total = Window.partitionBy("o_orderstatus").orderBy(
        "o_orderpriority", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.rank().over(peer).cast("bigint").alias("rnk"),
        F.dense_rank().over(peer).cast("bigint").alias("drnk"),
        F.percent_rank().over(peer).alias("pct_rank"),
        F.cume_dist().over(peer).alias("cdist"),
        F.ntile(8).over(total).cast("bigint").alias("tile8"),
        F.row_number().over(total).cast("bigint").alias("rn"),
    )


_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_UNPIVOT_ORACLE = (
    "WITH m AS (\n"
    + "\n  UNION ALL ".join(
        f"SELECT '{c}' AS metric, {c} AS value FROM lineitem"
        for c in _MEASURES
    )
    + f"""
)
SELECT metric,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       {o_dec_sum("value", "total")}
FROM m GROUP BY metric
"""
)


@register(
    "unpivot_lineitem_metrics",
    oracle=_UNPIVOT_ORACLE,
    tags=("reshape", "unpivot"),
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape: melt the four lineitem measure columns
    into (metric, value) rows with ``DataFrame.unpivot`` (Spark's
    native melt — a zero-shuffle generator, each input row expands
    in place), then aggregate per metric with an order-independent
    decimal sum. The inverse of pivot_status_by_segment."""
    li = t(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=list(_MEASURES),
        variableColumnName="metric",
        valueColumnName="value",
    )
    return melted.groupBy("metric").agg(
        F.count("*").cast("bigint").alias("n_values"),
        dec_sum(F.col("value"), "total"),
    )
