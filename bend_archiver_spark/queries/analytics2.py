"""Distributed order statistics + cohort analytics.

``agg_exact_median_distributed`` computes an EXACT global median
without the single-partition sort every naive formulation hides: the
global rank comes from ``operators.prefix.prefix_sum`` (range
exchange -> per-partition scan -> broadcast offsets), so the median
is located with the same data movement a distributed sort needs
anyway, and no task ever sees more than its range slice. The lower
median (rank ⌈n/2⌉ in the (value, key) total order) is used so the
answer is a real data row — deterministic and interpolation-free on
both engines.

``events_cohort_retention`` is the classic cohort-retention matrix
(users grouped by first-activity week x weeks-since-cohort), the
growth-analytics query every events warehouse runs; its shuffles are
all user-key-combinable aggregations plus one co-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.prefix import prefix_sum
from .base import register, t


@register(
    "agg_exact_median_distributed",
    oracle="""
    WITH ranked AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS r
      FROM orders),
    n AS (SELECT COUNT(*) AS n FROM orders)
    SELECT CAST(n.n AS BIGINT) AS n_rows,
           CAST((n.n + 1) // 2 AS BIGINT) AS median_rank,
           o_totalprice AS median_price
    FROM ranked, n WHERE r = (n.n + 1) // 2
    """,
    tags=("agg", "order-statistics", "distributed"),
)
def agg_exact_median_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact global median order price — the order statistic
    ``approx_percentile`` approximates — computed scalably: the
    global rank of every row is a distributed prefix count over the
    (price, orderkey) total order (``operators/prefix.py``: range
    exchange + per-partition scan + broadcast offsets; the oracle's
    ``row_number() OVER (ORDER BY ...)`` is the single-partition
    shape this replaces), then one filter picks rank ⌈n/2⌉. The
    orderkey tie-break makes the total order — and therefore the
    selected row — unique on both engines."""
    o = t(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey", F.lit(1).alias("one")
    )
    ranked = prefix_sum(
        o, ["o_totalprice", "o_orderkey"], "one", out_col="r"
    )
    n = o.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(n)
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select(
            F.col("n").cast("bigint").alias("n_rows"),
            F.expr("(n + 1) div 2").cast("bigint").alias("median_rank"),
            F.col("o_totalprice").alias("median_price"),
        )
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH uf AS (
      SELECT user_id,
             MIN(date_trunc('week', ts)::DATE) AS cohort_week
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week
      FROM events)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST((week - cohort_week) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN uf USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("sessions", "analytics", "retention"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week
    (their cohort), counted in every (cohort, weeks-since-cohort)
    cell they were active in — the table behind every retention
    curve. Shuffle shape: a combinable per-user MIN, a combinable
    (user, week) distinct, one user-key equi-join (co-partitioned
    with the aggregations that produced both sides), and a final
    |weeks|^2-bounded rollup. Week arithmetic stays in whole days
    (date_trunc week -> datediff div 7) — no timezone or DST
    float math to diverge on."""
    ev = t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    uf = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    act = ev.select("user_id", week.alias("week")).distinct()
    return (
        act.join(uf, "user_id")
        .groupBy(
            # dates cross the compare harness as strings (repo-wide
            # convention: pandas turns DuckDB DATEs into Timestamps)
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("datediff(week, cohort_week) div 7")
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )
