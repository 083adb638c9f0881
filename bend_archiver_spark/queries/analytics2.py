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


@register(
    "agg_exact_weighted_median",
    oracle="""
    WITH r AS (
      SELECT l_extendedprice AS v,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM lineitem),
    w AS (SELECT SUM(CAST(l_quantity AS BIGINT)) AS tw FROM lineitem)
    SELECT CAST(w.tw AS BIGINT) AS total_weight,
           CAST((w.tw + 1) // 2 AS BIGINT) AS median_rank,
           v AS median_price
    FROM r, w WHERE c >= (w.tw + 1) // 2
    ORDER BY c LIMIT 1
    """,
    tags=("agg", "order-statistics", "distributed"),
)
def agg_exact_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median line price — the smallest price
    whose cumulative quantity reaches half the total. Same
    distributed prefix-sum rank as ``agg_exact_median_distributed``
    but summing integer weights instead of 1s, showing the machinery
    generalizes to any exact weighted quantile: the oracle's
    single-partition running sum is replaced by the range-partitioned
    two-phase scan, and the boundary row (min cumulative weight >=
    threshold — unique because weights are >= 1) is one filter plus a
    heap top-1."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    ranked = prefix_sum(
        li, ["v", "l_orderkey", "l_linenumber"], "wt", out_col="c"
    )
    w = li.agg(F.sum("wt").alias("tw"))
    return (
        ranked.crossJoin(w)
        .filter(F.col("c") >= F.expr("(tw + 1) div 2"))
        .orderBy(F.asc("c"))
        .limit(1)
        .select(
            F.col("tw").cast("bigint").alias("total_weight"),
            F.expr("(tw + 1) div 2").cast("bigint").alias("median_rank"),
            F.col("v").alias("median_price"),
        )
    )


_BASKET_MIN_SUPPORT = 3


@register(
    "orders_basket_affinity",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pc AS (
      SELECT l_partkey, COUNT(*) AS n FROM li GROUP BY l_partkey),
    tot AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2),
    sup AS (SELECT * FROM pairs WHERE n_ab >= {_BASKET_MIN_SUPPORT})
    SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
           (CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE))
             / (CAST(pa.n AS DOUBLE) * CAST(pb.n AS DOUBLE)) AS lift
    FROM sup
    JOIN pc pa ON pa.l_partkey = part_a
    JOIN pc pb ON pb.l_partkey = part_b
    CROSS JOIN tot
    """,
    tags=("join", "analytics", "cooccurrence"),
)
def orders_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket part affinity: co-occurrence count and lift
    (P(a,b) / P(a)P(b)) for part pairs appearing together in >= 3
    orders — the association signal behind recommenders and
    frequently-bought-together. Pair enumeration is the ORDER-key
    self-join, so cost is bounded by the square of the basket size
    (~4 items here), never by the catalog; the per-part order counts
    (catalog-bounded) and the 1-row order total broadcast into the
    scoring join. All counts are exact int64 below 2^53, so the lift
    double is a single correctly-rounded division on both engines."""
    # persist the distinct (order, part) pair stream: it feeds FIVE
    # consumers (per-part counts via both join sides, the order total,
    # and both sides of the pair self-join), and without the barrier
    # each one re-runs the full lineitem scan + distinct shuffle —
    # measured 5 unbounded lineitem scans; with it, ONE. The cache is
    # two int columns, no bigger than the distinct shuffle already
    # materialized on disk (same trade as the MinHash signature-stream
    # barrier). Callers clear cache between queries.
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist()
    )
    # per-part counts are catalog-bounded and consumed twice (pa/pb)
    pc = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).persist()
    tot = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _BASKET_MIN_SUPPORT)
    )
    pa = pc.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na"))
    pb = pc.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb"))
    lift = (
        F.col("n_ab").cast("double") * F.col("n_orders").cast("double")
    ) / (F.col("na").cast("double") * F.col("nb").cast("double"))
    return (
        # pa/pb are part-catalog-sized (scale-linear) — no hint;
        # stats elect broadcast small, shuffle join at 100x
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(tot)
        .select(
            "part_a", "part_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            lift.alias("lift"),
        )
    )
