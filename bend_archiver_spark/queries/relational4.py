"""Relational surface, part 4: the remaining TPC-H shapes the schema
supports — bilateral nation trade (q7), market share (q8), and the
correlated-average small-quantity query (q17, re-expressed with a
window instead of a per-row subquery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import dec_sum, o_dec_sum, register, t


@register(
    "tpch_q7_nation_trade",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
           {o_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    tags=("relational", "join"),
)
def tpch_q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between distinct supplier/customer
    nations per ship year — a five-way join with the nation dimension
    joined twice under different roles. Only the constant-cardinality
    nation roles are hint-broadcast; customer/supplier are
    corpus-proportional and join unhinted (stats elect small-scale
    broadcast, shuffle at 100x)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    ns = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("s_nkey") != F.col("c_nkey"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH region_sales AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
             ns.n_name AS supp_nation,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(38,6))) AS rev_dec
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation nc ON nc.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = nc.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ns ON ns.n_nationkey = s_nationkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1, 2
    )
    SELECT order_year, supp_nation,
           CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(rev_dec) OVER (PARTITION BY order_year)
                         AS VARCHAR) AS DOUBLE)
             AS market_share
    FROM region_sales
    """,
    tags=("relational", "join", "window"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 adaptation: each supplier nation's share of revenue into
    EUROPE-region customers per order year — aggregate then a window
    ratio over the year partition. The decimal-exact revenue makes the
    share division deterministic. Customer/supplier join unhinted
    (corpus-proportional); nation/region keep explicit broadcasts."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nc = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    ns = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            "supp_nation",
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("rev_dec")
        )
    )
    # the share denominator stays decimal through the window sum —
    # float window sums are partition-order-dependent across engines
    w = Window.partitionBy("order_year")
    return sales.select(
        "order_year",
        "supp_nation",
        F.col("rev_dec").cast("double").alias("revenue"),
        (
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double")
        ).alias("market_share"),
    )


@register(
    "tpch_q17_small_quantity",
    oracle=f"""
    WITH flagged AS (
      SELECT l_partkey, l_quantity, l_extendedprice,
             AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
      FROM lineitem
    )
    SELECT COUNT(*) AS n_small_lines,
           {o_dec_sum('l_extendedprice', 'small_qty_revenue')}
    FROM flagged f
    JOIN part ON p_partkey = f.l_partkey
    WHERE p_brand = 'Brand#2' AND f.l_quantity < 0.5 * f.avg_qty
    """,
    tags=("relational", "window", "subquery"),
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 adaptation: lines whose quantity is below half the
    per-part average — the classic correlated scalar subquery,
    re-expressed as a window average (one pass, no per-row subquery
    re-execution; the decorrelation Catalyst would otherwise have to
    perform is done structurally). AVG over int-valued doubles is a
    sum of exact values / count — deterministic in both engines."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    w = Window.partitionBy("l_partkey")
    flagged = li.select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.avg("l_quantity").over(w).alias("avg_qty"),
    )
    return (
        flagged.join(part, flagged.l_partkey == part.p_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            dec_sum(F.col("l_extendedprice"), "small_qty_revenue"),
        )
    )
