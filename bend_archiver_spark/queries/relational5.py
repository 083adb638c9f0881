"""Relational surface, part 5: the remaining TPC-H plan shapes the
trimmed schema supports — multi-way join profit rollup (q9), outer-join
count distribution (q13), scalar-max-over-derived-view (q15), double
correlated EXISTS/NOT EXISTS (q21), and anti-join with an exact scalar
average threshold (q22).

The reference delegates all relational evaluation to the source
database (SURVEY §2 Table B: joins/aggregations "None implemented",
source/source.go:18-29); these queries supply that capability surface
Spark-side. q2/q11/q20 need the partsupp table, which the synthetic
schema omits — adapted variants below keep each query's distinctive
plan shape against the available columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import dec_sum, o_dec_sum, register, t


@register(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS supp_nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           {o_dec_sum('l_extendedprice * (1 - l_discount)'
                      ' - l_extendedprice * l_tax', 'profit')}
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("relational", "join"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adaptation (no partsupp/ps_supplycost in the schema): profit
    proxy = discounted revenue minus tax amount, for parts matching a
    name pattern, rolled up by supplier nation and order year. The
    five-way join keeps lineitem-orders as the biggest shuffle;
    nation (constant 25 rows) is hint-broadcast while part/supplier —
    scale-linear — join unhinted (stats elect broadcast small,
    shuffle at 100x)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "l_extendedprice"
    ) * F.col("l_tax")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(dec_sum(profit, "profit"))
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT order_count, CAST(COUNT(*) AS BIGINT) AS cust_count
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS order_count
      FROM customer
      LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) per_cust
    GROUP BY order_count
    """,
    tags=("relational", "join", "outer"),
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of per-customer order counts, where the filter
    (priority, standing in for the comment pattern) lives in the LEFT
    JOIN condition — so filtered-out customers still appear with count
    0 rather than being dropped."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(
        F.count(F.lit(1)).alias("cust_count")
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(38,6))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1998-01-01'
        AND l_shipdate <  DATE '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    tags=("relational", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue — a derived
    aggregate view consumed twice (once for the scalar MAX, once for
    the equality join back). Revenue stays decimal through the MAX
    comparison so equality is exact; cast to double only on output."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        ).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("mx"))
    supp = t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q21_sole_return_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    """,
    tags=("relational", "join", "subquery"),
)
def tpch_q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 adaptation (no commit/receipt dates): suppliers who were the
    *only* supplier with returned items on finished multi-supplier
    orders — the same double-correlated EXISTS / NOT EXISTS self-join
    shape, realized as a semi-join plus an anti-join on the order key
    (both shuffles co-partition on l_orderkey)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = t(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R")
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(
            orders.select("o_orderkey"), l1.l_orderkey == F.col("o_orderkey")
        )
        .join(
            l2,
            (l1.l_orderkey == F.col("ok2"))
            & (l1.l_suppkey != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("ok3"))
            & (l1.l_suppkey != F.col("sk3")),
            "left_anti",
        )
        .join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q22_idle_high_balance",
    oracle="""
    WITH stats AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS bal_sum,
             CAST(COUNT(*) AS BIGINT) AS bal_cnt
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
             AS totacctbal
    FROM customer, stats
    WHERE CAST(c_acctbal AS DECIMAL(38,6)) * bal_cnt > bal_sum
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_mktsegment
    """,
    tags=("relational", "subquery", "join"),
)
def tpch_q22_idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adaptation: above-average-balance customers with no urgent
    orders, grouped by market segment. The average threshold is
    evaluated as ``bal * count > sum`` in exact decimal on both
    engines (a decimal division would round differently); the NOT
    EXISTS is a broadcast anti-join against the filtered orders keys."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    stats = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(38,6)")).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        cust.join(F.broadcast(stats))
        .filter(
            F.col("c_acctbal").cast("decimal(38,6)") * F.col("bal_cnt")
            > F.col("bal_sum")
        )
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )
