"""Relational surface, part 8: the last three TPC-H plan shapes —
q2 (correlated-min supplier selection), q11 (scalar-fraction HAVING
over a grouped value rollup), q20 (nested IN subqueries feeding a
semi-join) — adapted to the trimmed schema, which omits ``partsupp``
(see relational5.py). The supply relation is derived from lineitem:
``unit cost(part, supplier) = MIN(l_extendedprice / l_quantity)``,
which keeps every distinctive feature of the originals (correlated
aggregate, threshold vs a global scalar, quantity-vs-half-of-shipped
comparison) on the available columns.

The reference delegates all relational evaluation to the source
database (SURVEY §2 Table B, source/source.go:18-29); with these
three, all 22 TPC-H query shapes are covered Spark-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t

# IEEE division and MIN over identical input sets are bit-stable
# across engines, so the min-cost equality join needs no quantization.
_Q2_ORACLE = """
WITH esupp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
),
cost AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  GROUP BY 1, 2
),
scoped AS (
  SELECT c.partkey, c.unit_cost, e.s_name, e.s_acctbal, e.n_name,
         MIN(c.unit_cost) OVER (PARTITION BY c.partkey) AS min_cost
  FROM cost c JOIN esupp e ON e.s_suppkey = c.suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       unit_cost AS supply_cost
FROM scoped
JOIN part ON p_partkey = partkey
WHERE unit_cost = min_cost AND p_size <= 15 AND p_type = 'ECONOMY'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register(
    "tpch_q2_min_cost_supplier",
    oracle=_Q2_ORACLE,
    tags=("relational", "subquery", "join"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 adaptation (no partsupp): for small ECONOMY parts, the
    cheapest EUROPE supplier, where unit cost is derived from shipped
    lineitems. The correlated-min subquery becomes a partition-window
    MIN over the part key — co-partitioned with the grouped cost
    relation, so the correlation adds one shuffle on l_partkey and no
    self-join. Nation/region (constant) are hint-broadcast; the
    in-region supplier projection and filtered parts are scale-linear
    and join unhinted; the final order is a global top-100
    (TakeOrderedAndProject)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY")
    )
    esupp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_cost"
        )
    )
    # region scoping BEFORE the min: the correlated aggregate ranges
    # over in-region suppliers only (as in the original q2)
    scoped = cost.join(
        esupp, F.col("suppkey") == F.col("s_suppkey")
    ).withColumn(
        "min_cost", F.min("unit_cost").over(Window.partitionBy("partkey"))
    )
    return (
        scoped.filter(F.col("unit_cost") == F.col("min_cost"))
        .join(part, F.col("partkey") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("unit_cost").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# The share threshold is scale-invariant — "more than twice the
# average part's value" — and evaluated as ``value * cnt > 2 * total``
# in exact decimal/integer arithmetic: a fixed fraction of the total
# (the original q11's 0.0001) degenerates as the part count grows, and
# a decimal division would round differently per engine.
_Q11_ORACLE = """
WITH nat_value AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(38,6))) AS value_dec
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
),
total AS (SELECT SUM(value_dec) AS total_dec,
                 CAST(COUNT(*) AS BIGINT) AS n_parts
          FROM nat_value)
SELECT partkey, CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) AS part_value
FROM nat_value, total
WHERE value_dec * n_parts > total_dec * 2
"""


@register(
    "tpch_q11_important_parts",
    oracle=_Q11_ORACLE,
    tags=("relational", "subquery"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 adaptation (no partsupp/availqty): parts whose shipped value
    from NATION_3's suppliers exceeds twice the nation's average part
    value — the grouped-rollup-vs-global-scalar HAVING shape. The
    scalar (total, count) is a second aggregate over the *same*
    grouped relation (Catalyst reuses the exchange), broadcast back as
    a one-row join; the threshold comparison stays in exact
    decimal/integer arithmetic on both engines."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    nat_value = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(38,6)")
            ).alias("value_dec")
        )
    )
    total = nat_value.agg(
        F.sum("value_dec").alias("total_dec"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        nat_value.join(F.broadcast(total))
        .filter(F.col("value_dec") * F.col("n_parts") > F.col("total_dec") * 2)
        .select(
            "partkey", F.col("value_dec").cast("double").alias("part_value")
        )
    )


# qty_99 * 2 > total_qty: "more than half of this part's shipments in
# 1999" — exact decimal on both sides, no division.
_Q20_ORACLE = """
WITH shipped AS (
  SELECT l_suppkey AS suppkey,
         l_partkey AS partkey,
         SUM(CAST(l_quantity AS DECIMAL(38,6))) AS total_qty,
         SUM(CASE WHEN l_shipdate >= DATE '1999-01-01'
                   AND l_shipdate <  DATE '2000-01-01'
                  THEN CAST(l_quantity AS DECIMAL(38,6))
                  ELSE CAST(0 AS DECIMAL(38,6)) END) AS qty_99
  FROM lineitem
  WHERE l_partkey IN
        (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_regionkey = 0
  AND s_suppkey IN
      (SELECT suppkey FROM shipped WHERE qty_99 * 2 > total_qty)
ORDER BY s_name
"""


@register(
    "tpch_q20_excess_suppliers",
    oracle=_Q20_ORACLE,
    tags=("relational", "subquery", "join"),
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 adaptation (no partsupp/availqty): region-0 suppliers who
    shipped more than half of some widget part's total quantity during
    1999 — the nested IN-subquery shape (name-patterned parts feed the
    per-(supplier, part) rollup; the qualifying supplier keys feed a
    semi-join into the supplier dim). Both INs become semi-joins with
    no forced broadcast (the part/supplier subsets are scale-linear;
    stats/AQE elect broadcast while they fit); the quantity comparison
    is a conditional aggregate against its own group total, in exact
    decimal."""
    li = t(spark, sf_dir, "lineitem")
    widget_parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    dq = F.col("l_quantity").cast("decimal(38,6)")
    in_99 = (
        F.col("l_shipdate") >= F.lit("1999-01-01").cast("date")
    ) & (F.col("l_shipdate") < F.lit("2000-01-01").cast("date"))
    shipped = (
        li.join(
            widget_parts,
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            F.sum(dq).alias("total_qty"),
            F.sum(
                F.when(in_99, dq).otherwise(F.lit(0).cast("decimal(38,6)"))
            ).alias("qty_99"),
        )
    )
    excess = (
        shipped.filter(F.col("qty_99") * 2 > F.col("total_qty"))
        .select("suppkey")
        .distinct()
    )
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    return (
        supp.join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .join(
            excess,
            supp.s_suppkey == F.col("suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "window_first_last_orders",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderdate) OVER w AS first_order_date,
           last_value(o_orderdate) OVER w_full AS latest_order_date,
           nth_value(o_totalprice, 2) OVER w_full AS second_order_price,
           CAST(row_number() OVER w AS BIGINT) AS order_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
    """,
    tags=("relational", "window"),
)
def window_first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value window frames over each
    customer's order history: first and latest order dates, the
    second order's price (NULL for single-order customers), and the
    per-customer sequence number. last_value/nth_value take an
    explicit unbounded frame — with the default frame (unbounded
    preceding .. current row, same in both engines) last_value is just
    the current row, the classic window-frame trap. One shuffle on
    o_custkey shared by both frames."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(w_full).alias("latest_order_date"),
        F.nth_value("o_totalprice", 2).over(w_full).alias(
            "second_order_price"
        ),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )
