"""Relational surface, part 2: more TPC-H-style queries and the
remaining operator-checklist categories — cube/grouping sets,
lag/lead windows, statistical aggregates (decimal-exact formulas),
sorted collect, IN/EXISTS subqueries, scalar subqueries, range joins.

Statistical aggregates note: built-in ``var_samp``/``stddev``/``corr``
are single-pass float accumulations whose partial ordering differs
between engines — not hash-matchable. They are re-expressed here with
the textbook sum-of-squares formulas over exact decimal sums, which
both engines evaluate identically (same caveat pattern as
queries/base.py dec_sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import dec_sum, o_dec_sum, register, t


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("relational", "join", "subquery"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: EXISTS-correlated subquery -> left-semi join + aggregate."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q10_returned_topk",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {o_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "topk"),
)
def tpch_q10_returned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returned-item revenue ranking — fact-fact join, nation
    broadcast (constant 25 rows), customer unhinted (scale-linear:
    stats elect broadcast small, shuffle at 100x), deterministic
    top-20."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("relational", "agg"),
)
def tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 adaptation: conditional-count aggregation over a join
    (CASE inside COUNT — map-side combinable)."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_ratio",
    oracle=f"""
    SELECT
      CAST(CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%%'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END
               AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
        AS promo_ratio,
      {o_dec_sum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-08-01 00:00:00'
    """,
    tags=("relational", "agg", "join"),
)
def tpch_q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promotion-revenue share — conditional decimal sums and a
    final ratio computed once (deterministic double division)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-08-01 00:00:00").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(promo_rev.cast("decimal(38,6)")).cast("double")
                / F.sum(rev.cast("decimal(38,6)")).cast("double")
            ).alias("promo_ratio"),
            dec_sum(rev, "total_revenue"),
        )
    )


@register(
    "tpch_q16_part_suppliers",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("relational", "agg", "join"),
)
def tpch_q16_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 adaptation: COUNT(DISTINCT) per group after a dimension
    filter with negation and IN-list."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 10, 15, 20))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           {o_dec_sum('l_quantity', 'total_qty')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("relational", "join", "subquery"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: HAVING-filtered subquery feeding an IN (semi join) over a
    three-way join — the classic large-order report. Customer joins
    without a hint: corpus-proportional, so forced broadcast would
    fail at 100x; stats/AQE pick the strategy per scale."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(dec_sum(F.col("l_quantity"), "total_qty"))
    )


@register(
    "tpch_q19_disjunctive",
    oracle=f"""
    SELECT {o_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("relational", "join"),
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-conjunctions join predicate (discount-revenue for
    three brand/size/quantity classes) — exercises disjunctive filter
    pushdown through a join."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(5, 20)
        & F.col("l_quantity").between(10, 30)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(20, 40)
    )
    return j.filter(c1 | c2 | c3).agg(
        dec_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "cube_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {o_dec_sum('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("relational", "agg"),
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum(F.col("l_extendedprice"), "sum_price"),
    )


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("relational", "agg"),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (the DataFrame API has no
    direct grouping-sets call — SQL is the idiomatic route)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "window_lag_lead_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           strftime(LAG(o_orderdate) OVER w, '%Y-%m-%d') AS prev_order_day,
           strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d') AS next_order_day,
           date_diff('day',
                     LAG(o_orderdate) OVER w,
                     o_orderdate) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("relational", "window"),
)
def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over a per-customer order timeline + inter-order gap —
    the reorder-interval analysis pattern."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = t(spark, sf_dir, "orders")
    prev = F.lag("o_orderdate").over(w)
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.date_format(prev, "yyyy-MM-dd").alias("prev_order_day"),
        F.date_format(nxt, "yyyy-MM-dd").alias("next_order_day"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).cast("bigint").alias(
            "days_since_prev"
        ),
    )


@register(
    "agg_stats_manual",
    oracle="""
    WITH s AS (
      SELECT c_mktsegment,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxx
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n,
           round(sx / n, 4) AS mean_bal,
           round((sxx - sx * sx / n) / (n - 1), 4) AS var_bal,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS std_bal
    FROM s
    """,
    tags=("relational", "agg", "stats"),
)
def agg_stats_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev via exact decimal sum-of-squares — the
    deterministic re-expression of var_samp/stddev (whose single-pass
    float accumulation is partition-order-dependent and so not
    cross-engine comparable).

    The DECIMAL sums are bit-identical across engines, but casting a
    wide decimal (sum-of-squares ~1e11 at sf0.1) to double differs by
    1 ulp between Java BigDecimal and DuckDB's int128 scaling — ulp at
    that magnitude is ~1.5e-5, i.e. ~5e-9 on the variance. The final
    4-dp round absorbs it on both sides. Residual risk, accepted: a
    variance landing within ~5e-9 of an x.xxxx5 boundary could still
    round apart (~1e-4 odds per group per dataset); fully eliminating
    it would mean integer-only outputs, which the mean/var/std
    contract of this query isn't worth distorting for."""
    c = t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    s = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(bal.cast("decimal(38,6)")).cast("double").alias("sx"),
        F.sum((bal * bal).cast("decimal(38,6)")).cast("double").alias("sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    return s.select(
        "c_mktsegment",
        "n",
        F.round(F.col("sx") / F.col("n"), 4).alias("mean_bal"),
        F.round(var, 4).alias("var_bal"),
        F.round(F.sqrt(var), 4).alias("std_bal"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
             AS statuses,
           COUNT(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "agg", "array"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-array aggregation, sorted for determinism (raw
    collect_set order is partition-dependent in every engine). The
    sorted collection is emitted as a comma-joined scalar: the driver
    canonicalizer sorts result frames, and raw array cells are
    unhashable there — same semantics, hashable output."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias(
            "statuses"
        ),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


@register(
    "subquery_scalar_above_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
      FROM orders
    ) * 1.5
    """,
    tags=("relational", "subquery"),
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders 1.5x above the mean price (the scalar is
    computed once and broadcast into the filter)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    # Spark side keeps the direct decimal -> double cast: Spark's
    # (BigDecimal.doubleValue) is correctly rounded; only the DuckDB
    # oracle needs the VARCHAR hop (see queries/base.py::dec_sum).
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _sq_orders
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
          FROM _sq_orders
        ) * 1.5
        """
    )


@register(
    "range_join_value_buckets",
    oracle="""
    WITH buckets AS (
      SELECT unnest(range(0, 10)) AS bucket_id
    ), b AS (
      SELECT bucket_id, bucket_id * 10.0 AS lo, (bucket_id + 1) * 10.0 AS hi
      FROM buckets
    )
    SELECT b.bucket_id, COUNT(e.event_id) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM b LEFT JOIN events e ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.bucket_id
    """,
    tags=("relational", "join", "range"),
)
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: events against value-interval buckets —
    broadcast nested-loop on the tiny interval table. At scale, when
    intervals are equi-width like here, rewrite as `floor(value/w)`
    equi-join; the theta form covers irregular intervals."""
    ev = t(spark, sf_dir, "events")
    b = (
        spark.range(10)
        .select(F.col("id").cast("int").alias("bucket_id"))
        .select(
            "bucket_id",
            (F.col("bucket_id") * 10.0).alias("lo"),
            ((F.col("bucket_id") + 1) * 10.0).alias("hi"),
        )
    )
    return (
        F.broadcast(b)
        .join(ev, (ev.value >= b.lo) & (ev.value < b.hi), "left_outer")
        .groupBy("bucket_id")
        .agg(
            F.count("event_id").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "conditional_funcs_customers",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
           LEAST(c_acctbal, 5000.0) AS capped_bal,
           GREATEST(c_acctbal, 0.0) AS floored_bal,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_class
    FROM customer
    """,
    tags=("relational", "conditional"),
)
def conditional_funcs_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-function surface: coalesce/nullif/least/greatest/
    multi-branch CASE."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment_or_other"),
        F.least("c_acctbal", F.lit(5000.0)).alias("capped_bal"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("floored_bal"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_class"),
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("relational", "join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators.skew.salted_join): the left side is
    salted, the right replicated per salt bucket — the hot-key
    mitigation for fact-fact joins where AQE's skew splitting isn't
    enough. Salting is internal plumbing: the oracle is the PLAIN
    join, proving result equivalence."""
    from ..operators.skew import salted_join

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        salted_join(orders, cust, "o_custkey", salt_buckets=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
