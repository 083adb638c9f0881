"""Relational operator surface — SURVEY §2 Table B.

The reference delegates all relational evaluation to the source
database as SQL text; the new engine evaluates it natively with
Catalyst. These queries pin every checklist category (joins of each
flavor, aggregation, windows, sort/limit, set ops, string/date/math/
array/JSON functions, grouping sets) against the DuckDB oracle.

Float determinism: every double aggregate goes through ``dec_sum``
(exact decimal accumulation, then one cast to double) so results are
bit-identical regardless of partitioning — see queries/base.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import dec_sum, o_dec_sum, register, t


@register(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dec_sum('l_quantity', 'sum_qty')},
           {o_dec_sum('l_extendedprice', 'sum_base_price')},
           {o_dec_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {o_dec_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    tags=("relational", "agg"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregate: multi-measure groupBy with partial
    (map-side) aggregation — the canonical wide-agg plan."""
    li = t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity"), "sum_qty"),
            dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_disc_price",
            ),
            dec_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            (F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double") / n).alias("avg_qty"),
            (F.sum(F.col("l_discount").cast("decimal(38,6)")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "tpch_q3_topk",
    oracle=f"""
    SELECT l_orderkey,
           {o_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
    tags=("relational", "join", "topk"),
)
def tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority top-k: dimension filter -> fact join -> agg ->
    global top-k. `customer` carries no broadcast hint — it is
    corpus-proportional, so stats/AQE elect broadcast at small scale
    and fall back to a shuffle join at 100x (a forced hint would blow
    the broadcast limit there); revenue is decimal-exact so the
    ORDER BY tie-break (orderkey) is deterministic across engines."""
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           {o_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    headline=True,
    tags=("relational", "join"),
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue: five-way join — constant-cardinality
    dims (region/nation) keep explicit broadcast hints; the
    scale-linear sides (customer, supplier) carry none, so stats/AQE
    elect broadcast at small scale and shuffle at 100x."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


@register(
    "tpch_q6_revenue",
    oracle=f"""
    SELECT {o_dec_sum('l_extendedprice * l_discount', 'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    headline=True,
    tags=("relational", "agg"),
)
def tpch_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue filter+agg: the pure scan-pushdown query —
    all four predicates reach the parquet reader."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@register(
    "window_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    headline=True,
    tags=("relational", "window"),
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number window — the distributed top-k
    pattern that avoids a global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)
                AS DOUBLE) AS running_revenue
    FROM lineitem
    WHERE l_suppkey <= 3
    """,
    tags=("relational", "window"),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate over an explicit ROWS frame with a
    total order (shipdate, orderkey, linenumber) so every prefix sum is
    well-defined; decimal accumulation keeps it engine-exact."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        )
        .over(w)
        .cast("double")
        .alias("running_revenue"),
    )


@register(
    "sort_limit_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("relational", "sort"),
)
def sort_limit_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — a per-partition
    heap + driver merge, not a full sort (the 100 TB-safe top-k)."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "setops_repeat_customers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("relational", "setops"),
)
def setops_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers holding both open and filled orders."""
    orders = t(spark, sf_dir, "orders")
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return o_cust.intersect(f_cust)


@register(
    "setops_except_customers",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("relational", "setops"),
)
def setops_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with no pending orders."""
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    p_cust = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cust.exceptAll(p_cust).distinct()


@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 50000)
    """,
    tags=("relational", "join"),
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): emits each matching left row once."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("relational", "join"),
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers who never ordered."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_outer_order_fill_rate",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           COUNT(*) AS n_rows
    FROM customer
    LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("relational", "join"),
)
def join_outer_order_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving customers with zero orders;
    COUNT(col) vs COUNT(*) distinguishes the null-extended rows."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "string_funcs_parts",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LENGTH(p_name) AS name_len,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
           SUBSTR(p_name, 1, 5) AS name_prefix
    FROM part
    WHERE p_name LIKE '%a%'
    """,
    tags=("relational", "string"),
)
def string_funcs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: case, length, regex extract/replace,
    concat, substring, LIKE — all JVM-side codegen'd built-ins."""
    p = t(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
    )


@register(
    "datetime_funcs_orders",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS quarter,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2, 3
    """,
    tags=("relational", "datetime"),
)
def datetime_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: truncation, field extraction, grouping by
    calendar units (the reference only ever formats/parses timestamps
    as strings — source/source.go:218-236)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month"),
        F.year("o_orderdate").cast("bigint").alias("year"),
        F.quarter("o_orderdate").cast("bigint").alias("quarter"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "json_funcs_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
             / COUNT(*) AS avg_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("relational", "json"),
)
def json_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column (`props`), then aggregate —
    covers the variant-data path the reference only passes through
    (disableVariantCheck, config/config.go:63)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("k").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "rollup_lineitem_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {o_dec_sum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("relational", "agg"),
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (grouping-sets family): subtotal rows carry
    NULL group keys identically in both engines."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum(F.col("l_quantity"), "sum_qty"),
    )


@register(
    "pivot_status_by_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    tags=("relational", "agg"),
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order-status counts per market segment (explicit value
    list keeps the output schema static — required at scale, where an
    inferred pivot would need an extra pass). `customer` is
    corpus-proportional, so no broadcast hint: stats elect it small,
    shuffle join takes over at 100x."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )


@register(
    "distinct_flag_status",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("relational", "agg"),
)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash aggregate without measures."""
    return t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@register(
    "asof_join_purchase_session",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("relational", "join", "asof"),
)
def asof_join_purchase_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no built-in): for each purchase, the most
    recent click at-or-before it by the same user. Implemented as the
    scalable union+window pattern — tag both sides, sort within user by
    (ts, side), carry the last click timestamp forward with
    ``last(ignorenulls)``. One shuffle on user_id; no range explosion;
    survives arbitrarily large sides (cf. DuckDB's native ASOF JOIN,
    which is the oracle here)."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("side"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.col("event_id"), F.lit(1).alias("side")
    )
    unioned = clicks.unionByName(purchases)
    # clicks sort before purchases at equal ts => 'at-or-before' (>=)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("side") == 0, F.col("ts"))
    return (
        unioned.withColumn(
            "last_click_ts", F.last(click_ts, ignorenulls=True).over(w)
        )
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
        )
    )


@register(
    "array_funcs_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS sq_norm
    FROM (SELECT vec_id, embedding, UNNEST(embedding) AS x FROM embeddings)
    GROUP BY vec_id, len(embedding)
    """,
    tags=("relational", "array"),
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over `array<float>`: size + exact squared
    L2 norm via explode -> decimal-exact sum (float->double cast is
    exact; the per-element double product is IEEE-identical in both
    engines, so the decimal accumulation matches bit-for-bit)."""
    emb = t(spark, sf_dir, "embeddings")
    x = F.col("x").cast("double")
    return (
        emb.select(
            "vec_id", F.size("embedding").alias("dim"), F.explode("embedding").alias("x")
        )
        .groupBy("vec_id", "dim")
        .agg(
            F.sum((x * x).cast("decimal(38,12)")).cast("double").alias("sq_norm")
        )
    )


@register(
    "math_funcs_orders",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS price_round,
           CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k,
           ABS(o_totalprice - 100000) AS dist_100k,
           CAST(o_orderkey % 7 AS BIGINT) AS key_mod7
    FROM orders
    WHERE o_totalprice > 0
    """,
    tags=("relational", "math"),
)
def math_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function surface: round/floor/abs/mod on doubles and keys."""
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > 0).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price_round"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_k"),
        F.abs(F.col("o_totalprice") - 100000).alias("dist_100k"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod7"),
    )


@register(
    "variant_extract_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR)
             AS k_str,
           (json_extract(props, '$.missing') IS NULL) AS missing_is_null,
           (CAST(json_extract(props, '$.k') AS BIGINT) % 2 = 0) AS k_even
    FROM events
    """,
    tags=("relational", "json", "variant"),
)
def variant_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data through Spark 4's native VariantType —
    the engine-level analog of the Databend variant columns the
    reference passes through opaquely (disableVariantCheck,
    config/config.go:63): ``parse_json`` once into the binary variant
    encoding, then typed ``variant_get`` extractions (bigint, string,
    a missing path yielding NULL). Unlike get_json_object
    (json_funcs_events), the variant parse happens once per row and
    every extraction reads the binary form — the right shape when many
    fields are pulled from the same payload at 100 TB."""
    ev = t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        k.cast("string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").isNull().alias(
            "missing_is_null"
        ),
        (k % 2 == 0).alias("k_even"),
    )
