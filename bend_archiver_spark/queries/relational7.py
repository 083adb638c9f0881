"""Range-frame windows, time-series gap filling, and column profiling.

Three capabilities the earlier relational modules don't cover:

- a RANGE window frame over a date axis (value-based, not row-based —
  trailing 7-day revenue regardless of how many orders land in the
  frame),
- a generated date spine joined against sparse daily aggregates (the
  gap-filling step every time-series report needs),
- per-column data profiling (null counts / distinct counts) via an
  unpivot, the data-quality probe run before training-data ingestion.

Reference parity note: the reference engine has no window functions or
series generation at all (SURVEY.md Table B, `worker/stats.go:7` is
metrics-only); these are Spark-surface capabilities the new engine
must still expose. All three follow the decimal-sum convention from
queries/base.py so window/aggregate sums hash-match DuckDB exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t


@register(
    "window_range_sliding_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                  PARTITION BY o_custkey
                  ORDER BY CAST(o_orderdate AS DATE)
                  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS VARCHAR)
                AS DOUBLE) AS rev_7d
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def window_range_sliding_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per customer with a RANGE frame: the
    frame is bounded by *date distance* (6 days preceding through
    today, peers included), not a fixed row count — rowsBetween would
    be wrong whenever order density varies. Spark needs a numeric
    ordering column for rangeBetween, so the date becomes
    days-since-epoch; the oracle uses DuckDB's native interval frame
    over the same DATE. The window sum stays decimal until one final
    cast (float window sums are partition-order-dependent)."""
    o = t(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("rev_7d"),
    )


@register(
    "timeseries_gapfill_daily",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
      FROM events GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n_events, 0) AS n_events,
           COALESCE(d.total_value, 0.0) AS total_value
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    tags=("timeseries", "gapfill"),
)
def timeseries_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series from sparse events: a date spine generated
    with ``sequence(min_day, max_day)`` left-joined to the daily
    aggregate, zero-filling days with no events (the step that makes
    downstream moving averages honest). The spine derives from a
    1-row bounds aggregate, and the daily aggregate is one row per
    day at any input scale, so it broadcasts (Spark cannot
    broadcast-build the row-preserving side of an outer join, so the
    hint goes on the right side) — at 100 TB the only real shuffle is
    the daily groupBy, which map-side combines to one row per
    (partition, day)."""
    e = t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_value"),
    )
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


_PROFILE_COLS = ("o_custkey", "o_orderstatus", "o_orderpriority")


@register(
    "profile_columns_orders",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT) AS n_distinct
    FROM orders"""
        for c in _PROFILE_COLS
    ),
    tags=("profiling", "quality"),
)
def profile_columns_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile (row/null/distinct counts) via a
    stack-unpivot: one scan produces (col_name, value) rows, one
    groupBy yields all columns' profiles — versus one full scan per
    column in the naive loop (the oracle's UNION ALL shape). Values
    are profiled as strings so one schema covers every column type;
    doubles are deliberately excluded (their string forms differ
    across engines)."""
    o = t(spark, sf_dir, "orders")
    pairs = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS
    )
    unpivoted = o.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {pairs}) AS (col_name, val)"
        )
    )
    return unpivoted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
    )


@register(
    "diagnose_key_skew",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM per_key)
    SELECT o_custkey, n,
           CAST(n AS DOUBLE) / total AS share
    FROM per_key, tot
    ORDER BY n DESC, o_custkey
    LIMIT 10
    """,
    tags=("profiling", "skew"),
)
def diagnose_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnosis: the 10 heaviest join/agg keys and the
    share of all rows they carry — the probe run before choosing
    between a plain shuffle join, AQE skew splitting, or the salted
    join (operators/skew.py). One map-side-combinable groupBy plus a
    broadcast scalar total; ordering ties break on the key so the
    top-10 cut is deterministic in both engines."""
    o = t(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    total = per_key.agg(
        F.sum(F.col("n").cast("decimal(38,0)")).cast("bigint").alias("total")
    )
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            "n",
            (F.col("n").cast("double") / F.col("total")).alias("share"),
        )
        .orderBy(F.desc("n"), "o_custkey")
        .limit(10)
    )


@register(
    "map_funcs_events",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) + 1 AS BIGINT) AS n_after_concat
    FROM events
    """,
    tags=("relational", "map"),
)
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON props column into a real
    ``map<string,bigint>`` (`from_json`), then read it back through
    map functions — ``size``, ``element_at``, and construction via
    ``create_map``/``map_concat`` (the concat adds a key absent from
    the data, so its size is provably keys+1). The oracle sees only
    scalar derivations because map *columns* don't cross the pandas
    comparison boundary portably; the map machinery itself is what's
    under test."""
    ev = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    mm = F.map_concat(m, F.create_map(F.lit("extra"), F.lit(1).cast("bigint")))
    return ev.select(
        "event_id",
        F.size(m).cast("bigint").alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.size(mm).cast("bigint").alias("n_after_concat"),
    )


@register(
    "setops_all_lineitem",
    oracle="""
    WITH a AS (SELECT l_returnflag FROM lineitem WHERE l_quantity < 10),
         b AS (SELECT l_returnflag FROM lineitem WHERE l_discount > 0.08),
         ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
         ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    SELECT 'except_all' AS op, l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ea GROUP BY 2
    UNION ALL
    SELECT 'intersect_all' AS op, l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ia GROUP BY 2
    """,
    tags=("relational", "setops"),
)
def setops_all_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (`exceptAll` / `intersectAll`) — the
    duplicate-preserving variants the earlier set-op queries don't
    touch. Spark plans both as an aggregate of signed counts rather
    than a join per duplicate, which is exactly the 100 TB-safe
    strategy; the aggregated output keeps the oracle comparison
    order-free."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 10).select("l_returnflag")
    b = li.filter(F.col("l_discount") > 0.08).select("l_returnflag")
    ea = (
        a.exceptAll(b)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "l_returnflag", "n")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "l_returnflag", "n")
    )
    return ea.unionByName(ia)


@register(
    "timeseries_moving_avg",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6))
               AS total_value
      FROM events GROUP BY 1
    ),
    dense AS (
      SELECT s.day,
             COALESCE(d.total_value, CAST(0 AS DECIMAL(38,6))) AS total_value
      FROM spine s LEFT JOIN daily d ON s.day = d.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(CAST(SUM(total_value) OVER w AS VARCHAR) AS DOUBLE)
             / COUNT(*) OVER w AS ma7
    FROM dense
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    tags=("timeseries", "window"),
)
def timeseries_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily event value over the *gap-filled*
    series — the composition the date spine exists for: a missing day
    contributes zero to the numerator and one to the denominator,
    which a moving average over the sparse table silently gets wrong.
    The global window here is safe at any data scale because its
    input is already one row per calendar day (the heavy lifting —
    the daily groupBy — happened before the window); sums stay
    decimal through the frame, with one double division at the end."""
    e = t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value")
    )
    dense = spine.join(F.broadcast(daily), "day", "left").select(
        "day",
        F.coalesce(
            "total_value", F.lit(0).cast("decimal(38,6)")
        ).alias("total_value"),
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return dense.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (
            F.sum("total_value").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma7"),
    )


# ---------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------

_SEASON = 7  # weekly seasonality


@register(
    "timeseries_seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(38,6))) AS v
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events),
    spine AS (
      SELECT t.event_type, CAST(s.day AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(
                    (SELECT d0 FROM bounds), (SELECT d1 FROM bounds),
                    INTERVAL 1 DAY)) AS day) s),
    dense AS (
      SELECT sp.event_type, sp.day,
             COALESCE(d.v, CAST(0 AS DECIMAL(38,6))) AS v
      FROM spine sp LEFT JOIN daily d
        ON d.event_type = sp.event_type AND d.day = sp.day),
    scored AS (
      SELECT event_type, day, v,
             lag(v, {_SEASON}) OVER (
               PARTITION BY event_type ORDER BY day) AS fc
      FROM dense)
    SELECT event_type,
           CAST(COUNT(fc) AS BIGINT) AS n_scored,
           CAST(CAST(SUM(abs(v - fc)) AS VARCHAR) AS DOUBLE) AS total_abs_err,
           CAST(CAST(SUM(abs(v - fc)) AS VARCHAR) AS DOUBLE) / COUNT(fc) AS mae
    FROM scored WHERE fc IS NOT NULL
    GROUP BY event_type
    """,
    tags=("timeseries", "forecast", "backtest"),
)
def timeseries_seasonal_naive_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's per-type
    total as the value seven days earlier (the baseline every real
    forecasting system must beat) and score it with MAE over the
    densified history. The spine is densified per type BEFORE the lag
    so the seasonal offset counts calendar days, not observed days —
    the correctness subtlety sparse series get wrong.

    Exactness: daily totals stay DECIMAL(38,6) through the lag and
    the |error| sum (doubles would make the MAE partition-order
    dependent); one double cast at the end. Scale shape: the daily
    aggregate map-side combines to one row per (type, day); the spine
    is types x days (tiny, broadcast); the lag window partitions by
    event_type over day-count-bounded groups."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(38,6)")).alias("v"))
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = (
        e.select("event_type").distinct()
        .crossJoin(
            F.broadcast(
                bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
            )
        )
    )
    dense = spine.join(F.broadcast(daily), ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("v", F.lit(0).cast("decimal(38,6)")).alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    scored = dense.withColumn("fc", F.lag("v", _SEASON).over(w)).filter(
        F.col("fc").isNotNull()
    )
    abs_err = F.abs(F.col("v") - F.col("fc"))
    return scored.groupBy("event_type").agg(
        F.count("fc").cast("bigint").alias("n_scored"),
        F.sum(abs_err).cast("double").alias("total_abs_err"),
        (F.sum(abs_err).cast("double") / F.count("fc")).alias("mae"),
    )
