"""Round-6 time-series + distribution analytics.

- ``timeseries_ewma_daily``: exponentially weighted moving average
  with a dyadic decay (alpha = 1/2) over a bounded 8-day kernel —
  EXACT because every weight is a power of two.
- ``timeseries_anomaly_mad``: median-absolute-deviation outlier days
  per event type, on LOWER medians (pure order statistics — no
  midpoint averaging, so every comparison is exact decimal).
- ``timeseries_cross_correlation``: lagged Pearson correlation
  between two event types' daily series at lags 0..7.
- ``timeseries_changepoint_cusum``: CUSUM changepoint day per type,
  computed on the n-scaled statistic n*prefix - t*total so the argmax
  is taken over EXACT decimals (no mean division inside the scan).
- ``agg_skewness_kurtosis_manual``: third/fourth standardized moments
  from exact decimal power sums — the skewness()/kurtosis() surface
  without the built-ins' partition-order-dependent accumulation.
- ``agg_mode_per_group``: exact deterministic mode (argmax count,
  ties to smallest value) of lang per source.
- ``window_cume_dist_orders``: percent_rank + cume_dist of order
  value within each priority class — rank-family coverage for the
  two remaining rank functions, partitioned so no global sort.

Float parity: daily totals are decimal-exact sums cast once to
double; derived products follow the ``agg_linear_regression_per_type``
pattern (double multiply — correctly rounded and identical on both
engines — then decimal re-sum), and every reported ratio is one
explicit round absorbing ulp drift (``agg_corr_manual`` policy).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import dec_sum, register, t

_EPOCH = datetime.date(2024, 1, 1)

_DAILY_SQL = """
  SELECT event_type,
         date_trunc('day', ts)::DATE AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
"""


# One persisted rollup per (session, sf_dir): four registered queries
# (EWMA, MAD, xcorr, CUSUM) consume this frame, and each used to
# persist() a fresh copy — a long driver session sweeping the registry
# accumulated four cached duplicates of the same (types x days) table.
# Memoizing bounds the cache at one LIVE entry per data directory:
# keys are (applicationId, sf_dir), and entries from superseded
# sessions (stopped + restarted -> new appId) are evicted on the next
# call so the dict never pins DataFrames of dead sessions.
_DAILY_CACHE: dict[tuple[str, str], DataFrame] = {}


def clear_daily_cache() -> None:
    """Public invalidation hook for the memoized daily rollup.

    The memo assumes a data directory's contents never change within a
    session; any caller that rewrites data under the same path (or
    that needs cold-cache timings, like the partition-invariance
    sweep) must call this instead of reaching into the private dict.
    Unpersists live entries before dropping them so the executor
    storage memory is actually released, not just the references."""
    for df in _DAILY_CACHE.values():
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — stale JVM state: drop ref
            pass
    _DAILY_CACHE.clear()


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persisted: the MAD query references this rollup from ~6 join
    # arms (med/dev/mad branches) and EWMA/xcorr from 2 each —
    # exchange reuse is an optimizer courtesy, not a guarantee (repo
    # rule 4), so the (types x days) frame is cached explicitly
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _DAILY_CACHE if k[0] != app_id]:
        del _DAILY_CACHE[k]  # stale session — let its graph collect
    key = (app_id, sf_dir)
    cached = _DAILY_CACHE.get(key)
    if cached is not None:
        try:
            lvl = cached.storageLevel
            if lvl.useMemory or lvl.useDisk:
                return cached
            # an external spark.catalog.clearCache() (bench/
            # oracle_compare hygiene between queries) dropped the
            # block — re-persist the same plan so multi-branch
            # consumers (MAD's ~6 arms) don't silently recompute the
            # rollup per branch
            return cached.persist()
        except Exception:  # noqa: BLE001 — stale JVM state: rebuild
            del _DAILY_CACHE[key]
    ev = t(spark, sf_dir, "events")
    df = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("total")
    ).persist()
    _DAILY_CACHE[key] = df
    return df


# --- EWMA with dyadic weights -----------------------------------------

_EWMA_WINDOW = 8  # kernel length; weight for age j is 2^(7-j)

_EWMA_ORACLE = f"""
WITH daily AS ({_DAILY_SQL})
SELECT cur.event_type, strftime(cur.day, '%Y-%m-%d') AS day,
       cur.total,
       round(CAST(CAST(SUM(CAST(past.total
                           * (1::BIGINT << ({_EWMA_WINDOW} - 1
                                            - (cur.day - past.day)))
                           AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
               / SUM(1::BIGINT << ({_EWMA_WINDOW} - 1
                                   - (cur.day - past.day))), 6) AS ewma
FROM daily cur
JOIN daily past
  ON past.event_type = cur.event_type
 AND cur.day - past.day BETWEEN 0 AND {_EWMA_WINDOW} - 1
GROUP BY cur.event_type, cur.day, cur.total
"""


@register(
    "timeseries_ewma_daily",
    oracle=_EWMA_ORACLE,
    tags=("timeseries", "smoothing"),
)
def timeseries_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily EWMA with alpha = 1/2 truncated to an 8-day
    kernel: weight for a sample j days old is 2^(7-j), normalized by
    the weights of the days actually present. Because every weight is
    a power of two, the weighted decimal sum is EXACT — no recursive
    float state, no arrival-order dependence — and the single final
    division is correctly rounded on both engines (+ 6-dp round).
    Scale: the kernel is a calendar-bounded self-join of the
    (types x days) daily rollup — the corpus is touched once by the
    daily groupBy; everything after runs on dimension-bounded rows."""
    daily = _daily(spark, sf_dir)
    cur = daily.select(
        "event_type", F.col("day").alias("day"), F.col("total").alias("total")
    )
    past = daily.select(
        F.col("event_type").alias("event_type"),
        F.col("day").alias("pday"),
        F.col("total").alias("ptotal"),
    )
    age = F.datediff(F.col("day"), F.col("pday"))
    joined = (
        cur.join(past, "event_type")
        .filter((age >= 0) & (age < _EWMA_WINDOW))
        .withColumn("age", age)
        .withColumn(
            "w",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {_EWMA_WINDOW} - 1 - age)"
            ),
        )
    )
    return (
        joined.groupBy("event_type", "day", "total")
        .agg(
            F.round(
                F.sum(
                    (F.col("ptotal") * F.col("w")).cast("decimal(38,6)")
                )
                .cast("double")
                / F.sum("w"),
                6,
            ).alias("ewma")
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "total",
            "ewma",
        )
    )


# --- MAD anomaly days -------------------------------------------------

# lower median: the element at ascending rank (n+1) div 2 — a pure
# order statistic, so med and MAD are exact decimals (no midpoint
# averaging) and the 3-MAD comparison never straddles a float boundary
_MAD_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
d AS (SELECT event_type, day, CAST(total AS DECIMAL(38,6)) AS x
      FROM daily),
med AS (
  SELECT event_type, x AS m FROM (
    SELECT event_type, x,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY x, day) AS rk,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM d) WHERE rk = (n + 1) // 2),
dev AS (
  SELECT d.event_type, d.day, d.x, ABS(d.x - m.m) AS adev, m.m
  FROM d JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, adev AS mad FROM (
    SELECT event_type, adev,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY adev, day) AS rk,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM dev) WHERE rk = (n + 1) // 2)
SELECT dev.event_type, strftime(dev.day, '%Y-%m-%d') AS day,
       CAST(CAST(dev.x AS VARCHAR) AS DOUBLE) AS total,
       CAST(CAST(dev.m AS VARCHAR) AS DOUBLE) AS med,
       CAST(CAST(mad.mad AS VARCHAR) AS DOUBLE) AS mad
FROM dev JOIN mad USING (event_type)
WHERE dev.adev > 3 * mad.mad
"""


@register(
    "timeseries_anomaly_mad",
    oracle=_MAD_ORACLE,
    tags=("timeseries", "anomaly", "robust"),
)
def timeseries_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier days: |x - median| > 3 * MAD per event type,
    using LOWER medians (ascending rank (n+1) div 2, ties broken by
    day) so both medians are exact decimal order statistics and the
    3-MAD threshold is an exact decimal comparison — a boundary-
    straddling day cannot flip between engines. The daily rollup is
    the only corpus pass; the median machinery runs on the
    (types x days) table with per-type windows (bounded groups — at
    fact scale the same order statistic runs on the
    ``operators/prefix.py`` rank exchange, cf.
    ``agg_exact_median_distributed``)."""
    d = _daily(spark, sf_dir).select(
        "event_type", "day", F.col("total").cast("decimal(38,6)").alias("x")
    )

    def lower_median(df: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(val, "day")
        wn = Window.partitionBy("event_type")
        return (
            df.withColumn("rk", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(wn))
            .filter(F.col("rk") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col(val).alias(out))
        )

    med = lower_median(d, "x", "m")
    dev = d.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("x") - F.col("m"))
    )
    mad = lower_median(
        dev.select("event_type", "day", F.col("adev").alias("x")), "x", "mad"
    )
    return (
        dev.join(mad, "event_type")
        .filter(F.col("adev") > 3 * F.col("mad"))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("x").cast("double").alias("total"),
            F.col("m").cast("double").alias("med"),
            F.col("mad").cast("double").alias("mad"),
        )
    )


# --- lagged cross-correlation ------------------------------------------

_XCORR_A = "click"
_XCORR_B = "purchase"
_MAX_LAG = 7

_XCORR_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
a AS (SELECT day, total AS x FROM daily WHERE event_type = '{_XCORR_A}'),
b AS (SELECT day, total AS y FROM daily WHERE event_type = '{_XCORR_B}'),
lags AS (SELECT unnest(range(0, {_MAX_LAG + 1})) AS lag),
s AS (
  SELECT l.lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(a.x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(b.y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(a.x * a.x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(b.y * b.y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(a.x * b.y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM lags l
  JOIN a ON TRUE
  JOIN b ON b.day - a.day = l.lag
  GROUP BY l.lag)
SELECT lag, n,
       round((n * sxy - sx * sy)
               / nullif(sqrt(greatest(n * sxx - sx * sx, 0))
                        * sqrt(greatest(n * syy - sy * sy, 0)), 0),
             9) AS corr
FROM s
"""


@register(
    "timeseries_cross_correlation",
    oracle=_XCORR_ORACLE,
    tags=("timeseries", "correlation"),
)
def timeseries_cross_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lead-lag analysis: Pearson correlation between the click and
    purchase daily series at lags 0..7 ("do clicks predict purchases
    k days later?"). Moment sums follow the linreg pattern (double
    products — correctly rounded, identical cross-engine — re-summed
    through exact decimal), the correlation is one guarded double
    chain with a 9-dp round. The corpus is touched once by the daily
    rollup; the lag sweep is an 8-way join of two <=31-row series."""
    daily = _daily(spark, sf_dir)
    a = daily.filter(F.col("event_type") == _XCORR_A).select(
        F.col("day").alias("aday"), F.col("total").alias("x")
    )
    b = daily.filter(F.col("event_type") == _XCORR_B).select(
        F.col("day").alias("bday"), F.col("total").alias("y")
    )
    lags = spark.range(_MAX_LAG + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    s = (
        F.broadcast(lags)
        .join(a.crossJoin(b), F.datediff("bday", "aday") == F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dec_sum(F.col("x"), "sx"),
            dec_sum(F.col("y"), "sy"),
            dec_sum(F.col("x") * F.col("x"), "sxx"),
            dec_sum(F.col("y") * F.col("y"), "syy"),
            dec_sum(F.col("x") * F.col("y"), "sxy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # greatest(.,0) under each sqrt: the decimal-rounded moment sums
    # can land a zero variance at a tiny NEGATIVE double, which DuckDB
    # sqrt() raises on (Out of Range) while Spark returns NaN — clamp
    # on BOTH engines so degenerate lags yield NULL everywhere
    corr = (n * sxy - sx * sy) / F.nullif(
        F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0)))
        * F.sqrt(F.greatest(n * syy - sy * sy, F.lit(0.0))),
        F.lit(0),
    )
    return s.select("lag", "n", F.round(corr, 9).alias("corr"))


# --- CUSUM changepoint --------------------------------------------------

_CUSUM_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
d AS (SELECT event_type, day, CAST(total AS DECIMAL(38,6)) AS x
      FROM daily),
pre AS (
  SELECT event_type, day,
         ROW_NUMBER() OVER w AS t,
         SUM(x) OVER (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS p,
         SUM(x) OVER (PARTITION BY event_type) AS s,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
stat AS (
  SELECT event_type, day, n,
         ABS(n * p - t * s) AS tt
  FROM pre)
SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day,
       round(CAST(CAST(tt AS VARCHAR) AS DOUBLE) / n, 6) AS cusum_stat
FROM (
  SELECT event_type, day, n, tt,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY tt DESC, day) AS rk
  FROM stat) WHERE rk = 1
"""


@register(
    "timeseries_changepoint_cusum",
    oracle=_CUSUM_ORACLE,
    tags=("timeseries", "changepoint"),
)
def timeseries_changepoint_cusum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUSUM changepoint detection per event type: the day maximizing
    |cumulative deviation from the series mean|. The scan runs on the
    n-SCALED statistic n*prefix_t - t*total — an exact decimal for
    every t, with the same argmax as the mean-subtracted CUSUM (n>0),
    so no division happens inside the comparison and the argmax (ties
    to the earliest day) cannot flip between engines; the reported
    statistic divides once for display. One corpus pass (daily
    rollup); windows partition by type over day-grain rows."""
    d = _daily(spark, sf_dir).select(
        "event_type", "day", F.col("total").cast("decimal(38,6)").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("event_type")
    stat = d.select(
        "event_type",
        "day",
        F.row_number().over(w).alias("t"),
        F.sum("x").over(wc).alias("p"),
        F.sum("x").over(wn).alias("s"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).select(
        "event_type",
        "day",
        "n",
        F.abs(F.col("n") * F.col("p") - F.col("t") * F.col("s")).alias("tt"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("tt"), F.asc("day")
    )
    return (
        stat.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
            F.round(F.col("tt").cast("double") / F.col("n"), 6).alias(
                "cusum_stat"
            ),
        )
    )


# --- skewness / kurtosis from exact power sums ---------------------------

_SKEW_ORACLE = """
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(SUM(CAST(value * value * value
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s3,
         CAST(CAST(SUM(CAST(value * value * value * value
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS s4
  FROM events GROUP BY event_type)
SELECT event_type, n,
       round((s3 - 3 * (s1 / n) * s2 + 2 * n * (s1 / n) * (s1 / n)
                * (s1 / n))
               / nullif(n * pow(sqrt(greatest((s2 - s1 * s1 / n) / n,
                                              0)), 3), 0),
             9) AS skewness,
       round((s4 - 4 * (s1 / n) * s3 + 6 * (s1 / n) * (s1 / n) * s2
                - 3 * n * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
               / nullif(n * pow((s2 - s1 * s1 / n) / n, 2), 0) - 3,
             9) AS excess_kurtosis
FROM s
"""


@register(
    "agg_skewness_kurtosis_manual",
    oracle=_SKEW_ORACLE,
    tags=("agg", "stats", "moments"),
)
def agg_skewness_kurtosis_manual(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Population skewness and excess kurtosis per event type from the
    four raw power sums — the skewness()/kurtosis() surface with exact
    decimal accumulation (the built-ins' single-pass float central-
    moment updates are partition-order-dependent AND differ in
    population/sample convention between engines). Power products are
    double multiplies (correctly rounded, identical cross-engine)
    re-summed through decimal; the standardized ratios are one guarded
    double chain each with a 9-dp round. One map-combinable groupBy is
    the whole corpus cost. value <= ~561 at sf0.1 keeps value^4 sums
    ~1e16, far inside DECIMAL(38,6)."""
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dec_sum(v, "s1"),
        dec_sum(v * v, "s2"),
        dec_sum(v * v * v, "s3"),
        dec_sum(v * v * v * v, "s4"),
    )
    n = F.col("n")
    s1, s2, s3, s4 = F.col("s1"), F.col("s2"), F.col("s3"), F.col("s4")
    m = s1 / n
    m2 = (s2 - s1 * s1 / n) / n
    # clamp m2 under the sqrt (DuckDB sqrt(tiny negative) errors,
    # Spark yields NaN; both must give NULL for zero-variance groups)
    skew = (s3 - 3 * m * s2 + 2 * n * m * m * m) / F.nullif(
        n * F.pow(F.sqrt(F.greatest(m2, F.lit(0.0))), F.lit(3)), F.lit(0)
    )
    kurt = (
        s4 - 4 * m * s3 + 6 * m * m * s2 - 3 * n * m * m * m * m
    ) / F.nullif(n * F.pow(m2, F.lit(2)), F.lit(0)) - 3
    return s.select(
        "event_type",
        "n",
        F.round(skew, 9).alias("skewness"),
        F.round(kurt, 9).alias("excess_kurtosis"),
    )


# --- exact mode ----------------------------------------------------------


@register(
    "agg_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2)
    SELECT source, lang AS mode_lang, n AS mode_n
    FROM (
      SELECT source, lang, n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n DESC, lang) AS rk
      FROM c) WHERE rk = 1
    """,
    tags=("agg", "mode"),
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mode of lang per source — deterministic (count DESC,
    lang ASC) argmax, the MODE() surface without engines' unspecified
    tie behavior. One map-combinable (source, lang) count; the argmax
    window runs on (sources x langs) rows."""
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "source",
            F.col("lang").alias("mode_lang"),
            F.col("n").alias("mode_n"),
        )
    )


# --- percent_rank / cume_dist --------------------------------------------


@register(
    "window_cume_dist_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist() OVER w, 9) AS cume
    FROM orders
    WHERE o_totalprice > 400000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "rank"),
)
def window_cume_dist_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist of order value within each priority
    class (the two rank-family functions the suite had not yet
    registered) — both are pure rank/count rationals evaluated as one
    double division, identical on both engines, with a 9-dp round as
    belt-and-braces. The window partitions by priority (bounded
    classes, each sorted in parallel after the filter cuts the input);
    ties are impossible under the (price, orderkey) total order."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )
