"""Community detection, sketch merging, time-series decomposition,
and grouped regression.

- ``graph_label_propagation``: synchronous label propagation
  community detection (Raghavan et al. 2007) over the part
  co-occurrence graph, made DETERMINISTIC (the published algorithm's
  random tie-break would violate the partition-invariance contract)
  by the total order (count DESC, label ASC) — every round is exactly
  reproducible on both engines.
- ``agg_histogram_merge_sources``: the mergeability claim of the
  fixed-bin quantile sketch (``agg_histogram_quantile``) exercised
  for real: per-source sketches are built ONCE, queried per source,
  and merged into the global answer purely by adding bin counts — the
  "sketch once, query any rollup" pattern that makes fixed-bin
  histograms the 100 TB quantile workhorse.
- ``timeseries_seasonal_decompose``: additive decomposition of the
  per-type daily series into trend (centered 7-row moving average) +
  day-of-week seasonal index + residual — the classic pre-forecast
  diagnostic, float-parity-safe because every component is one
  decimal-exact sum and a single correctly-rounded division.
- ``agg_linear_regression_per_type``: per-group OLS (slope,
  intercept, R^2) from exact decimal moment sums — the
  regr_slope/regr_intercept surface without the built-ins'
  partition-order-dependent float accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import label_propagation
from .analytics3 import EDGES_CTE, cooccur_edges
from .base import dec_sum, register, t

_LPA_ROUNDS = 3


def _lpa_round_sql(prev: str, rnd: int) -> str:
    return f"""
    cnt{rnd} AS (
      SELECT a.node, l.label, COUNT(*) AS c
      FROM adj a JOIN {prev} l ON a.nbr = l.node GROUP BY 1, 2),
    lab{rnd} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM cnt{rnd}) WHERE rn = 1)
    """


_LPA_ORACLE = (
    f"WITH {EDGES_CTE},"
    + """
    adj AS (SELECT u AS node, v AS nbr FROM edges
            UNION ALL SELECT v, u FROM edges),
    lab0 AS (SELECT DISTINCT node, node AS label FROM adj)
    """
    + "".join(
        "," + _lpa_round_sql(f"lab{i - 1}", i)
        for i in range(1, _LPA_ROUNDS + 1)
    )
    + f"""
    SELECT l.node AS p_partkey, l.label AS community,
           CAST(cs.n AS BIGINT) AS community_size
    FROM lab{_LPA_ROUNDS} l
    JOIN (SELECT label, COUNT(*) AS n FROM lab{_LPA_ROUNDS}
          GROUP BY label) cs USING (label)
    """
)


@register(
    "graph_label_propagation",
    oracle=_LPA_ORACLE,
    tags=("graph", "iterative", "community"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation, 3
    rounds: every node starts as its own label; each round it adopts
    its neighbors' most frequent current label, ties broken by
    smallest label — a deterministic total order replacing the
    paper's random tie-break, so the rounds are bit-identical on both
    engines and under any partitioning. One corpus pass builds the
    persisted edge list (shared with ``graph_triangle_count``); from
    there every round is node-bounded: an adjacency equi-join against
    the |V|-row label table, a map-combinable (node, label) count,
    and a degree-bounded window for the argmax — iteration cost never
    re-touches lineitem (same contract as the PageRank loop,
    ``graphrank.py``). Per-round persists keep the final plan linear
    in rounds instead of exponential lineage."""
    edges = cooccur_edges(spark, sf_dir)
    labels = label_propagation(edges, rounds=_LPA_ROUNDS, src="u", dst="v")
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("p_partkey"),
        F.col("label").alias("community"),
        F.col("n").cast("bigint").alias("community_size"),
    )


_CHAR_BIN_W = 50  # n_chars bin width for the per-source sketches

_HMERGE_ORACLE = f"""
WITH sk AS (
  SELECT source,
         CAST(floor(CAST(n_chars AS DOUBLE) / {_CHAR_BIN_W})
              AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM documents GROUP BY 1, 2),
u AS (
  SELECT source AS scope, bin, c FROM sk
  UNION ALL
  SELECT '__all__' AS scope, bin, SUM(c) AS c FROM sk GROUP BY bin),
cum AS (
  SELECT scope, bin, c,
         SUM(c) OVER (PARTITION BY scope ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY scope) AS n
  FROM u)
SELECT scope,
       CAST(n AS BIGINT) AS n_docs,
       CAST((n + 1) // 2 AS BIGINT) AS target_rank,
       CAST(MIN(bin) * {_CHAR_BIN_W} AS BIGINT) AS est_lo,
       CAST((MIN(bin) + 1) * {_CHAR_BIN_W} AS BIGINT) AS est_hi
FROM cum WHERE cum >= (n + 1) // 2
GROUP BY scope, n
"""


@register(
    "agg_histogram_merge_sources",
    oracle=_HMERGE_ORACLE,
    tags=("agg", "sketch", "mergeable"),
)
def agg_histogram_merge_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The sketch-merge pattern: ONE pass builds per-source fixed-bin
    histograms of document length; per-source median estimates AND
    the global estimate are then answered from the sketch table alone
    — the global sketch is literally the per-source sketches with bin
    counts added (one bin-keyed rollup), no second corpus pass. This
    is the property that matters at 100 TB: per-day / per-source
    sketches persist as tiny tables and any rollup's quantiles come
    from merging counts, which fixed bins make exact, deterministic
    and associative (SCALE.md rule 6; t-digest/GK merges are
    arrival-order-dependent and would break the bit-identical
    contract). The corpus-side cost is one map-combinable groupBy;
    everything after runs on (sources x bins) rows. Integer rank
    (n+1) div 2 avoids float entirely."""
    d = t(spark, sf_dir, "documents")
    # the sketch table IS the artifact: persist it so the per-source
    # branch and the merged rollup both read the (sources x bins)-row
    # cache instead of re-scanning the corpus per branch
    sk = d.groupBy(
        "source",
        # floor on BOTH engines via explicit floor-of-double-division
        # (DuckDB's integer // TRUNCATES toward zero like a bigint
        # cast — verified (-49)//50 = 0 — so the oracle must spell
        # floor out too or negative n_chars diverges)
        F.floor(F.col("n_chars") / _CHAR_BIN_W)
        .cast("bigint")
        .alias("bin"),
    ).agg(F.count(F.lit(1)).alias("c")).persist()
    merged = sk.groupBy("bin").agg(F.sum("c").alias("c")).select(
        F.lit("__all__").alias("scope"), "bin", "c"
    )
    u = sk.select(F.col("source").alias("scope"), "bin", "c").unionAll(merged)
    wc = Window.partitionBy("scope").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("scope")
    cum = u.select(
        "scope",
        "bin",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    r = F.expr("(n + 1) div 2")
    return (
        cum.filter(F.col("cum") >= r)
        .groupBy("scope", "n")
        .agg(F.min("bin").alias("eb"))
        .select(
            "scope",
            F.col("n").cast("bigint").alias("n_docs"),
            r.cast("bigint").alias("target_rank"),
            (F.col("eb") * _CHAR_BIN_W).cast("bigint").alias("est_lo"),
            ((F.col("eb") + 1) * _CHAR_BIN_W).cast("bigint").alias("est_hi"),
        )
    )


_EPOCH = "2024-01-01"

_DECOMP_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts)::DATE AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2),
tr AS (
  SELECT event_type, day, total,
         CAST(CAST(SUM(CAST(total AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE)
           / COUNT(*) OVER w AS trend
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
dw AS (
  SELECT event_type, (((day - DATE '{_EPOCH}') % 7) + 7) % 7 AS dow,
         CAST(CAST(SUM(CAST(total AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS dow_avg
  FROM daily GROUP BY 1, 2),
ov AS (
  SELECT event_type,
         CAST(CAST(SUM(CAST(total AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS all_avg
  FROM daily GROUP BY 1)
SELECT tr.event_type,
       strftime(tr.day, '%Y-%m-%d') AS day,
       round(total, 6) AS total,
       round(trend, 6) AS trend,
       round(dow_avg - all_avg, 6) AS seasonal,
       round(total - trend - (dow_avg - all_avg), 6) AS residual
FROM tr
JOIN dw ON dw.event_type = tr.event_type
       AND dw.dow = (((tr.day - DATE '{_EPOCH}') % 7) + 7) % 7
JOIN ov ON ov.event_type = tr.event_type
"""


@register(
    "timeseries_seasonal_decompose",
    oracle=_DECOMP_ORACLE,
    tags=("timeseries", "window", "analytics"),
)
def timeseries_seasonal_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive seasonal decomposition of each event type's daily
    value series: trend = centered 7-ROW moving average over the
    observed daily points (row frame, not a calendar range — pair
    with ``timeseries_gapfill_daily`` first when gaps must count),
    seasonal = day-of-week index (dow mean minus overall mean, dow
    derived by pure day arithmetic (day - epoch) % 7 — no engine
    weekday-numbering or locale dependence), residual = the rest.
    Float parity: every component is a decimal-exact sum followed by
    ONE correctly-rounded division, the composite expressions are
    written identically on both engines, and the outputs go through
    an explicit 6-dp round absorbing compiler-level ulp drift (same
    policy as ``agg_corr_manual``). Shuffle shape: one combinable
    corpus groupBy to the daily table; trend/seasonal/overall and
    both joins all run on (types x days) rows, windows partitioned
    per type."""
    ev = t(spark, sf_dir, "events")
    # daily feeds three consumers (trend window, dow means, overall
    # means) — persist the (types x days)-row table so events is
    # scanned exactly once
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("total")
    ).persist()
    wt = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "total",
        (
            F.sum(F.col("total").cast("decimal(38,6)")).over(wt).cast("double")
            / F.count(F.lit(1)).over(wt)
        ).alias("trend"),
    )
    dow = F.pmod(F.datediff(F.col("day"), F.lit(_EPOCH)), F.lit(7))
    dw = daily.groupBy(
        "event_type", dow.alias("dow")
    ).agg(
        (
            F.sum(F.col("total").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("dow_avg")
    )
    ov = daily.groupBy("event_type").agg(
        (
            F.sum(F.col("total").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("all_avg")
    )
    seasonal = F.col("dow_avg") - F.col("all_avg")
    return (
        tr.withColumn("dow", dow)
        .join(F.broadcast(dw), ["event_type", "dow"])
        .join(F.broadcast(ov), "event_type")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("total", 6).alias("total"),
            F.round("trend", 6).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(
                F.col("total") - F.col("trend") - seasonal, 6
            ).alias("residual"),
        )
    )


_REG_ORACLE = f"""
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxy
  FROM (
    SELECT event_type,
           CAST(date_trunc('day', ts)::DATE - DATE '{_EPOCH}' AS BIGINT) AS x,
           value AS y
    FROM events)
  GROUP BY event_type)
SELECT event_type, n,
       round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 9) AS slope,
       round((sy - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)) * sx)
               / n, 6) AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0),
             9) AS r2
FROM s
"""


@register(
    "agg_linear_regression_per_type",
    oracle=_REG_ORACLE,
    tags=("agg", "stats", "regression"),
)
def agg_linear_regression_per_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-event-type OLS of value against time (days since the epoch
    date): slope, intercept and R^2 from the five classic moment sums
    — the regr_slope/regr_intercept/regr_r2 surface, but with exact
    accumulation: x is an int64 day index (int sums exact), y sums go
    through DECIMAL(38,6) (associative), so the moments are
    bit-identical under any partitioning, unlike the built-ins'
    single-pass float accumulators. One map-combinable groupBy is the
    whole corpus cost. The derived ratios are identical double
    expression chains on both engines with a final explicit round
    (9 dp unit-scale, 6 dp intercept) absorbing ulp-level compiler
    drift — the ``agg_corr_manual`` policy."""
    ev = t(spark, sf_dir, "events")
    x = F.datediff(F.date_trunc("day", F.col("ts")).cast("date"), F.lit(_EPOCH)).cast(
        "bigint"
    )
    y = F.col("value")
    s = ev.select("event_type", x.alias("x"), y.alias("y")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        dec_sum(F.col("y"), "sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        dec_sum(F.col("y") * F.col("y"), "syy"),
        dec_sum(F.col("x") * F.col("y"), "sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    num = n * sxy - sx * sy
    # nullif on every denominator, mirrored in the oracle: a group
    # with one distinct day (zero x-variance) or zero y-variance must
    # yield NULL on BOTH engines — without the guard Spark's non-ANSI
    # division returns NULL while DuckDB's IEEE default returns
    # inf/nan, a latent cross-engine divergence on degenerate groups
    den = F.nullif(n * sxx - sx * sx, F.lit(0))
    slope = num / den
    r2_den = F.nullif(
        (n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0)
    )
    return s.select(
        "event_type",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((num * num) / r2_den, 9).alias("r2"),
    )
