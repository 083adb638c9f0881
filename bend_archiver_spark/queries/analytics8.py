"""Round-6 second batch: distributed order-statistic economics,
relational islands, composed seasonal diagnostics, corpus overlap,
cohort value, and multimodal shard packing.

- ``agg_gini_revenue``: Gini coefficient of customer spend per market
  segment, with per-segment ranks derived from ONE global prefix-sum
  rank plus broadcast segment offsets (the ``pipeline_interleave_
  sources`` trick — a per-segment window would sort each
  corpus-proportional segment in one task).
- ``events_runs_encoding``: run-length encoding of consecutive equal
  event types per user (the gaps-and-islands idiom).
- ``timeseries_seasonal_strength``: Hyndman's seasonal-strength
  statistic composed ON TOP of the registered decomposition query —
  operators as building blocks.
- ``text_source_vocab_overlap``: pairwise vocabulary Jaccard between
  sources — the corpus-similarity report before mixing decisions.
- ``orders_cohort_ltv``: classic cohort lifetime-value matrix
  (first-order month x months-since) in exact month integers and
  decimal revenue.
- ``multimodal_shard_pack``: byte-budget shard manifest over the
  binary payloads via the distributed prefix sum — items are never
  split; shard boundaries fall at cumulative-byte multiples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.prefix import grouped_rank, prefix_sum
from .analytics4 import _DECOMP_ORACLE
from .base import dec_sum, hash64_expr, hash64_sql, register, t

_SHARD_BYTES = 65536


# --- Gini per segment, distributed ranks --------------------------------

_GINI_ORACLE = """
WITH spend AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2),
r AS (
  SELECT segment, x,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY x, o_custkey) AS rk
  FROM spend),
s AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(rk * x) AS VARCHAR) AS DOUBLE) AS srx
  FROM r GROUP BY segment)
SELECT segment, n,
       round(2 * srx / (n * sx) - CAST(n + 1 AS DOUBLE) / n, 9) AS gini
FROM s
"""


@register(
    "agg_gini_revenue",
    oracle=_GINI_ORACLE,
    headline=True,
    tags=("agg", "statistics", "inequality"),
)
def agg_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend within each market
    segment — revenue-concentration as a query (0 = equal, ->1 = one
    whale). Uses the rank formulation G = 2*sum(r*x)/(n*sum(x)) -
    (n+1)/n over the (x, custkey) total order. The within-segment
    ranks do NOT come from per-segment windows (segments are
    corpus-proportional — one task each): ONE global prefix-sum rank
    over (segment, x, custkey) minus each segment's broadcast start
    offset gives identical ranks with every phase parallel (the
    ``pipeline_interleave_sources`` offset trick). rank*x products
    follow the linreg pattern (exact decimal re-sum); the statistic
    is one double chain with a 9-dp round."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    # customer is corpus-proportional: no broadcast hint (stats elect
    # broadcast at test scale; at 100x this degrades to a shuffle join
    # instead of dying on the size limit). Found by the round-8
    # structural plan-walk guard — the alias `c` slipped the name ban.
    spend = (
        o.join(c, "o_custkey")
        .groupBy("segment", "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("x")
        )
    )
    # within-segment ranks via the shared grouped_rank helper (global
    # prefix rank minus broadcast offsets); NULL segments are safe
    # here because only WITHIN-group ranks enter the output — see the
    # helper's caller contract
    ranked = grouped_rank(
        spend, "segment", ["x", "o_custkey"], out_col="rk"
    )
    s = (
        ranked.select("segment", "x", "rk")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("x")).cast("double").alias("sx"),
            # rk * x stays in EXACT decimal (bigint * decimal(38,6)),
            # matching the oracle's exact decimal product — a double
            # product here would round differently than DuckDB's
            # decimal multiply
            F.sum((F.col("rk") * F.col("x")).cast("decimal(38,6)"))
            .cast("double")
            .alias("srx"),
        )
    )
    n, sx, srx = F.col("n"), F.col("sx"), F.col("srx")
    gini = 2 * srx / (n * sx) - (n + 1).cast("double") / n
    return s.select("segment", "n", F.round(gini, 9).alias("gini"))


# --- gaps-and-islands run encoding ---------------------------------------


@register(
    "events_runs_encoding",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos
      FROM events)
    SELECT user_id, event_type,
           CAST(MIN(pos) AS BIGINT) AS run_start,
           CAST(COUNT(*) AS BIGINT) AS run_len
    FROM r GROUP BY user_id, event_type, grp
    """,
    tags=("relational", "window", "islands"),
)
def events_runs_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of each user's event stream: maximal runs
    of consecutive equal event types under the (ts, event_id) total
    order — the gaps-and-islands idiom (rn_overall - rn_per_type is
    constant exactly within a run), the relational building block for
    streak/repetition features. Two user-keyed windows sharing one
    exchange plus a combinable rollup; per-user event counts bound
    each sort."""
    ev = t(spark, sf_dir, "events")
    wa = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    r = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(wa).alias("pos"),
        (F.row_number().over(wa) - F.row_number().over(wt)).alias("grp"),
    )
    return (
        r.groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("run_start"),
            F.count(F.lit(1)).cast("bigint").alias("run_len"),
        )
        .drop("grp")
        .select("user_id", "event_type", "run_start", "run_len")
    )


# --- seasonal strength on top of the decomposition ------------------------

_STRENGTH_ORACLE = f"""
WITH decomp AS ({_DECOMP_ORACLE}),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(residual AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sr,
         CAST(CAST(SUM(CAST(residual * residual AS DECIMAL(38,6))) AS VARCHAR)
              AS DOUBLE) AS srr,
         CAST(CAST(SUM(CAST((seasonal + residual) * (seasonal + residual)
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sss,
         CAST(CAST(SUM(CAST(seasonal + residual AS DECIMAL(38,6))) AS VARCHAR)
              AS DOUBLE) AS ss
  FROM decomp GROUP BY event_type)
SELECT event_type, n,
       round(greatest(0.0,
         1 - (srr - sr * sr / n)
               / nullif(sss - ss * ss / n, 0)), 9) AS seasonal_strength
FROM s
"""


@register(
    "timeseries_seasonal_strength",
    oracle=_STRENGTH_ORACLE,
    tags=("timeseries", "diagnostics", "composition"),
)
def timeseries_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hyndman-Athanasopoulos seasonal strength F_s = max(0,
    1 - Var(residual)/Var(seasonal+residual)) per event type — "is
    the day-of-week pattern real or noise" as one number, composed
    directly ON the registered ``timeseries_seasonal_decompose``
    output (operators as building blocks; its components are already
    6-dp-rounded doubles, so both engines aggregate identical
    inputs). Variance moments go through exact decimal re-sums; the
    ratio is one guarded double chain."""
    from .analytics4 import timeseries_seasonal_decompose

    decomp = timeseries_seasonal_decompose(spark, sf_dir)
    sr_col = F.col("seasonal") + F.col("residual")
    s = decomp.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dec_sum(F.col("residual"), "sr"),
        dec_sum(F.col("residual") * F.col("residual"), "srr"),
        dec_sum(sr_col * sr_col, "sss"),
        dec_sum(sr_col, "ss"),
    )
    n = F.col("n")
    var_r = F.col("srr") - F.col("sr") * F.col("sr") / n
    var_s = F.nullif(F.col("sss") - F.col("ss") * F.col("ss") / n, F.lit(0))
    return s.select(
        "event_type",
        "n",
        F.round(F.greatest(F.lit(0.0), 1 - var_r / var_s), 9).alias(
            "seasonal_strength"
        ),
    )


# --- source vocabulary overlap ---------------------------------------------

_TOK_HASH_SQL = hash64_sql(
    r"unnest(string_split_regex(trim(lower(text)), '\s+'))"
)

_VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT source,
         {_TOK_HASH_SQL} AS h
  FROM documents),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab
          FROM tok GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM tok a JOIN tok b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2)
SELECT s.source_a, s.source_b, s.n_shared,
       round(CAST(s.n_shared AS DOUBLE)
               / (sa.vocab + sb.vocab - s.n_shared), 6) AS jaccard
FROM shared s
JOIN sizes sa ON sa.source = s.source_a
JOIN sizes sb ON sb.source = s.source_b
"""


@register(
    "text_source_vocab_overlap",
    oracle=_VOCAB_ORACLE,
    tags=("text", "profiling", "similarity"),
)
def text_source_vocab_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — "how much do my
    corpora overlap" before mixing/weighting decisions. One distinct
    (source, token-hash) projection, a token-keyed self-join whose
    output is bounded by |sources|^2 pair groups, and broadcast vocab
    sizes; never doc x doc. Exact int64 counts with one rounded
    division."""
    d = t(spark, sf_dir, "documents")
    tok = (
        d.select(
            "source",
            F.explode(
                F.split(F.trim(F.lower("text")), r"\s+")
            ).alias("w"),
        )
        .select("source", hash64_expr(F.col("w")).alias("h"))
        .distinct()
        .persist()
    )
    sizes = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab")
    )
    a = tok.select(F.col("source").alias("source_a"), "h")
    b = tok.select(F.col("source").alias("source_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("vocab").alias("va")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("vocab").alias("vb")
    )
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("va") + F.col("vb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


# --- cohort LTV matrix -------------------------------------------------------


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH fo AS (
      SELECT o_custkey,
             MIN(CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                      AS BIGINT)) AS cohort_m
      FROM orders GROUP BY o_custkey)
    SELECT fo.cohort_m AS cohort_month,
           CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                AS BIGINT) - fo.cohort_m AS months_since,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
             AS revenue
    FROM orders o JOIN fo USING (o_custkey)
    GROUP BY 1, 2
    """,
    tags=("relational", "cohort", "ltv"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers bucketed by
    first-order month, revenue and active-customer counts by months
    since acquisition — the (cohort x age) LTV table every retention
    dashboard is built on. Months are exact integers
    (year*12 + month - 1 — no engine interval arithmetic), revenue is
    the decimal-exact sum. Two combinable customer-keyed aggregations
    (first-order, then the matrix rollup) — the events-table twin is
    ``events_cohort_retention``; this is the MONETARY variant over
    orders."""
    o = t(spark, sf_dir, "orders")
    m = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    ).cast("bigint")
    fo = o.groupBy("o_custkey").agg(F.min(m).alias("cohort_m"))
    return (
        o.join(fo, "o_custkey")
        .groupBy(
            F.col("cohort_m").alias("cohort_month"),
            (m - F.col("cohort_m")).alias("months_since"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias(
                "n_customers"
            ),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# --- multimodal shard packing -------------------------------------------------


@register(
    "multimodal_shard_pack",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents),
    c AS (
      SELECT doc_id, n_bytes,
             SUM(n_bytes) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
      FROM b)
    SELECT doc_id, n_bytes,
           CAST(cum - n_bytes AS BIGINT) AS byte_start,
           CAST((cum - 1) // {_SHARD_BYTES} AS BIGINT) AS shard_id
    FROM c
    """,
    tags=("multimodal", "pipeline", "packing"),
)
def multimodal_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget shard manifest for the binary payload column: in
    doc_id order, each blob is assigned to shard floor((cum-1)/64KiB)
    of its inclusive byte prefix — whole blobs only, shard boundaries
    at cumulative-byte multiples (the WebDataset-style tarball
    planning step: the manifest IS the shuffle-free writer plan, each
    shard a contiguous byte range). The cumulative byte total is the
    DISTRIBUTED prefix sum (``operators/prefix.py``) — the byte-space
    twin of ``pipeline_token_budget_shards``'s token packing. Exact
    int64 end to end."""
    d = t(spark, sf_dir, "documents")
    b = d.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias(
            "n_bytes"
        ),
    )
    c = prefix_sum(
        b, ["doc_id"], "n_bytes", out_col="cum", precision="decimal(38,0)"
    ).withColumn("cum", F.col("cum").cast("bigint"))
    return c.select(
        "doc_id",
        "n_bytes",
        (F.col("cum") - F.col("n_bytes")).alias("byte_start"),
        F.expr(f"(cum - 1) div {_SHARD_BYTES}").cast("bigint").alias(
            "shard_id"
        ),
    )
