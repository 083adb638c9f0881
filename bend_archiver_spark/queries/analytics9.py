"""Round-6 third batch: HLL registers, dedup threshold tuning, and
lexical-diversity deciles.

- ``agg_hll_distinct_sketch``: HyperLogLog registers in EXACT bit
  math — the third mergeable-cardinality point after the exact
  distinct and the KMV sketch, reported with the exact count so the
  estimator's error is itself auditable.
- ``dedup_threshold_curve``: near-dup yield as a function of the
  Jaccard threshold, all thresholds answered from ONE exact pair
  table with integer cross-multiplied comparisons.
- ``text_ttr_by_length_decile``: type-token ratio by document-length
  decile (lexical diversity vs length — TTR falls with length, so
  curation cutoffs must be length-conditioned), deciles from
  ``ntile_distributed``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.prefix import ntile_distributed
from .base import hash64_expr, hash64_sql, register, t

# --- HyperLogLog in exact bit math ---------------------------------------

_HLL_M = 64  # registers (p = 6)
_HLL_ALPHA = 0.709  # alpha_64, Flajolet et al. 2007
_POW55 = 1 << 55  # 2^55 written as a literal on both engines
# alpha * m^2 evaluated ONCE in Python and embedded as the same
# double literal on both engines (engine-side 0.709 * 4096 could
# associate/round differently)
_ALPHA_M2 = _HLL_ALPHA * _HLL_M * _HLL_M

_HLL_TOK = r"unnest(string_split_regex(trim(lower(text)), '\s+'))"

_HLL_ORACLE = f"""
WITH tok AS (
  SELECT lang, {hash64_sql(_HLL_TOK)} AS h FROM documents),
rw AS (
  SELECT lang, h % {_HLL_M} AS bucket, h // {_HLL_M} AS w FROM tok),
rho AS (
  SELECT lang, bucket,
         CASE WHEN w > 0 THEN 55 - length(bin(w)) ELSE 55 END AS rho
  FROM rw),
reg AS (
  SELECT lang, bucket, CAST(MAX(rho) AS BIGINT) AS r
  FROM rho GROUP BY 1, 2),
z AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_hit,
         CAST(SUM(1::BIGINT << (55 - r)) AS BIGINT) AS z_present
  FROM reg GROUP BY lang),
exact AS (
  SELECT lang, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_exact
  FROM tok GROUP BY lang)
SELECT z.lang, exact.n_exact, z.n_hit,
       CAST(z.z_present
            + ({_HLL_M} - z.n_hit) * {_POW55} AS BIGINT) AS z_scaled,
       round(CAST({_ALPHA_M2!r} AS DOUBLE) * CAST({_POW55} AS DOUBLE)
               / (z.z_present + ({_HLL_M} - z.n_hit) * {_POW55}), 3)
         AS hll_estimate
FROM z JOIN exact USING (lang)
"""


@register(
    "agg_hll_distinct_sketch",
    oracle=_HLL_ORACLE,
    tags=("agg", "sketch", "mergeable"),
)
def agg_hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token cardinality per language (p = 6, 64
    registers, alpha_64 = 0.709) with the EXACT distinct count beside
    it — the sketch family HLL belongs to, built without a single
    float until the final estimator: bucket = h mod 64, rho = leading
    zeros of the remaining 54 hash bits + 1 via the exact
    ``55 - length(bin(w))`` bit identity, registers = int64 max per
    bucket (idempotent — duplicate tokens cannot move a register, so
    no distinct pass is needed), and the harmonic denominator is the
    exact integer sum of 2^(55-rho) with absent registers contributing
    2^55 (max 64 * 2^55 = 2^61, inside int64). The raw Flajolet
    estimator is ONE double chain with a 3-dp round; no small-range
    correction (it needs ln) — the exact count column IS the audit.
    Registers merge by max, the mergeability that matters at 100 TB:
    per-shard register tables combine without re-touching tokens.
    One map-combinable (lang, bucket) groupBy is the corpus cost."""
    d = t(spark, sf_dir, "documents")
    tok = (
        d.select(
            "lang",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
        )
        .select("lang", hash64_expr(F.col("w")).alias("h"))
        .persist()
    )
    rw = tok.select(
        "lang",
        F.expr(f"h % {_HLL_M}").alias("bucket"),
        F.expr(f"h div {_HLL_M}").alias("w"),
    )
    rho = F.when(
        F.col("w") > 0, F.lit(55) - F.length(F.bin("w"))
    ).otherwise(F.lit(55))
    reg = (
        rw.select("lang", "bucket", rho.alias("rho"))
        .groupBy("lang", "bucket")
        .agg(F.max("rho").cast("bigint").alias("r"))
    )
    z = reg.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - r AS INT))"))
        .cast("bigint")
        .alias("z_present"),
    )
    exact = tok.groupBy("lang").agg(
        F.count_distinct("h").cast("bigint").alias("n_exact")
    )
    z_scaled = F.col("z_present") + (_HLL_M - F.col("n_hit")) * F.lit(
        _POW55
    )
    est = F.lit(_ALPHA_M2) * F.lit(float(_POW55)) / z_scaled
    return (
        z.join(exact, "lang")
        .select(
            "lang",
            "n_exact",
            "n_hit",
            z_scaled.cast("bigint").alias("z_scaled"),
            F.round(est, 3).alias("hll_estimate"),
        )
    )


# --- dedup yield vs threshold ----------------------------------------------


def _curve_oracle() -> str:
    from .dedup import _HTOKS_SQL, _prefix_inter_sql

    # prefix filter at the sweep's MINIMUM threshold (0.5): a pair
    # missing from the candidates has J < 0.5 and can qualify no row
    # of the curve, so the output is exact for every listed threshold
    return f"""
    WITH toks AS MATERIALIZED ({_HTOKS_SQL}),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM toks GROUP BY doc_id),
    {_prefix_inter_sql(0.5)},
    pairs AS (
      SELECT i.doc_a, i.doc_b, i.n_inter,
             sa.n + sb.n - i.n_inter AS n_union
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b),
    th AS (SELECT unnest([5, 6, 7, 8]) AS t10),
    hit AS (
      SELECT th.t10, p.doc_a, p.doc_b
      FROM pairs p JOIN th ON p.n_inter * 10 >= th.t10 * p.n_union),
    docs AS (
      SELECT t10, doc_a AS doc FROM hit
      UNION ALL SELECT t10, doc_b FROM hit)
    SELECT CAST(h.t10 AS DOUBLE) / 10 AS threshold,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST((SELECT COUNT(DISTINCT doc) FROM docs d
                 WHERE d.t10 = h.t10) AS BIGINT) AS n_docs
    FROM hit h GROUP BY h.t10
    """


@register(
    "dedup_threshold_curve",
    oracle=None,  # set below (needs _TOKS_SQL import at def time)
    tags=("dedup", "tuning", "evaluation"),
)
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup yield as a function of the Jaccard threshold (0.5 /
    0.6 / 0.7 / 0.8): pair counts from ONE exact shingle-join pair
    table, every threshold decided by the INTEGER cross-multiplication
    n_inter * 10 >= t * n_union — no float Jaccard ever compared, so a
    boundary pair cannot flip between engines. This is the tuning
    sweep run on a sample before committing a corpus-wide dedup pass
    to a threshold (the ``ann_recall_curve`` pattern applied to dedup
    yield). n_docs counts the distinct documents touched by at least
    one qualifying pair (the candidate-removal pool; the exact
    removable count needs the ``dedup_clusters_keep_one``
    connected-components pass). Pair candidates ride the prefix
    filter at the sweep's MINIMUM threshold (0.5) — exact for every
    listed threshold, since a non-candidate pair has J < 0.5 and can
    qualify nowhere on the curve."""
    from ..operators import dedup as ops
    from ..operators.dedup import hashed_shingle, prefix_filter_candidates

    toks = hashed_shingle(
        t(spark, sf_dir, "documents"), "doc_id", "text"
    ).persist()
    cand = prefix_filter_candidates(toks, 0.5)
    pairs = ops.pair_intersections(toks, cand).select(
        "doc_a",
        "doc_b",
        "n_inter",
        (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
    )
    th = spark.createDataFrame([(x,) for x in (5, 6, 7, 8)], "t10 int")
    hit = (
        pairs.crossJoin(F.broadcast(th))
        .filter(F.col("n_inter") * 10 >= F.col("t10") * F.col("n_union"))
        .persist()
    )
    np = hit.groupBy("t10").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    docs = hit.select("t10", F.col("doc_a").alias("doc")).unionAll(
        hit.select("t10", F.col("doc_b").alias("doc"))
    )
    nd = docs.groupBy("t10").agg(
        F.count_distinct("doc").cast("bigint").alias("n_docs")
    )
    return np.join(nd, "t10").select(
        (F.col("t10").cast("double") / 10).alias("threshold"),
        "n_pairs",
        "n_docs",
    )


from .base import REGISTRY as _REG  # noqa: E402

_REG["dedup_threshold_curve"].oracle = _curve_oracle()


# --- TTR by length decile -----------------------------------------------------

_TTR_ORACLE = rf"""
WITH per AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\s+'))
              AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split_regex(trim(lower(text)),
                                                   '\s+')))
              AS BIGINT) AS n_distinct
  FROM documents),
dec AS (
  SELECT doc_id, n_tokens, n_distinct,
         CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
           AS decile,
         round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS ttr
  FROM per)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(CAST(SUM(CAST(ttr AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
         AS mean_ttr
FROM dec GROUP BY decile
"""


@register(
    "text_ttr_by_length_decile",
    oracle=_TTR_ORACLE,
    tags=("text", "quality", "diversity"),
)
def text_ttr_by_length_decile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lexical diversity conditioned on document length: type-token
    ratio averaged within each length decile — TTR falls
    mechanically with length, so any diversity-based curation cutoff
    must be length-conditioned, and this table is that calibration.
    Deciles come from ``ntile_distributed`` over the (n_chars,
    doc_id) total order (prefix-sum rank + exact int64 bucket
    formula — never a global ntile window); per-doc TTR is one
    rounded division and the decile mean re-sums through exact
    decimal."""
    d = t(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.lower("text")), r"\s+")
    per = d.select(
        "doc_id",
        "n_chars",
        F.size(arr).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(arr)).cast("bigint").alias("n_distinct"),
    )
    dec = ntile_distributed(
        per, ["n_chars", "doc_id"], 10, out_col="decile"
    ).withColumn(
        "ttr",
        F.round(
            F.col("n_distinct").cast("double") / F.col("n_tokens"), 6
        ),
    )
    return dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (
            F.sum(F.col("ttr").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_ttr"),
    )
