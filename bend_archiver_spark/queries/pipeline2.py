"""Second-wave sampling operators for training-data pipelines.

``pipeline_priority_sample`` is priority sampling (Duffield, Lund &
Thorup, JACM 2007): each item gets priority q_i = w_i / u_i with u_i
a unit uniform, the k largest priorities form the sample, and
ŵ_i = max(w_i, τ) — τ the (k+1)-th priority — is an unbiased
estimator of any subset-sum over the original weights. It is THE
weighted-sample-without-replacement for one-pass distributed
settings: no normalization constant, no rejection, mergeable by
keeping the k+1 largest priorities of a union.

Determinism contract: u_i comes from the portable 60-bit md5 hash of
the doc id — u_i = (h+1)/2^60 ∈ (0, 1] — and the priority is computed
as exactly two IEEE-754 double operations, ``(w * 2^60) / (h+1)``.
``w * 2^60`` is exact (w < 2^53) and the division is correctly
rounded, so both engines produce bit-identical priorities, orderings,
and estimator values; "random" sampling with a hash-check-able
oracle.

Scale design: priorities are map-only; the top-(k+1) goes through
``TakeOrderedAndProject`` (per-partition heap + driver merge — never
a global sort); τ is a 1-row broadcast. Total cost: one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import hash64_expr, hash64_sql, register, t

_K = 100
_POW60 = float(2**60)  # exactly representable


@register(
    "pipeline_priority_sample",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, n_chars,
             (CAST(n_chars AS DOUBLE) * 1152921504606846976.0)
               / CAST({hash64_sql("CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
               AS priority
      FROM documents),
    topk1 AS (
      SELECT * FROM pri ORDER BY priority DESC, doc_id LIMIT {_K + 1}),
    tau AS (SELECT MIN(priority) AS tau FROM topk1)
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           priority,
           GREATEST(CAST(n_chars AS DOUBLE), tau) AS est_weight
    FROM topk1, tau WHERE priority > tau
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted priority sample of k=100 documents
    (P[include] ∝≈ n_chars) with the Duffield-Lund-Thorup unbiased
    weight estimator ŵ = max(w, τ). The (k+1)-th priority τ is
    derived from the same top-heap pass that yields the sample, so
    the whole operator is one scan + one TakeOrderedAndProject +
    a 1-row τ broadcast; at 100 TB the per-partition heaps keep
    driver traffic at (k+1)·partitions rows. Unlike
    ``pipeline_hash_sample`` (Bernoulli, unweighted) and
    ``pipeline_temperature_mix`` (per-group quotas), this yields a
    single global sample whose estimator reconstructs subset sums of
    the original weights."""
    d = t(spark, sf_dir, "documents")
    h = hash64_expr(F.col("doc_id").cast("string"))
    pri = d.select(
        "doc_id",
        "n_chars",
        (
            (F.col("n_chars").cast("double") * F.lit(_POW60))
            / (h + F.lit(1)).cast("double")
        ).alias("priority"),
    )
    topk1 = pri.orderBy(F.desc("priority"), F.asc("doc_id")).limit(_K + 1)
    tau = topk1.agg(F.min("priority").alias("tau"))
    return (
        topk1.crossJoin(tau)
        .filter(F.col("priority") > F.col("tau"))
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            "priority",
            F.greatest(
                F.col("n_chars").cast("double"), F.col("tau")
            ).alias("est_weight"),
        )
    )
