"""Composed curation rehearsal: quality rules + MinHash-LSH near-dup
dedup chained end-to-end, reported as a per-source funnel.

This is the round-7 composition the round-6 verdict suggested — the
two heaviest curation stages (`text_gopher_quality_rules` and
`dedup_minhash_lsh`) in ONE lazy Catalyst DAG: the near-dup signature
work runs only over quality survivors (filter pushdown through the
whole signature pipeline), and the output is the per-source survivor
funnel a production run records. Where `pipeline_curate_v2` chains
model-based scores with EXACT keep-one dedup, this pipeline exercises
the banded-LSH NEAR-dup path inside a composition — the shape a real
100 TB pre-training curation run has (reference: the engine archives
rows; a training-data engine must also curate them — SURVEY.md
"beyond-reference" scope).

Drop rule: a verified near-dup pair (a, b) with a < b drops b — the
greedy keep-lowest-id rule. Deterministic on both engines because the
verified pair set is bit-identical (pure int64 minhash arithmetic,
exact-Jaccard verification on the same 60-bit shingle hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as ops
from .base import hash64_expr, hash64_sql, register, t
from .dedup import (
    _band_union_sql,
    _CC_CTE,
    _JACCARD_THRESHOLD,
    _minhash_sig_sql,
    _N_BANDS,
    _P,
    _PERMS,
)
from .quality2 import _GOPHER_ORACLE, gopher_flags

_CURATE_DEDUP_ORACLE = rf"""
WITH gm AS ({_GOPHER_ORACLE}),
base AS MATERIALIZED (
  SELECT d.doc_id, d.source, d.text, gm.n_words, gm.keep
  FROM documents d JOIN gm USING (doc_id)),
dq AS (SELECT doc_id, text FROM base WHERE keep),
toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(0, greatest(len(arr) - 2, 0)),
                i -> array_to_string(list_slice(arr, i + 1, i + 3), ' ')))
           AS tok
  FROM (SELECT doc_id,
               string_split_regex(trim(lower(text)), '\s+') AS arr
        FROM dq)),
h AS MATERIALIZED (
  SELECT doc_id, ({hash64_sql('tok')} % {_P}) AS hv FROM toks),
{_minhash_sig_sql()},
bands AS MATERIALIZED ({_band_union_sql()}),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
doclists AS MATERIALIZED (
  -- list_intersect verify: distinct-set semantics, matching the
  -- Spark side's array_intersect even on a mod-P collision
  SELECT doc_id, list(hv) AS lst FROM h GROUP BY doc_id),
inter AS (
  SELECT doc_a, doc_b, n_inter FROM (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(la.lst, lb.lst)) AS BIGINT)
             AS n_inter
    FROM cand c
    JOIN doclists la ON la.doc_id = c.doc_a
    JOIN doclists lb ON lb.doc_id = c.doc_b)
  WHERE n_inter > 0),
drops AS (
  SELECT DISTINCT i.doc_b AS doc_id
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter)
          >= {_JACCARD_THRESHOLD})
SELECT b.source,
       COUNT(*) AS n_input,
       CAST(SUM(CASE WHEN b.keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality,
       CAST(SUM(CASE WHEN b.keep AND dr.doc_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dropped,
       CAST(SUM(CASE WHEN b.keep AND dr.doc_id IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
       CAST(COALESCE(SUM(CASE WHEN b.keep AND dr.doc_id IS NULL
                              THEN b.n_words END), 0) AS BIGINT)
         AS final_words
FROM base b LEFT JOIN drops dr USING (doc_id)
GROUP BY 1
"""


@register(
    "pipeline_curate_near_dedup",
    oracle=_CURATE_DEDUP_ORACLE,
    tags=("pipeline", "curation", "dedup", "composition"),
)
def pipeline_curate_near_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-filter -> MinHash-LSH near-dup drop -> per-source
    funnel, composed lazily into one DAG.

    Scale shape: the Gopher flags are computed INLINE on the document
    scan (``gopher_flags`` — one map-only projection; joining a
    separately computed corpus-sized rule table here would cost two
    corpus shuffles for what one scan derives); the signature pipeline
    (shingle hash minima, banding, candidate join, exact
    verification) runs ONLY over quality survivors because the filter
    sits upstream of the persisted shingle barrier; the drop set is
    pair-bounded (band collisions that verified), far below corpus
    size, so the anti-join side stays small; the funnel itself is ONE
    map-combinable groupBy over (source). No stage materializes
    between stages except the documented signature barrier."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    base = gopher_flags(d).select(
        "doc_id", "source", "text", "n_words", "keep"
    )
    dq = base.filter("keep").select("doc_id", "text")
    pairs = ops.minhash_lsh_dedup(
        dq,
        "doc_id",
        "text",
        threshold=_JACCARD_THRESHOLD,
        perms=_PERMS,
        n_bands=_N_BANDS,
        persist_shingles=True,
    )
    drops = (
        pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("dropped", F.lit(1))
    )
    flagged = base.join(drops, "doc_id", "left")
    is_final = F.col("keep") & F.col("dropped").isNull()
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_input"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_quality"),
            F.sum(
                F.when(F.col("keep") & F.col("dropped").isNotNull(), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_near_dropped"),
            F.sum(F.when(is_final, 1).otherwise(0))
            .cast("bigint")
            .alias("n_final"),
            F.coalesce(
                F.sum(F.when(is_final, F.col("n_words"))), F.lit(0)
            )
            .cast("bigint")
            .alias("final_words"),
        )
    )


# ---------------------------------------------------------------------
# Leakage-safe train/val/test split (split by near-dup CLUSTER)
# ---------------------------------------------------------------------

_LSS_ORACLE = rf"""
{_CC_CTE},
assigned AS (
  SELECT doc_id, component_id,
         CASE
           WHEN {hash64_sql('CAST(component_id AS VARCHAR)')} % 100 < 80
             THEN 'train'
           WHEN {hash64_sql('CAST(component_id AS VARCHAR)')} % 100 < 90
             THEN 'val'
           ELSE 'test'
         END AS split,
         CASE
           WHEN {hash64_sql('CAST(doc_id AS VARCHAR)')} % 100 < 80
             THEN 'train'
           WHEN {hash64_sql('CAST(doc_id AS VARCHAR)')} % 100 < 90
             THEN 'val'
           ELSE 'test'
         END AS naive_split
  FROM comp),
per_cluster AS (
  SELECT component_id, split,
         COUNT(*) AS n_docs,
         COUNT(DISTINCT naive_split) AS n_naive_splits
  FROM assigned GROUP BY 1, 2)
SELECT split,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(CASE WHEN n_naive_splits > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_naive_leaky_clusters
FROM per_cluster
GROUP BY 1
"""


@register(
    "pipeline_leakage_safe_split",
    oracle=_LSS_ORACLE,
    tags=("pipeline", "sampling", "dedup", "composition"),
)
def pipeline_leakage_safe_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train/val/test assignment keyed on the portable hash of each
    document's NEAR-DUP CLUSTER label rather than the document id —
    the standard guard against eval contamination: two near-duplicates
    can never land in different splits, because their whole connected
    component shares one hash. `pipeline_train_val_test` is the naive
    per-document form; this query also audits it, counting per split
    how many multi-document clusters the naive split would have
    scattered across split boundaries (`n_naive_leaky_clusters` — the
    leakage this operator exists to prevent; for the cluster split
    itself the spanning count is exactly zero by construction, pinned
    by a property test).

    Scale shape: Jaccard pairs ride the prefix-filtered candidate
    join (rarest-first prefixes — exact, and hot tokens never enter
    the join); components is the iterative
    min-label loop with checkpointed lineage (rounds bounded by
    cluster diameter); after that everything is two map-combinable
    groupBys over (component, split) then (split) — no window, no
    driver collection. The DuckDB oracle computes the same fixpoint
    with a recursive CTE and the identical md5-prefix hash split."""
    from ..operators.graph import connected_components

    d = t(spark, sf_dir, "documents")
    pairs = ops.jaccard_pairs(
        ops.hashed_shingle(d, "doc_id", "text"), _JACCARD_THRESHOLD
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs, d.select("doc_id"))

    def bucket_split(col):
        b = hash64_expr(col.cast("string")) % 100
        return (
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        )

    assigned = comp.select(
        "doc_id",
        "component_id",
        bucket_split(F.col("component_id")).alias("split"),
        bucket_split(F.col("doc_id")).alias("naive_split"),
    )
    per_cluster = assigned.groupBy("component_id", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("naive_split").alias("n_naive_splits"),
    )
    return per_cluster.groupBy("split").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum(F.when(F.col("n_naive_splits") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_naive_leaky_clusters"),
    )
