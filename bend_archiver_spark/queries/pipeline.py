"""Composed curation pipelines — the end-to-end flows a training-data
engineer actually runs, built from the same operators the individual
queries expose. Both are pure DataFrame compositions with exact
oracles, proving the operators compose without correctness drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textops import quality_scores
from .base import register, t

_MIN_WORDS = 30


@register(
    "pipeline_curate_documents",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_words,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                 w -> list_contains(['the','a','of','and','to','in'], w))) AS n_stop
      FROM documents
    ),
    quality AS (
      SELECT doc_id FROM scored
      WHERE n_words >= {_MIN_WORDS} AND n_words <= 1000
        AND CAST(n_stop AS DOUBLE) / n_words >= 0.01
    ),
    keys AS (
      SELECT d.doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(lower(d.text)), '\\s+'))), ' ')) AS set_key
      FROM documents d JOIN quality q ON d.doc_id = q.doc_id
    ),
    keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM keys GROUP BY set_key
    )
    SELECT k.doc_id, d.lang, d.source, d.n_chars
    FROM keepers k JOIN documents d ON d.doc_id = k.doc_id
    """,
    headline=True,
    tags=("pipeline", "dedup", "quality"),
)
def pipeline_curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline: quality gate -> token-set dedup (keep the
    minimum doc_id per duplicate group) -> curated corpus with
    metadata. Each stage is one of the standalone operators; the
    composition stays a single Catalyst plan (two shuffles: the dedup
    groupBy and the final metadata join)."""
    d = t(spark, sf_dir, "documents")
    quality = (
        quality_scores(d, "doc_id", "text", min_words=_MIN_WORDS)
        .filter("passes_quality")
        .select("doc_id")
    )
    passed = d.join(quality, "doc_id")
    set_key = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
            ),
        )
    )
    keepers = (
        passed.select("doc_id", set_key.alias("set_key"))
        .groupBy("set_key")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return keepers.join(d, "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "pipeline_incremental_dedup",
    oracle="""
    WITH existing AS (
      SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS k
      FROM documents WHERE doc_id < 250
    ),
    incoming AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS k
      FROM documents WHERE doc_id >= 250
    )
    SELECT i.doc_id,
           (e.k IS NOT NULL) AS is_duplicate_of_corpus
    FROM incoming i LEFT JOIN (SELECT DISTINCT k FROM existing) e
      ON i.k = e.k
    """,
    tags=("pipeline", "dedup", "incremental"),
)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: new documents checked against an existing
    corpus by content fingerprint — the nightly-ingest pattern, where
    only the (small) incoming batch shuffles and the corpus side is a
    fingerprint index. Here the corpus is simulated as doc_id < 250."""
    d = t(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    existing = (
        d.filter("doc_id < 250").select(fp.alias("k")).distinct()
    )
    incoming = d.filter("doc_id >= 250").select("doc_id", fp.alias("k"))
    return (
        incoming.join(
            existing.withColumn("hit", F.lit(1)), "k", "left_outer"
        )
        .select(
            "doc_id", F.col("hit").isNotNull().alias("is_duplicate_of_corpus")
        )
    )
