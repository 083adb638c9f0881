"""Training-data curation operators, round 2.

The filters an LLM-data pipeline runs between raw crawl and tokenizer
that round 1 didn't cover yet:

- PII pattern scan + redaction (regexp-based, the pre-tokenization
  scrub pass);
- repetition statistics (the Gopher-style quality signals: duplicate
  word fraction, top-word dominance);
- benchmark-contamination check (n-gram overlap between the corpus and
  a held-out evaluation set — train/test leakage detection);
- semantic keep-one dedup (embedding LSH pairs closed into clusters,
  one representative kept per cluster);
- curation funnel observability (per-stage survivor counts in one
  scan).

All JVM-side; every query has an exact DuckDB oracle. Regexes use
only syntax Java and RE2 interpret identically (character classes,
``+`` — no lookaround, no backrefs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as ops
from ..operators import similarity as sim_ops
from .base import register, t
from .dedup import _COSINE_LSH_SQL, _COSINE_THRESHOLD

_DIGIT_RUN = "[0-9]+"
_N_BENCH = 10  # doc_id < 10 is the held-out "benchmark" set
_CONTAM_NGRAM = 5


@register(
    "text_pii_redact_events",
    oracle=f"""
    WITH scanned AS (
      SELECT event_type,
             len(regexp_extract_all(props, '{_DIGIT_RUN}')) AS n_runs,
             regexp_replace(props, '{_DIGIT_RUN}', '#', 'g') AS redacted
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN n_runs > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS events_with_digits,
           CAST(SUM(n_runs) AS BIGINT) AS total_digit_runs,
           CAST(COUNT(DISTINCT redacted) AS BIGINT) AS n_distinct_redacted
    FROM scanned GROUP BY event_type
    """,
    tags=("curation", "pii"),
)
def text_pii_redact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern scan + redaction over a free-text column: count
    digit-run matches per row, redact them, and report per event type
    how much was scrubbed. The redaction (`regexp_replace`) and the
    scan (`regexp_extract_all`) are single-pass JVM expressions — at
    100 TB this is a map-only stage with one small aggregate on top.
    Real deployments swap the pattern list (emails, phones, SSNs); the
    mechanics are identical."""
    ev = t(spark, sf_dir, "events")
    scanned = ev.select(
        "event_type",
        F.size(F.regexp_extract_all("props", F.lit(_DIGIT_RUN), 0)).alias(
            "n_runs"
        ),
        F.regexp_replace("props", _DIGIT_RUN, "#").alias("redacted"),
    )
    return scanned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("n_runs") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("events_with_digits"),
        F.sum("n_runs").cast("bigint").alias("total_digit_runs"),
        F.countDistinct("redacted").alias("n_distinct_redacted"),
    )


@register(
    "text_repetition_stats",
    oracle=r"""
    WITH words AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents
    ),
    wc AS (
      SELECT doc_id, w, COUNT(*) AS cnt FROM words GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
             AS dup_word_frac,
           CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
             AS top_word_frac
    FROM wc GROUP BY doc_id
    """,
    tags=("curation", "quality"),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction and most-frequent-word dominance — the cheap filters that
    kill boilerplate and degenerate generations before tokenization.
    One explode + two hash aggregations (partial-agg friendly); the
    fractions are exact int/int double divisions, so both engines
    produce bit-identical doubles."""
    d = t(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    words = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
    )
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    return wc.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (
            F.lit(1.0)
            - F.count(F.lit(1)).cast("double") / F.sum("cnt").cast("double")
        ).alias("dup_word_frac"),
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias(
            "top_word_frac"
        ),
    )


@register(
    "text_contamination_check",
    oracle=rf"""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS arr
      FROM documents
    ),
    toks AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(0, greatest(len(arr) - {_CONTAM_NGRAM - 1}, 0)),
               i -> array_to_string(list_slice(arr, i + 1, i + {_CONTAM_NGRAM}), ' ')
             )) AS tok
      FROM words
    ),
    bench AS (SELECT doc_id AS bench_id, tok FROM toks WHERE doc_id < {_N_BENCH}),
    targ AS (SELECT doc_id, tok FROM toks WHERE doc_id >= {_N_BENCH})
    SELECT t.doc_id,
           CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS n_overlap_ngrams,
           CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_benchmark_docs
    FROM targ t JOIN bench b ON b.tok = t.tok
    GROUP BY t.doc_id
    """,
    tags=("curation", "contamination"),
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: corpus documents sharing any
    word {n}-gram with the held-out benchmark set (doc_id < 10 stands
    in for an eval suite). Returns only contaminated documents with
    the overlap volume and how many benchmark docs they touch. The
    benchmark shingle set is tiny by construction, so the join
    broadcasts — at 100 TB the corpus side streams map-only through
    it, which is what makes decontamination tractable at all."""
    d = t(spark, sf_dir, "documents")
    sh = ops.shingle(d, "doc_id", "text", n=_CONTAM_NGRAM)
    bench = sh.filter(F.col("doc_id") < _N_BENCH).select(
        F.col("doc_id").alias("bench_id"), "tok"
    )
    targ = sh.filter(F.col("doc_id") >= _N_BENCH)
    # the contaminated-overlap pairs are tiny by construction (hits
    # against a bounded benchmark); persist them so the two distinct
    # counts below are cache reads, not two corpus-stream passes
    # through the broadcast join
    pairs = (
        targ.join(F.broadcast(bench), "tok")
        .select("doc_id", "tok", "bench_id")
        .persist()
    )
    # SEPARATE single-distinct aggregates: two distincts in one
    # Aggregate go through the Expand rewrite, which doubles the
    # aggregated stream and orders its group ids by per-process
    # expression hash — nondeterministic plan text that broke the
    # recorded fingerprints (PLANS.json). Both aggs hash-partition by
    # doc_id, so the closing join reuses one exchange.
    n_tok = pairs.groupBy("doc_id").agg(
        F.countDistinct("tok").alias("n_overlap_ngrams")
    )
    n_bench = pairs.groupBy("doc_id").agg(
        F.countDistinct("bench_id").alias("n_benchmark_docs")
    )
    return n_tok.join(n_bench, "doc_id")


# lshp and sem_edges are MATERIALIZED: DuckDB 1.0 inlines CTEs per
# reference, and the recursive reach term re-scans sem_edges every
# iteration — without materialization each iteration re-ran the whole
# LSH+cosine pipeline (twice, once per UNION arm), which spilled
# >79 GB of temp at the 10x sweep scale before failing.
_SEMANTIC_CC_ORACLE = f"""
    WITH RECURSIVE lshp AS MATERIALIZED ({_COSINE_LSH_SQL}),
    sem_edges AS MATERIALIZED (
      SELECT vec_a AS a, vec_b AS b FROM lshp
      UNION ALL
      SELECT vec_b AS a, vec_a AS b FROM lshp
    ),
    reach(node, r) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.a, reach.r FROM sem_edges e JOIN reach ON reach.node = e.b
    ),
    comp AS (SELECT node AS vec_id, MIN(r) AS component_id FROM reach GROUP BY node)
    SELECT component_id AS kept_vec_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(COUNT(*) - 1 AS BIGINT) AS duplicates_removed
    FROM comp GROUP BY component_id
"""


@register(
    "dedup_semantic_keep_one",
    oracle=_SEMANTIC_CC_ORACLE,
    tags=("curation", "dedup", "embedding"),
)
def dedup_semantic_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup end-to-end: LSH-gated cosine pairs close into
    clusters (min-label propagation) and each cluster keeps its
    minimum vec_id — the standard SemDeDup-style pass that collapses
    paraphrase groups an exact-hash dedup can't see. All stages are
    the scale paths: banded candidates, exact int64 verify, iterative
    closure with checkpointing."""
    from ..operators.graph import connected_components

    emb = t(spark, sf_dir, "embeddings")
    pairs = sim_ops.cosine_pairs_lsh(
        emb, "vec_id", "embedding", _COSINE_THRESHOLD,
        n_tables=None, n_planes=None,
    ).select("vec_a", "vec_b")
    comp = connected_components(
        pairs, emb.select("vec_id"), src="vec_a", dst="vec_b",
        node_col="vec_id",
    )
    return comp.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("duplicates_removed"),
    ).select(
        F.col("component_id").alias("kept_vec_id"),
        "cluster_size",
        "duplicates_removed",
    )


@register(
    "pipeline_stage_funnel",
    oracle=r"""
    WITH staged AS (
      SELECT n_chars,
             len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
             lang
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_len_ok,
           CAST(SUM(CASE WHEN n_words >= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_words_ok,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lang_ok,
           CAST(SUM(CASE WHEN n_chars BETWEEN 100 AND 500
                          AND n_words >= 30 AND lang = 'en'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
    FROM staged
    """,
    tags=("curation", "pipeline"),
)
def pipeline_stage_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel observability: survivor counts for each filter
    stage (length, word count, language) plus the intersection, in ONE
    scan — conditional aggregation instead of one job per stage. The
    numbers a 100 TB curation run reports after every stage to catch a
    filter suddenly dropping 90% of the corpus."""
    d = t(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.lower("text")), r"\s+"))
    len_ok = F.col("n_chars").between(100, 500)
    words_ok = words >= 30
    lang_ok = F.col("lang") == "en"

    def cnt(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(alias)

    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        cnt(len_ok, "n_len_ok"),
        cnt(words_ok, "n_words_ok"),
        cnt(lang_ok, "n_lang_ok"),
        cnt(len_ok & words_ok & lang_ok, "n_pass_all"),
    )
