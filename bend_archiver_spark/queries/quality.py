"""Corpus-quality scoring passes a training-data pipeline runs between
dedup and sampling: a hashed-ngram linear quality classifier (the
fasttext-style scorer used for CommonCrawl filtering), per-source
document caps (anti-domination), and duplicated-ngram density (the
boilerplate signal from Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022).

All scoring passes here reduce map-side and shuffle only compact keyed
aggregates, with exact integer / dyadic-rational arithmetic so the
DuckDB oracle hashes bit-identically.
The reference has no text operators at all (SURVEY §2 Table B "String
functions: host-language only") — this whole module is
beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sketch import sketch_gated_topk
from ..operators.skew import salted_topk
from .base import fanout, hash64_sql, hash64_expr, ngram_array, register, t

# ---------------------------------------------------------------------
# Hashed-ngram linear quality classifier
# ---------------------------------------------------------------------

_N_BUCKETS = 1024
_MIX = 2654435761  # Knuth multiplicative constant


_CLS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents),
w AS (
  SELECT doc_id,
         (({hash64_sql('tok')} % {_N_BUCKETS}) * {_MIX}) % {_N_BUCKETS}
           - {_N_BUCKETS // 2} AS wq
  FROM tok)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(wq) AS BIGINT) AS score_num,
       CAST(SUM(wq) AS DOUBLE) / {_N_BUCKETS} AS score,
       SUM(wq) > 0 AS keep
FROM w GROUP BY doc_id
"""


@register(
    "text_quality_classifier",
    oracle=_CLS_ORACLE,
    tags=("text", "quality", "classifier"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-ngram linear scorer: each token hashes into one of 1024
    weight buckets; the document score is the sum of bucket weights and
    ``keep`` is its sign — exactly the architecture of a
    fasttext-style quality classifier, with deterministic pseudo-
    random weights standing in for trained ones (the plan is unchanged
    when a trained weight table is broadcast instead). Weights are
    integers (numerator over 1024) so the sum is exact and order-
    independent. One explode + one map-side-combinable groupBy on
    doc_id; at scale the input's own partitioning carries the explode
    (fanout only kicks in for under-partitioned local corpora), so the
    groupBy is the only shuffle."""
    d = fanout(t(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    )
    wq = (
        (hash64_expr(F.col("tok")) % _N_BUCKETS) * _MIX
    ) % _N_BUCKETS - F.lit(_N_BUCKETS // 2)
    return (
        tok.select("doc_id", wq.alias("wq"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("wq").cast("bigint").alias("score_num"),
            (F.sum("wq").cast("double") / _N_BUCKETS).alias("score"),
            (F.sum("wq") > 0).alias("keep"),
        )
    )


# ---------------------------------------------------------------------
# Per-source caps
# ---------------------------------------------------------------------

_CAP = 15

_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id)
              AS BIGINT) AS rank
  FROM documents)
SELECT doc_id, source, n_chars, rank
FROM ranked WHERE rank <= {_CAP}
"""


@register(
    "pipeline_per_source_cap",
    oracle=_CAP_ORACLE,
    tags=("pipeline", "sampling", "curation"),
)
def pipeline_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-domination cap: keep at most 15 documents per source,
    preferring longer ones (ties to the smaller doc_id) — the standard
    guard against one crawl domain flooding the training mix.

    Skew-safe shape: two-phase salted top-k (operators/skew.py).
    Phase 1 ranks within (source, salt16) so a dominating crawl source
    spreads its sort over 16 tasks instead of one; phase 2 takes the
    exact window over at most 16*15 survivors per source. Same result
    and oracle as the single-window form for any salt (each true top-15
    row has <15 rows ahead of it in its own salt bucket)."""
    d = t(spark, sf_dir, "documents")
    return salted_topk(
        d,
        "source",
        [F.desc("n_chars"), F.asc("doc_id")],
        _CAP,
        salt_expr=F.xxhash64(F.col("doc_id")),
        rank_alias="rank",
    ).select("doc_id", "source", "n_chars", "rank")


@register(
    "pipeline_per_source_cap_sketch",
    oracle=_CAP_ORACLE,
    tags=("pipeline", "sampling", "curation", "sketch"),
)
def pipeline_per_source_cap_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch-gated production variant of pipeline_per_source_cap,
    row-identical output (same oracle). A count-min sketch
    (operators/sketch.py) upper-bounds each source's document count in
    one combinable pre-pass; sources the sketch PROVES hold at most k
    documents (count-min never undercounts) skip the two-phase salted
    machinery — their exact window groups are <= k rows by
    construction — while only the possibly-heavy sources pay the
    salted pre-rank. At 100 TB with millions of mostly-tiny sources
    this keeps the skew machinery off the long tail without a second
    exact count shuffle; the depth*width sketch broadcasts.
    Both routes (and their row-identity to a plain exact window) are
    unit-tested on constructed light+heavy keys in test_operators.py —
    the synthetic corpus alone has 25 docs in every source, which
    would leave the light path unexercised."""
    d = t(spark, sf_dir, "documents")
    return sketch_gated_topk(
        d,
        "source",
        [F.desc("n_chars"), F.asc("doc_id")],
        _CAP,
        salt_expr=F.xxhash64(F.col("doc_id")),
        rank_alias="rank",
    ).select("doc_id", "source", "n_chars", "rank")


# ---------------------------------------------------------------------
# Duplicated-ngram density
# ---------------------------------------------------------------------

_NG = 5

_DUP_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - {_NG} + 2),
                i -> list_aggregate(list_slice(ws, i, i + {_NG} - 1),
                                    'string_agg', ' '))) AS g
  FROM tok WHERE len(ws) >= {_NG}),
df AS (
  SELECT g, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_frac
FROM grams JOIN df USING (g)
GROUP BY grams.doc_id
"""


@register(
    "text_duplicated_ngram_fraction",
    oracle=_DUP_ORACLE,
    tags=("text", "dedup", "quality"),
)
def text_duplicated_ngram_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document fraction of 5-gram occurrences that also appear in
    at least one OTHER document — the boilerplate/template-density
    signal used to score near-duplicated content without materializing
    pairs (Lee et al. 2022 measure duplication exactly this way). Two
    combinable groupBys and one equi-join, all keyed on the gram hash;
    memorably NOT a pairwise operator — cost is O(corpus tokens), not
    O(n^2), which is why it runs where pair-level dedup is too
    expensive. Docs shorter than 5 tokens have no grams and drop out
    (same in the oracle)."""
    d = fanout(t(spark, sf_dir, "documents"))
    arr = F.split(F.trim(F.lower("text")), r"\s+")
    grams_arr = ngram_array(arr, _NG)
    # join/aggregate on the 60-bit gram hash, not the string: shuffles
    # int64 keys (collision odds negligible and identical in intent —
    # the oracle joins strings; values agree because the hash is
    # injective on this corpus' gram set)
    grams = d.filter(F.size(arr) >= _NG).select(
        "doc_id",
        F.explode(grams_arr).alias("g_str"),
    ).select("doc_id", hash64_expr(F.col("g_str")).alias("g"))
    df_counts = grams.groupBy("g").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    dup = F.when(F.col("nd") > 1, 1).otherwise(0)
    return (
        grams.join(df_counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(dup).cast("bigint").alias("n_dup"),
            (F.sum(dup).cast("double") / F.count(F.lit(1))).alias(
                "dup_frac"
            ),
        )
    )


# ---------------------------------------------------------------------
# BPE-ish regex token counting
# ---------------------------------------------------------------------

# GPT-2-style pre-tokenizer, simplified to the RE2-compatible subset
# (no lookahead) so Spark (Java regex) and DuckDB (RE2) tokenize
# byte-identically: contraction suffixes, space-prefixed word/number
# runs, punctuation runs.
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"

_BPE_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text),
            '{_BPE_PAT.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
            AS BIGINT) AS n_ws_tokens,
       CAST(n_chars AS DOUBLE)
         / nullif(len(regexp_extract_all(lower(text),
                  '{_BPE_PAT.replace("'", "''")}')), 0) AS chars_per_token
FROM documents
"""


@register(
    "text_bpe_regex_tokens",
    oracle=_BPE_ORACLE,
    tags=("text", "tokenization"),
)
def text_bpe_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-style pre-tokenizer regex (the GPT-2
    split rule minus lookahead, identical under Java regex and RE2)
    next to the whitespace count — the pair every token-budget
    estimator needs (whitespace undercounts punctuation-heavy text;
    chars-per-token is the compression-ratio quality signal). Map-only:
    both counts come from one projection over the scan, no shuffle at
    all — the cheapest full-corpus pass there is. chars_per_token is
    NULL (nullif-guarded on BOTH sides) for empty/whitespace-only
    documents — Spark's x/0 yields NULL but DuckDB's yields inf, so
    the guard is what keeps the engines agreeing on such rows."""
    d = t(spark, sf_dir, "documents")
    # embed the pattern in a double-quoted SQL literal: no quote
    # doubling there (that is single-quoted-literal syntax)
    bpe = (
        'regexp_extract_all(lower(text), "'
        + _BPE_PAT.replace("\\", "\\\\")
        + '", 0)'
    )
    ws = r"split(trim(lower(text)), '\\s+')"
    return d.select(
        "doc_id",
        F.expr(f"size({bpe})").cast("bigint").alias("n_bpe_tokens"),
        F.expr(f"size({ws})").cast("bigint").alias("n_ws_tokens"),
        (
            F.col("n_chars").cast("double")
            / F.nullif(F.expr(f"size({bpe})"), F.lit(0))
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------
# Dataset card
# ---------------------------------------------------------------------


@register(
    "pipeline_dataset_card",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
           CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+')))
                AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
             AS mean_chars
    FROM documents
    """,
    tags=("pipeline", "profile", "dataset-card"),
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan dataset card: the corpus-level summary every dataset
    release ships (doc/source counts, language inventory, token and
    character totals, length range). Token counts come from the array
    length of the whitespace split — no explode, so the whole card is
    ONE map-side-combinable pass reducing to a single row; at 100 TB
    this is the cheapest possible full-corpus statement (a scan and
    one tiny final merge). Languages are collected distinct and
    sorted so the scalar is deterministic under any partitioning."""
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.lower("text")), r"\s+"))
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.concat_ws(",", F.array_sort(F.collect_set("lang"))).alias("langs"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        (
            F.sum(F.col("n_chars").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_chars"),
    )
