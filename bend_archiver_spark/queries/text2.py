"""TF / TF-IDF text operators for training-data curation.

Extends the text-analysis surface (queries/text.py) with weighted
bag-of-ngrams models: TF-IDF term extraction and TF-vector cosine
near-duplicate detection. Complements the *set*-based similarity
family (dedup_ngram_jaccard, dedup_minhash_lsh) with *count*-weighted
similarity — the two disagree exactly when repetition matters, which
is a standard quality signal for LLM corpora (boilerplate/spam has
high set-overlap AND high repetition).

Exactness conventions (memory: oracle-portability):
- IDF is quantized to integers as ``(1_000_000 * n_docs) div df`` —
  exact integer division in both engines, no transcendental ``ln``
  whose last-ulp behavior is libm-specific.
- All dot products / norms are int64 (token counts are small); the
  only float ops are ``sqrt``/``/`` at the very end, which are
  IEEE-754 correctly rounded and therefore bit-identical in Spark
  and DuckDB.

Scale design: the n-gram explode fans out via ``repartition``
first (small-file inputs otherwise serialize on one core — measured
10x), TF/DF aggregations are map-side-combinable groupBys, the
single-row corpus size and the per-doc norm table are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t

# word n-grams over whitespace tokens, 1-based element_at == DuckDB ws[i]
_BIGRAM_EXPR = """
CASE WHEN size(ws) >= 2 THEN
  transform(sequence(1, size(ws) - 1),
            i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))
ELSE array() END
"""

_TRIGRAM_EXPR = """
CASE WHEN size(ws) >= 3 THEN
  transform(sequence(1, size(ws) - 2),
            i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1),
                        ' ', element_at(ws, i + 2)))
ELSE array() END
"""


def _ngram_tokens(spark: SparkSession, sf_dir: str, gram_expr: str) -> DataFrame:
    """(doc_id, token) pairs: one row per word n-gram occurrence."""
    d = t(spark, sf_dir, "documents")
    # fan out before explode: the documents parquet is a single small
    # file -> one input partition -> explode serializes on one core
    d = d.repartition(spark.sparkContext.defaultParallelism)
    ws = F.split(F.trim(F.lower("text")), r"\s+")
    return d.select("doc_id", ws.alias("ws")).select(
        "doc_id", F.explode(F.expr(gram_expr)).alias("token")
    )


_TFIDF_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i+1])) AS token
  FROM tok),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM bg GROUP BY doc_id, token),
dfreq AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM bg GROUP BY token),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         tf.tf * CAST((1000000 * n.n_docs) // dfreq.df AS BIGINT) AS tfidf_q
  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
SELECT doc_id, token, tf, df, tfidf_q, rn FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf_q DESC, token) AS BIGINT) AS rn
  FROM w)
WHERE rn <= 5
"""


@register(
    "text_tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    tags=("text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most characteristic word bigrams per document by
    quantized TF-IDF (keyword extraction for corpus exploration /
    topic tagging). IDF = (1e6 * N) div df — a linear-idf variant kept
    in exact integer arithmetic end-to-end; ranking ties break on the
    token string, so results are deterministic under any partitioning.
    """
    tok = _ngram_tokens(spark, sf_dir, _BIGRAM_EXPR)
    tf = tok.groupBy("doc_id", "token").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dfreq = tok.groupBy("token").agg(
        F.count_distinct("doc_id").cast("bigint").alias("df")
    )
    n_docs = t(spark, sf_dir, "documents").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    weighted = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf_q", F.col("tf") * F.expr("(1000000 * n_docs) div df"))
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_q"), F.asc("token")
    )
    return (
        weighted.withColumn("rn", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "token", "tf", "df", "tfidf_q", "rn")
    )


_TF_COSINE_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents),
tg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS token
  FROM tok),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tg GROUP BY doc_id, token),
norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS norm_sq
  FROM tf GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM tf a JOIN tf b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, dot,
       na.norm_sq AS norm_a, nb.norm_sq AS norm_b,
       dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine
FROM pairs
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) >= 0.7
"""


@register(
    "text_tf_cosine_pairs",
    oracle=_TF_COSINE_ORACLE,
    tags=("text", "dedup", "similarity"),
)
def text_tf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-weighted near-duplicate pairs: cosine over word-trigram
    TF vectors, threshold 0.7 (the synthetic corpus is cleanly bimodal
    — planted near-dups score >= 0.9, everything else < 0.5). The
    trigram inverted index keeps the candidate join tiny (rare tokens
    only pair the docs that share them); dot/norms stay in exact
    int64, so the final sqrt/divide is bit-identical across engines.

    At 100 TB the same shape holds: the token-keyed equi-join is a
    shuffle on token (skew-bounded because trigram df is small); the
    per-doc norm table is corpus-proportional, so it joins UNHINTED —
    stats/AQE broadcast whichever side is genuinely smaller (usually
    the collision-bounded pair table), and a forced norm broadcast
    would die at 100x.
    """
    # persist the TF table: it feeds the norm aggregation AND both
    # sides of the candidate self-join, and without the barrier each
    # consumer re-runs the corpus tokenize+groupBy — measured 4
    # document scans; with it, ONE. The cache is no bigger than the
    # shuffle the self-join already materializes on disk. Callers
    # clear cache between queries.
    tf = (
        _ngram_tokens(spark, sf_dir, _TRIGRAM_EXPR)
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .persist()
    )
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("norm_sq")
    )
    a, b = tf.alias("a"), tf.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"),
                      F.col("norm_sq").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"),
                      F.col("norm_sq").alias("norm_b"))
    cosine = F.col("dot") / (F.sqrt("norm_a") * F.sqrt("norm_b"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= 0.7)
        .select("doc_a", "doc_b", "dot", "norm_a", "norm_b", "cosine")
    )


_TOPK_NGRAMS_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i+1])) AS token
  FROM tok),
counts AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM bg GROUP BY token)
SELECT token, n_occurrences, n_docs,
       CAST(row_number() OVER (
           ORDER BY n_occurrences DESC, token) AS BIGINT) AS rank
FROM counts
ORDER BY rank
LIMIT 20
"""


@register(
    "text_topk_ngrams",
    oracle=_TOPK_NGRAMS_ORACLE,
    tags=("text", "vocabulary"),
)
def text_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams with occurrence and document
    frequency — the vocabulary-building pass that seeds BPE/merge-rule
    training and boilerplate detection. One map-side-combinable
    groupBy over the exploded n-grams; the global top-k is a
    TakeOrderedAndProject on (count desc, token), so no full sort
    materializes. Ties break on the token string: deterministic under
    any partitioning."""
    tok = _ngram_tokens(spark, sf_dir, _BIGRAM_EXPR)
    counts = tok.groupBy("token").agg(
        F.count("*").cast("bigint").alias("n_occurrences"),
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
    )
    win = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return (
        counts.orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(20)
        .withColumn("rank", F.row_number().over(win).cast("bigint"))
        .select("token", "n_occurrences", "n_docs", "rank")
    )
