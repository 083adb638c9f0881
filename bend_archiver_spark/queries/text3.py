"""Round-6 corpus-statistics text operators.

- ``text_zipf_fit``: Zipf's-law audit — integer OLS of
  floor(log2(total frequency)) against rank OCTAVES, ranks from the
  distributed prefix sum (no SinglePartition sort of the vocabulary).
- ``text_entropy_bits``: per-document quantized Shannon self-entropy
  (the ``text_surprisal_bits`` bit-math applied to the document's OWN
  distribution instead of the corpus distribution).
- ``text_sentence_stats``: sentence segmentation statistics —
  delimiter-split sentence counts and exact mean words per sentence.
- ``dedup_cluster_size_histogram``: the shape of exact-duplicate
  clusters — how much of the corpus sits in clusters of each size,
  the sizing input for a dedup pass.
- ``text_ngram_novelty_rate``: per-document fraction of distinct
  3-grams FIRST seen in that document (global min doc_id owner) —
  the curation-ordering novelty measure.

All arithmetic is exact int64 / bit-math (``length(bin(x)) - 1``
floor-log2, SCALE.md rule 6) with at most one final double division
per reported ratio; no transcendental parity risk anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.prefix import prefix_sum
from .base import fanout, hash64_expr, hash64_sql, ngram_array, register, t

_WS_SQL = r"string_split_regex(trim(lower(text)), '\s+')"


# --- Zipf rank-octave fit ----------------------------------------------

_ZIPF_ORACLE = rf"""
WITH tok AS (
  SELECT unnest({_WS_SQL}) AS token FROM documents),
counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
ranked AS (
  SELECT cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
  FROM counts),
oct AS (
  SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS octave,
         CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(cnt) AS BIGINT) AS total_freq
  FROM ranked GROUP BY 1),
pts AS (
  SELECT octave AS x,
         CAST(length(bin(total_freq)) - 1 AS BIGINT) AS y,
         n_terms, total_freq
  FROM oct),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(n_terms) AS BIGINT) AS n_terms
  FROM pts)
SELECT n AS n_octaves, n_terms,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
               / nullif(n * sxx - sx * sx, 0), 9) AS slope,
       round((sy - (CAST(n * sxy - sx * sy AS DOUBLE)
                    / nullif(n * sxx - sx * sx, 0)) * sx)
               / n, 6) AS intercept
FROM s
"""


@register(
    "text_zipf_fit",
    oracle=_ZIPF_ORACLE,
    tags=("text", "statistics", "zipf"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the corpus vocabulary follow Zipf's law? Terms are ranked
    by (frequency DESC, term) through the DISTRIBUTED prefix sum
    (vocabulary can be corpus-proportional, so the rank must never be
    a SinglePartition row_number — ``operators/prefix.py``), grouped
    into rank OCTAVES via exact floor-log2 bit math, and the
    log-log slope comes from integer OLS over (octave,
    floor(log2(octave total frequency))) — a Zipfian corpus gives
    slope near -1 with NO float logs anywhere: moment sums are exact
    int64 and each reported coefficient is one guarded double chain
    with an explicit round. Corpus cost: one token groupBy; the fit
    runs on ~log2(|vocab|) rows."""
    d = fanout(t(spark, sf_dir, "documents"))
    tok = d.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    )
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    ranked = prefix_sum(
        counts.withColumn("_negcnt", -F.col("cnt")).withColumn(
            "_one", F.lit(1)
        ),
        ["_negcnt", "token"],
        "_one",
        out_col="rank",
        precision="decimal(38,0)",
    ).select("cnt", F.col("rank").cast("bigint").alias("rank"))
    oct_ = ranked.groupBy(
        (F.length(F.bin("rank")) - 1).cast("bigint").alias("octave")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("cnt").cast("bigint").alias("total_freq"),
    )
    pts = oct_.select(
        F.col("octave").alias("x"),
        (F.length(F.bin("total_freq")) - 1).cast("bigint").alias("y"),
        "n_terms",
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum("n_terms").cast("bigint").alias("n_terms"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    num = (n * sxy - sx * sy).cast("double")
    den = F.nullif(n * sxx - sx * sx, F.lit(0))
    slope = num / den
    return s.select(
        F.col("n").alias("n_octaves"),
        "n_terms",
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


# --- quantized per-document self-entropy --------------------------------

_ENTROPY_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest({_WS_SQL}) AS token FROM documents),
wc AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2),
n AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM wc GROUP BY doc_id)
SELECT wc.doc_id, n.n AS n_tokens, n.n_distinct,
       CAST(SUM(wc.c * (length(bin((1000000000 * n.n) // wc.c)) - 1))
            AS BIGINT) AS total_bits,
       round(CAST(SUM(wc.c * (length(bin((1000000000 * n.n) // wc.c))
                              - 1)) AS DOUBLE) / n.n, 6) AS mean_bits
FROM wc JOIN n USING (doc_id)
GROUP BY wc.doc_id, n.n, n.n_distinct
"""


@register(
    "text_entropy_bits",
    oracle=_ENTROPY_ORACLE,
    tags=("text", "quality", "entropy"),
)
def text_entropy_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quantized Shannon self-entropy: each token's
    within-document surprisal floor(log2(1e9 * n / c)) via the exact
    ``length(bin(x)) - 1`` bit identity, averaged over the document —
    the ``text_surprisal_bits`` machinery pointed at the document's
    OWN distribution (low bits = repetitive/templated docs, the
    repetition tail a curation pass cuts). Two map-combinable
    groupBys keyed by (doc, token) then doc; all arithmetic exact
    int64 until the one final division."""
    d = fanout(t(spark, sf_dir, "documents"))
    wc = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias(
                "token"
            ),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = wc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    bits = (
        F.length(F.bin(F.expr("(1000000000 * n) div c"))) - 1
    ).cast("bigint")
    return (
        wc.join(n, "doc_id")
        .groupBy("doc_id", "n", "n_distinct")
        .agg(F.sum(F.col("c") * bits).cast("bigint").alias("total_bits"))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            "n_distinct",
            "total_bits",
            F.round(
                F.col("total_bits").cast("double") / F.col("n"), 6
            ).alias("mean_bits"),
        )
    )


# --- sentence segmentation stats -----------------------------------------

_SENT_ORACLE = r"""
WITH sent AS (
  SELECT doc_id, trim(s) AS s
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(text, '[.!?]+')) AS s
    FROM documents)
  WHERE trim(s) <> ''),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sentences,
         CAST(SUM(len(string_split_regex(s, '\s+'))) AS BIGINT) AS n_words
  FROM sent GROUP BY doc_id)
SELECT doc_id, n_sentences, n_words,
       round(CAST(n_words AS DOUBLE) / n_sentences, 6)
         AS mean_sentence_words
FROM per
"""


@register(
    "text_sentence_stats",
    oracle=_SENT_ORACLE,
    tags=("text", "segmentation"),
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation statistics: split on [.!?]+ runs, drop
    whitespace-only fragments, count sentences and their exact word
    totals per document — the granularity stats in front of
    sentence-level chunking/packing. Map-only until one per-doc
    combinable groupBy; counts exact int64 with one final division."""
    d = fanout(t(spark, sf_dir, "documents"))
    sent = d.select(
        "doc_id",
        F.explode(F.split(F.col("text"), r"[.!?]+")).alias("s0"),
    ).select("doc_id", F.trim("s0").alias("s")).filter(F.col("s") != "")
    per = sent.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
        F.sum(F.size(F.split(F.col("s"), r"\s+")))
        .cast("bigint")
        .alias("n_words"),
    )
    return per.select(
        "doc_id",
        "n_sentences",
        "n_words",
        F.round(
            F.col("n_words").cast("double") / F.col("n_sentences"), 6
        ).alias("mean_sentence_words"),
    )


# --- exact-dup cluster size histogram -------------------------------------


@register(
    "dedup_cluster_size_histogram",
    oracle="""
    WITH cl AS (
      SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS size
      FROM documents GROUP BY 1)
    SELECT size AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(size) AS BIGINT) AS n_docs
    FROM cl GROUP BY size
    """,
    tags=("dedup", "profiling"),
)
def dedup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shape of exact-duplicate clusters: for each cluster size, how
    many clusters and how many documents — the sizing report that
    predicts an exact-dedup pass's yield (docs - clusters = rows
    removed) before running it. Two map-combinable groupBys (content
    hash, then size); at 100 TB both are ordinary combinable shuffles
    with md5 int keys."""
    d = t(spark, sf_dir, "documents")
    cl = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    return cl.groupBy(F.col("size").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("size").cast("bigint").alias("n_docs"),
    )


# --- n-gram novelty rate ---------------------------------------------------

_NOVELTY_ORACLE = rf"""
WITH words AS (
  SELECT doc_id, {_WS_SQL} AS arr FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         {hash64_sql("unnest(list_transform(range(0, greatest(len(arr) - 2, 0)), i -> array_to_string(list_slice(arr, i + 1, i + 3), ' ')))")} AS g
  FROM words),
owner AS (
  SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN owner.first_doc = grams.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(CAST(SUM(CASE WHEN owner.first_doc = grams.doc_id
                           THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 6) AS novelty
FROM grams JOIN owner USING (g)
GROUP BY grams.doc_id
"""


@register(
    "text_ngram_novelty_rate",
    oracle=_NOVELTY_ORACLE,
    tags=("text", "dedup", "curation"),
)
def text_ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty under doc_id arrival order: the fraction
    of a document's distinct 3-grams whose global FIRST occurrence
    (min doc_id) is this document — the measure behind "process novel
    documents first" curation ordering and incremental-crawl yield
    estimates. One distinct-gram explode (hashed to int64 keys), one
    min-owner groupBy, one gram-keyed join back: all shuffles are
    gram-cardinality combinable reduces, never doc x doc."""
    d = fanout(t(spark, sf_dir, "documents"))
    arr = F.split(F.trim(F.lower("text")), r"\s+")
    grams = (
        d.select(
            "doc_id", F.explode(ngram_array(arr, 3)).alias("gram")
        )
        .select("doc_id", hash64_expr(F.col("gram")).alias("g"))
        .distinct()
    )
    owner = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        grams.join(owner, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams"), 6
            ).alias("novelty"),
        )
    )
