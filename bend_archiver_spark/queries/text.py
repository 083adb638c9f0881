"""Text-analysis operators for training-data pipelines.

Beyond-reference surface (BASELINE.json north star): token counting,
quality scoring, language-ID heuristics, and document fingerprinting
over the ``documents`` table — all with exact DuckDB oracles. Every
operator is pure built-in-function Spark (JVM codegen, no Python UDFs)
so the hot path stays vectorized at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import fanout, hash64_expr, hash64_sql, register, t

# A word-ish tokenizer shared by both engines: lowercase, trim,
# split on whitespace. The BPE-ish variant matches word pieces +
# single punctuation, approximating subword segmentation.
_BPE_RE = r"[a-z0-9]+|[^a-z0-9\s]"

_STOPWORDS = ("the", "a", "of", "and", "to", "in")
_SW_SQL = "', '".join(_STOPWORDS)


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split_regex(trim(lower(text)), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS bpe_tokens,
           n_chars,
           CAST(n_chars AS DOUBLE)
             / len(string_split_regex(trim(lower(text)), '\\s+')) AS chars_per_token
    FROM documents
    """,
    headline=True,
    tags=("text", "tokens"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (word pieces / punctuation singletons), chars-per-token density —
    the standard length-based cost estimator for LLM data curation."""
    d = t(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.lower("text")), r"\s+")
    bpe = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), 0)
    return d.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("ws_tokens"),
        F.size(bpe).cast("bigint").alias("bpe_tokens"),
        "n_chars",
        (F.col("n_chars").cast("double") / F.size(ws)).alias("chars_per_token"),
    )


@register(
    "text_quality_scores",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_words,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             w -> list_contains(['{_SW_SQL}'], w))) AS n_stop
      FROM documents
    )
    SELECT doc_id, lang, n_chars, n_words, n_stop,
           CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
           CAST(n_chars AS DOUBLE) / n_words AS avg_word_len,
           (n_words >= 20 AND n_words <= 1000
            AND CAST(n_stop AS DOUBLE) / n_words >= 0.01) AS passes_quality
    FROM scored
    """,
    tags=("text", "quality"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length bounds, stopword ratio, average word
    length, and a pass/fail gate — the Gopher/C4-style heuristic
    filter family, evaluated entirely JVM-side."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower("text")), r"\s+")
    stops = F.filter(
        words, lambda w: w.isin(*_STOPWORDS)
    )
    scored = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(stops).cast("bigint").alias("n_stop"),
    )
    sw_ratio = F.col("n_stop").cast("double") / F.col("n_words")
    return scored.select(
        "doc_id",
        "lang",
        "n_chars",
        "n_words",
        "n_stop",
        sw_ratio.alias("stopword_ratio"),
        (F.col("n_chars").cast("double") / F.col("n_words")).alias("avg_word_len"),
        (
            (F.col("n_words") >= 20)
            & (F.col("n_words") <= 1000)
            & (sw_ratio >= 0.01)
        ).alias("passes_quality"),
    )


@register(
    "text_langid_heuristic",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, lang,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_words,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             w -> list_contains(['{_SW_SQL}'], w))) AS n_en_markers
      FROM documents
    )
    SELECT doc_id, lang AS lang_label,
           CAST(n_en_markers AS DOUBLE) / n_words AS en_marker_ratio,
           CASE WHEN CAST(n_en_markers AS DOUBLE) / n_words >= 0.02
                THEN 'en' ELSE 'und' END AS lang_guess
    FROM feat
    """,
    tags=("text", "langid"),
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by marker-token frequency (n-gram/stopword
    heuristic family). The synthetic corpus shares one vocabulary
    across the ``lang`` labels, so the interesting output is the
    deterministic feature + decision pipeline, not label recovery."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower("text")), r"\s+")
    markers = F.filter(words, lambda w: w.isin(*_STOPWORDS))
    feat = d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        F.size(words).alias("n_words"),
        F.size(markers).alias("n_en_markers"),
    )
    ratio = F.col("n_en_markers").cast("double") / F.col("n_words")
    return feat.select(
        "doc_id",
        "lang_label",
        ratio.alias("en_marker_ratio"),
        F.when(ratio >= 0.02, F.lit("en")).otherwise(F.lit("und")).alias("lang_guess"),
    )


_NORM_SQL = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"
_FP_ORACLE = f"""
    SELECT doc_id,
           md5({_NORM_SQL}) AS content_md5,
           {hash64_sql(_NORM_SQL)} AS content_hash64,
           {hash64_sql(f"substr({_NORM_SQL}, 1, 64)")} AS prefix_hash64
    FROM documents
    """


@register(
    "text_fingerprint",
    oracle=_FP_ORACLE,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whitespace-normalized content hashes
    (full md5, portable 60-bit hash, and a prefix hash for cheap
    rolling-style prefix comparison). The 60-bit hash is identical in
    Spark and DuckDB (md5-hex arithmetic, queries/base.py)."""
    d = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        hash64_expr(norm).alias("content_hash64"),
        hash64_expr(F.substring(norm, 1, 64)).alias("prefix_hash64"),
    )


@register(
    "text_length_histogram",
    # integer bucket arithmetic (no width_bucket: not portable),
    # buckets of 50 chars capped at 600+
    oracle="""
    SELECT LEAST(n_chars // 50, 12) * 50 AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY 1
    """,
    tags=("text", "profile"),
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width document-length histogram (50-char buckets, capped
    at 600+) — the length-distribution profile that picks truncation
    and packing thresholds for a training corpus. Pure integer bucket
    arithmetic (portable, no float edges), one map-side-combinable
    groupBy."""
    d = t(spark, sf_dir, "documents")
    bucket = F.least(F.expr("n_chars div 50"), F.lit(12)) * 50
    return d.groupBy(bucket.alias("bucket_lo")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@register(
    "text_fuzzy_match_parts",
    # Oracle mirrors the Spark side's symmetric-delete candidate
    # generation (round 9): the previous naive block-pair join was
    # ~n^2/6 levenshtein calls (p_type has 6 values) — fine to sf0.1,
    # ~3.3B calls at the 10x sweep scale. Same exactness argument as
    # the Spark docstring below: every edit-distance<=2 pair shares a
    # <=2-deletion variant, and the final levenshtein filter removes
    # false candidates, so the result set is identical to the naive
    # join's. MATERIALIZED: v is self-joined (two references).
    oracle="""
    WITH v AS MATERIALIZED (
      SELECT p_partkey, p_type, p_name,
             unnest(list_distinct(
               [p_name]
               || list_transform(range(1, len(p_name) + 1), i ->
                    substr(p_name, 1, i - 1) || substr(p_name, i + 1))
               || flatten(list_transform(range(1, len(p_name) + 1), i ->
                    list_transform(range(i + 1, len(p_name) + 1), j ->
                      substr(p_name, 1, i - 1)
                      || substr(p_name, i + 1, j - i - 1)
                      || substr(p_name, j + 1))))
             )) AS var
      FROM part
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.p_partkey AS key_a, a.p_name AS name_a,
                      b.p_partkey AS key_b, b.p_name AS name_b
      FROM v a
      JOIN v b ON a.p_type = b.p_type AND a.var = b.var
              AND a.p_partkey < b.p_partkey AND a.p_name <> b.p_name
    )
    SELECT key_a, key_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 2
    """,
    tags=("text", "fuzzy", "entity-resolution"),
)
def text_fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (entity resolution): candidate pairs are
    generated only within a blocking key (p_type) and scored with
    exact Levenshtein edit distance — the classic near-identical-name
    detector for catalog/metadata dedup. The block-key equijoin keeps
    candidates O(sum of block sizes squared / blocks), never a global
    cross product; at 100 TB the blocking key is the thing you tune
    (add more columns, or LSH over name shingles for fuzzier blocks).
    Edit distance is integer-exact in both engines.

    Candidate generation is **symmetric-delete (SymSpell) blocking**,
    not block-pair enumeration: every name emits its <=2-deletion
    variants (1 + L + L(L-1)/2 keys, ~80 for these short names), and
    candidates are pairs sharing a (p_type, variant) key. Exactness:
    take an optimal alignment with s substitutions, i insertions, d
    deletions (s+i+d <= 2); deleting the substituted+deleted positions
    from one name (s+d <= 2 deletions) and the substituted+inserted
    positions from the other (s+i <= 2) reaches the same aligned
    subsequence, so every true pair shares a variant. This makes the
    candidate count O(near-duplicate pairs), independent of block
    sizes — the coarse-block failure mode (p_type has only 6 values
    here, so block-pair enumeration is ~n^2/6; a length-bucket second
    dimension barely helps because these names span 7-12 chars) is
    gone, and the thresholded ``levenshtein(a, b, 2)`` DP runs only on
    deduplicated candidates. For long strings the explode factor L^2/2
    is the knob to watch — segment-based (PassJoin-style) blocking
    replaces it past ~100 chars."""
    p = fanout(
        t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_type")
    )
    # all strings reachable by deleting 0, 1, or 2 characters
    dels = F.expr(
        """
        array_distinct(concat(
          array(p_name),
          transform(sequence(1, length(p_name)), i ->
            concat(substring(p_name, 1, i-1), substring(p_name, i+1, 100))),
          flatten(transform(sequence(1, length(p_name)), i ->
            case when i < length(p_name) then
              transform(sequence(i+1, length(p_name)), j ->
                concat(substring(p_name, 1, i-1),
                       substring(p_name, i+1, j-i-1),
                       substring(p_name, j+1, 100)))
            else array() end))
        ))
        """
    )
    keyed = p.select(
        "p_partkey", "p_name", "p_type", F.explode(dels).alias("v")
    )
    a = keyed.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "p_type",
        "v",
    )
    b = keyed.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        "p_type",
        "v",
    )
    cand = (
        a.join(b, ["p_type", "v"])
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.col("name_a") != F.col("name_b"))
        )
        # near pairs share many variants; dedup before the DP
        .dropDuplicates(["key_a", "key_b"])
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), 2)
    return cand.filter((dist >= 0) & (dist <= 2)).select(
        "key_a",
        "key_b",
        "name_a",
        "name_b",
        dist.cast("bigint").alias("edit_dist"),
    )
