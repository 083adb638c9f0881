"""Positional retrieval + exact-substring dedup coverage.

``text_phrase_search`` evaluates a multi-term PHRASE query the way a
positional inverted index does: per-term posting lists carrying token
positions, chained on (doc, pos+offset) equi-joins — adjacency is a
join key, never a regex rescan of the corpus. This is the querying
counterpart of ``text_bm25_search`` (bag-of-words scoring) — together
they cover the two retrieval primitives a document store needs.

``dedup_span_coverage`` is the Lee et al. 2022 exact-substring dedup
measure: the fraction of each document's TOKEN POSITIONS covered by
some N-gram that also occurs verbatim in another document — i.e. how
much of the doc an exact-substring deduplicator would delete.
Distinct from ``text_duplicated_ngram_fraction``, which counts
duplicated gram OCCURRENCES: overlapping duplicated grams are not
double-counted here, because coverage unions the spans first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import fanout, hash64_expr, hash64_sql, ngram_array, register, t

# the phrase to search; chained generically so a k-term phrase is k-1
# positional joins
_PHRASE = ("table", "hash")

_WS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"

_PHRASE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest({_WS_SQL}) AS tok,
         generate_subscripts({_WS_SQL}, 1) AS pos
  FROM documents)
SELECT t0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM tok t0 JOIN tok t1
  ON t0.doc_id = t1.doc_id AND t1.pos = t0.pos + 1
WHERE t0.tok = '{_PHRASE[0]}' AND t1.tok = '{_PHRASE[1]}'
GROUP BY t0.doc_id
"""


@register(
    "text_phrase_search",
    oracle=_PHRASE_ORACLE,
    tags=("text", "retrieval", "index"),
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase match ("table hash") via positional posting
    lists: tokenize once with positions (posexplode), filter each
    term's postings BEFORE any join (term selectivity is the whole
    point of an inverted index), then chain adjacency as
    (doc_id, pos + i) equi-joins — k-term phrases cost k-1 hash joins
    over term-sized posting lists, never a corpus rescan or a regex
    over full documents. At 100 TB the posting lists are the
    materialized index; here they are built in-flight from the same
    one tokenize pass. Position arithmetic uses only OFFSETS, so
    Spark's 0-based posexplode and the oracle's 1-based
    generate_subscripts agree exactly."""
    d = fanout(t(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower("text")), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    out = toks.filter(F.col("tok") == _PHRASE[0]).select("doc_id", "pos")
    for i, term in enumerate(_PHRASE[1:], start=1):
        nxt = toks.filter(F.col("tok") == term).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        out = out.join(nxt, ["doc_id", "pos"])
    return out.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches")
    )


_SPAN_N = 8  # gram length for exact-substring coverage

_SPAN_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_WS_SQL} AS ws FROM documents),
gl AS (
  SELECT doc_id,
         list_transform(range(1, len(ws) - {_SPAN_N} + 2),
                        i -> list_aggregate(
                               list_slice(ws, i, i + {_SPAN_N} - 1),
                               'string_agg', ' ')) AS gs
  FROM tok WHERE len(ws) >= {_SPAN_N}),
grams AS (
  SELECT doc_id, unnest(gs) AS g,
         generate_subscripts(gs, 1) - 1 AS s
  FROM gl),
dupg AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT doc_id, s + x AS p
  FROM grams JOIN dupg USING (g)
  CROSS JOIN (SELECT unnest(range(0, {_SPAN_N})) AS x)),
covc AS (SELECT doc_id, COUNT(*) AS n_cov FROM cov GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_cov, 0) AS BIGINT) AS n_cov,
       CAST(COALESCE(n_cov, 0) AS DOUBLE) / len(ws) AS coverage
FROM tok t LEFT JOIN covc ON t.doc_id = covc.doc_id
"""


@register(
    "dedup_span_coverage",
    oracle=_SPAN_ORACLE,
    tags=("dedup", "text", "spans"),
)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup coverage (Lee et al. 2022): per document,
    the fraction of token positions lying inside at least one
    8-gram that occurs verbatim in >= 2 distinct documents —
    the amount of text exact-substring deduplication would remove.
    Overlapping duplicated grams are unioned (DISTINCT on (doc, pos))
    before counting, so the number is true positional coverage, not
    occurrence inflation. Cost is O(corpus tokens): one posexplode
    over the gram array, a map-combinable distinct-doc count per
    60-bit gram hash, an equi-join back on that hash, and a bounded
    x8 position explode of only the DUPLICATED occurrences —
    never document pairs (the suffix-array the paper builds serves
    the same query; the gram-join is its shuffle-friendly
    formulation). Docs shorter than 8 tokens have zero
    coverage and survive via the left join, same as the oracle."""
    d = fanout(t(spark, sf_dir, "documents"))
    arr = F.split(F.trim(F.lower("text")), r"\s+")
    base = d.select("doc_id", F.size(arr).alias("n_tokens"))
    grams = (
        d.filter(F.size(arr) >= _SPAN_N)
        .select("doc_id", F.posexplode(ngram_array(arr, _SPAN_N)).alias("s", "g_str"))
        .select("doc_id", "s", hash64_expr(F.col("g_str")).alias("g"))
    )
    dupg = (
        grams.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    cov = (
        grams.join(dupg, "g")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + (_SPAN_N - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_cov"))
    )
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("n_cov"), F.lit(0)).cast("bigint").alias("n_cov"),
        (
            F.coalesce(F.col("n_cov"), F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------
# Exact-substring dedup REMOVAL (keep-first, cleaned-text rebuild)
# ---------------------------------------------------------------------

# (doc_id, start) packed into one int64 for the keeper argmin: start
# fits 2^20 (docs are far below a million tokens) and doc_id stays
# below 2^43 even at the 10x rehearsal offsets, so the packed key is
# exact and its MIN is the lexicographic (doc_id, start) minimum.
_KEY_SHIFT = 1 << 20
_EMPTY_MD5 = "d41d8cd98f00b204e9800998ecf8427e"  # md5("")

_REMOVE_ORACLE = f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, {_WS_SQL} AS ws FROM documents),
gl AS (
  SELECT doc_id,
         list_transform(range(1, len(ws) - {_SPAN_N} + 2),
                        i -> list_aggregate(
                               list_slice(ws, i, i + {_SPAN_N} - 1),
                               'string_agg', ' ')) AS gs
  FROM tok WHERE len(ws) >= {_SPAN_N}),
grams AS MATERIALIZED (
  SELECT doc_id, {hash64_sql('g')} AS g, s FROM (
    SELECT doc_id, unnest(gs) AS g,
           generate_subscripts(gs, 1) - 1 AS s
    FROM gl)),
gstat AS (
  SELECT g, MIN(doc_id * {_KEY_SHIFT} + s) AS first_key
  FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
rem AS (
  SELECT DISTINCT doc_id, s + x AS p
  FROM grams JOIN gstat USING (g)
  CROSS JOIN (SELECT unnest(range(0, {_SPAN_N})) AS x)
  WHERE doc_id * {_KEY_SHIFT} + s <> first_key),
remlist AS MATERIALIZED (
  -- per-doc removed positions as a LIST: rem touches only the docs
  -- that lost at least one token (a few % of the corpus), so the
  -- expensive rebuild below runs on those docs alone. The previous
  -- formulation exploded EVERY doc into (tok, p) rows, anti-joined,
  -- and re-assembled with md5(string_agg(.. ORDER BY p)) — DuckDB
  -- 1.0 buffers the whole ordered-aggregate input in non-spillable
  -- memory, which OOMed the 48 GB oracle cap at the 100x corpus
  -- (26M token rows) while every other stage ran in seconds.
  SELECT doc_id, list(p) AS rl FROM rem GROUP BY doc_id),
cleaned AS (
  -- array-native rebuild, map-side per doc AND linear in doc length:
  -- the sorted 0-based removal list rl becomes slice boundaries
  -- b = [-1] + sort(rl) + [len(ws)], and the kept text is the
  -- concatenation of the inter-boundary slices ws[b[k]+2 .. b[k+1]]
  -- (1-based inclusive = 0-based positions b[k]+1 .. b[k+1]-1).
  -- Total slice work is sum of segment lengths = O(len(ws)); the
  -- previous list_contains(rl, i-1)-per-position form degraded to
  -- O(len(ws)*len(rl)) on heavily-duplicated long docs. Identical to
  -- string_agg(tok, ' ' ORDER BY p) because ws IS the position order
  -- and rl is DISTINCT.
  SELECT doc_id,
         CAST(len(ws) - len(rl) AS BIGINT) AS n_kept,
         -- inner COALESCE: DuckDB's array_to_string returns NULL
         -- (not '') for an empty list, and a fully-removed doc must
         -- hash to md5('') exactly like the Spark side
         md5(COALESCE(array_to_string(
           flatten(list_transform(range(1, len(b)),
             k -> list_slice(ws, b[k] + 2, b[k + 1]))), ' '),
           '')) AS cleaned_hash
  FROM (
    SELECT t.doc_id, ws, rl,
           list_concat(list_prepend(-1, list_sort(rl)),
                       [len(ws)]) AS b
    FROM tok t JOIN remlist USING (doc_id))),
remc AS (SELECT doc_id, CAST(len(rl) AS BIGINT) AS n_removed
         FROM remlist)
SELECT t.doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_removed, 0) AS BIGINT) AS n_removed,
       CAST(COALESCE(c.n_kept, len(ws)) AS BIGINT) AS n_kept,
       COALESCE(c.cleaned_hash,
                md5(array_to_string(ws, ' '))) AS cleaned_hash
FROM tok t
LEFT JOIN remc USING (doc_id)
LEFT JOIN cleaned c USING (doc_id)
"""


@register(
    "dedup_exact_substring_removal",
    oracle=_REMOVE_ORACLE,
    tags=("dedup", "text", "spans"),
)
def dedup_exact_substring_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-substring dedup as a TRANSFORMATION (Lee et al. 2022),
    not just the coverage measure: every token position inside an
    8-gram that occurs verbatim in >= 2 distinct documents is removed
    EXCEPT in the gram's globally first occurrence (minimum
    (doc_id, start) — the keep-first rule), and the cleaned document
    is rebuilt from the surviving positions in order. The output
    fingerprints the rebuilt text (md5 over the rejoined tokens) so
    the whole removal pipeline — not just the counts — is
    hash-checked against the oracle.

    Scale shape: O(corpus tokens), never document pairs — one gram
    groupBy for the keeper argmin (packed-int64 min, map-combinable),
    an equi-join back on the 60-bit gram hash, a x8 positional
    explode of only the non-keeper duplicated occurrences, one
    anti-join, and a per-document rebuild groupBy whose state is
    bounded by document length. The same shuffle inventory as
    ``dedup_span_coverage`` plus the rebuild pass."""
    d = fanout(t(spark, sf_dir, "documents"))
    arr = F.split(F.trim(F.lower("text")), r"\s+")
    base = d.select("doc_id", F.size(arr).cast("bigint").alias("n_tokens"))
    grams = (
        d.filter(F.size(arr) >= _SPAN_N)
        .select(
            "doc_id",
            F.posexplode(ngram_array(arr, _SPAN_N)).alias("s", "g_str"),
        )
        .select("doc_id", "s", hash64_expr(F.col("g_str")).alias("g"))
    )
    # runtime guard on the packing preconditions: the oracle packs the
    # same way, so a silent overflow (doc over 2^20 tokens, or a
    # doc_id at/above 2^43 making doc_id*2^20+s inexact in int64)
    # would corrupt BOTH sides identically and the hash check could
    # never catch it. The guard lives INSIDE the key expression (not a
    # detached assert_true column) so column pruning cannot drop it.
    key = F.when(
        (F.col("s") < _KEY_SHIFT) & (F.col("doc_id") < (1 << 43)),
        F.col("doc_id") * _KEY_SHIFT + F.col("s"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "dedup_exact_substring_removal: (doc_id, start) "
                    "packing overflow — need start < 2^20 and "
                    "doc_id < 2^43, got doc_id="
                ),
                F.col("doc_id").cast("string"),
                F.lit(" start="),
                F.col("s").cast("string"),
            )
        )
    )
    gstat = (
        grams.groupBy("g")
        .agg(
            F.count_distinct("doc_id").alias("nd"),
            F.min(key).alias("first_key"),
        )
        .filter(F.col("nd") >= 2)
        .select("g", "first_key")
    )
    # persist the removed-positions table: it is consumed TWICE (the
    # keep anti-join and the per-doc removal count) and without the
    # barrier each consumer re-runs the whole grams -> gstat -> join
    # chain — two extra corpus scans plus the gram groupBy, measured.
    # rem is duplicated non-keeper positions only (far below corpus
    # size by construction), so this cache is cheap where persisting
    # the 8x gram stream itself would not be. Callers clear cache
    # between queries.
    rem = (
        grams.join(gstat, "g")
        .filter(key != F.col("first_key"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + (_SPAN_N - 1))
            ).alias("p"),
        )
        .distinct()
        .persist()
    )
    tokpos = d.select(
        "doc_id", F.posexplode(arr).alias("p", "tok")
    )
    kept = tokpos.join(rem, ["doc_id", "p"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda x: x.tok,
                ),
            )
        ).alias("cleaned_hash"),
    )
    remc = rem.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_removed")
    )
    return (
        base.join(remc, "doc_id", "left")
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias(
                "n_removed"
            ),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("cleaned_hash", F.lit(_EMPTY_MD5)).alias(
                "cleaned_hash"
            ),
        )
    )
