"""Model-based and rule-based quality filters, round 2: the three
published corpus-filtering families not yet covered by quality.py —

- Gopher rule filter (Rae et al. 2021, "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", Table A1): the
  hand-written document heuristics every large crawl pipeline applies
  before any model-based scoring;
- bigram-LM perplexity filter (the CCNet / KenLM shape: score each
  document under a language model trained on the corpus itself);
- DSIR importance weights (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling": hashed-ngram bucket
  log-ratio of a target distribution over the raw distribution);

plus two corpus-statistics operators in the same exact-arithmetic
style: BPE merge induction (one Sennrich et al. 2016 tokenizer-
training step) and a KMV distinct-count sketch with audited error.

Cross-engine determinism: no transcendental ever touches data. All
log2 terms are quantized through the exact integer identity
``floor(log2(x)) = length(bin(x)) - 1`` (same bit-math in Spark and
DuckDB — the pattern proven by text_surprisal_bits), scaled by a
power-of-two constant, and every ratio test is cleared of division
(``mean >= 3``  ->  ``sum >= 3*n``), so results are bit-identical
under any partitioning.

The reference has no text surface at all (SURVEY §2 Table B) — this
module is beyond-reference training-pipeline capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import fanout, hash64_expr, hash64_sql, register, t

# ---------------------------------------------------------------------
# Gopher rule filter
# ---------------------------------------------------------------------

_WC_MIN, _WC_MAX = 50, 100_000  # word-count bounds
_MWL_MIN, _MWL_MAX = 3, 10  # mean word length bounds
_STOPWORDS = (
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "with",
)
_MIN_STOP_HITS = 2

_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in _STOPWORDS) + "]"

_GOPHER_ORACLE = rf"""
WITH w AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\s+') AS arr,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) // 3
           AS n_ellipsis
  FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(arr) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(arr, x -> length(x))) AS BIGINT)
           AS word_chars,
         CAST(len(list_filter(arr, x -> regexp_matches(x, '[a-z]')))
              AS BIGINT) AS n_alpha_words,
         CAST(len(list_intersect(arr, {_STOP_SQL})) AS BIGINT)
           AS n_stop_hits,
         CAST(n_hash + n_ellipsis AS BIGINT) AS n_symbols
  FROM w)
SELECT doc_id, n_words, word_chars, n_alpha_words, n_stop_hits,
       n_symbols,
       n_words BETWEEN {_WC_MIN} AND {_WC_MAX} AS rule_word_count,
       {_MWL_MIN} * n_words <= word_chars
         AND word_chars <= {_MWL_MAX} * n_words AS rule_mean_word_len,
       10 * n_symbols <= n_words AS rule_symbol_ratio,
       5 * n_alpha_words >= 4 * n_words AS rule_alpha_words,
       n_stop_hits >= {_MIN_STOP_HITS} AS rule_stopwords,
       (n_words BETWEEN {_WC_MIN} AND {_WC_MAX})
         AND ({_MWL_MIN} * n_words <= word_chars
              AND word_chars <= {_MWL_MAX} * n_words)
         AND (10 * n_symbols <= n_words)
         AND (5 * n_alpha_words >= 4 * n_words)
         AND (n_stop_hits >= {_MIN_STOP_HITS}) AS keep
FROM m
"""


def gopher_flags(df: DataFrame) -> DataFrame:
    """Append the Gopher metric and rule columns (n_words, word_chars,
    n_alpha_words, n_stop_hits, n_symbols, rule_*, keep) to *df*,
    which must carry a ``text`` column. Map-only — one projection, no
    shuffle — so composed pipelines can gate on quality INSIDE their
    document scan instead of shuffle-joining against a separately
    computed corpus-sized rule table."""
    arr = F.split(F.trim(F.lower("text")), r"\s+")
    n_words = F.size(arr).cast("bigint")
    word_chars = F.aggregate(
        arr, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    ).cast("bigint")
    n_alpha = F.size(F.filter(arr, lambda x: x.rlike("[a-z]"))).cast("bigint")
    n_stop = F.size(
        F.array_intersect(arr, F.array(*[F.lit(s) for s in _STOPWORDS]))
    ).cast("bigint")
    n_symbols = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"))))
        + F.expr("(length(text) - length(replace(text, '...', ''))) div 3")
    ).cast("bigint")
    m = df.withColumns(
        {
            "n_words": n_words,
            "word_chars": word_chars,
            "n_alpha_words": n_alpha,
            "n_stop_hits": n_stop,
            "n_symbols": n_symbols,
        }
    )
    r_wc = F.col("n_words").between(_WC_MIN, _WC_MAX)
    r_mwl = (_MWL_MIN * F.col("n_words") <= F.col("word_chars")) & (
        F.col("word_chars") <= _MWL_MAX * F.col("n_words")
    )
    r_sym = 10 * F.col("n_symbols") <= F.col("n_words")
    r_alpha = 5 * F.col("n_alpha_words") >= 4 * F.col("n_words")
    r_stop = F.col("n_stop_hits") >= _MIN_STOP_HITS
    return m.withColumns(
        {
            "rule_word_count": r_wc,
            "rule_mean_word_len": r_mwl,
            "rule_symbol_ratio": r_sym,
            "rule_alpha_words": r_alpha,
            "rule_stopwords": r_stop,
            "keep": r_wc & r_mwl & r_sym & r_alpha & r_stop,
        }
    )


@register(
    "text_gopher_quality_rules",
    oracle=_GOPHER_ORACLE,
    tags=("text", "quality", "rules"),
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter (Rae et al. 2021 Table A1, adapted to
    this corpus's fields): word-count bounds, mean-word-length bounds,
    symbol-to-word ratio ('#' and '...'), >=80% words containing an
    alphabetic character, and >=2 distinct stopwords present. Each
    rule is emitted as its own boolean next to the final ``keep`` so a
    pipeline can audit per-rule rejection rates, not just the verdict.

    Every ratio test is cleared of division into pure int64
    comparisons (``mean_word_len >= 3`` is ``word_chars >= 3*n_words``)
    so both engines agree bit-for-bit. Map-only: one projection over
    the scan computes all counters with array HOFs — no explode, no
    shuffle, the cheapest possible full-corpus pass (at 100 TB this is
    a single wave of scan tasks). The expressions live in
    :func:`gopher_flags` so composed pipelines can inline them into
    their own scan instead of joining against this query's output."""
    d = t(spark, sf_dir, "documents")
    return gopher_flags(d.select("doc_id", "text")).drop("text")


# ---------------------------------------------------------------------
# Bigram-LM perplexity filter
# ---------------------------------------------------------------------

# Quantization scale for floor(log2(S * ratio)). 2^20 keeps
# S*(context+V) within int64 up to ~2^43 corpus token counts; beyond
# that (multi-trillion-token corpora) widen the arithmetic to
# DECIMAL(38,0) on both engines — the identity is unchanged.
_LM_S = 1 << 20

_LM_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS arr
  FROM documents),
st AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(arr)),
                i -> struct_pack(w1 := arr[i],
                                 bg := arr[i] || ' ' || arr[i + 1]))) AS s
  FROM tok WHERE len(arr) >= 2),
stream AS (SELECT doc_id, s.w1 AS w1, s.bg AS bg FROM st),
u AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS u_cnt FROM stream GROUP BY w1),
b AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS b_cnt FROM stream GROUP BY bg),
v AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab
  FROM (SELECT unnest(arr) AS w FROM tok)),
bits AS (
  SELECT stream.doc_id,
         CAST(length(bin(({_LM_S} * (u.u_cnt + v.vocab)) // (b.b_cnt + 1)))
              - 1 AS BIGINT) AS bits
  FROM stream JOIN u USING (w1) JOIN b USING (bg) CROSS JOIN v)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       round(CAST(SUM(bits) AS DOUBLE) / COUNT(*), 6) AS mean_bits
FROM bits GROUP BY doc_id
"""


@register(
    "text_bigram_lm_bits",
    oracle=_LM_ORACLE,
    tags=("text", "quality", "lm"),
)
def text_bigram_lm_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model perplexity filter (the CCNet/KenLM recipe
    with the LM trained on the corpus itself): per-bigram conditional
    probability P(w2|w1) = (count(w1 w2)+1) / (count(w1 ·)+V) with
    add-one smoothing, per-document surprisal = sum of
    floor(log2(S/P)) - log2(S) bits computed EXACTLY as
    ``length(bin((S*(ctx+V)) div (bg+1))) - 1`` — integer bit-math,
    no transcendentals, bit-identical across engines. Low mean-bits =
    in-distribution text; high = noise — the cut CCNet applies per
    language shard.

    Scale shape: the bigram stream is a map-side projection (array
    HOFs build per-position (w1, bigram) structs — no self-join per
    token); the stream is aggregated ONCE into a vocabulary-sized
    (context, bigram) type-count table from which the context counts,
    bigram counts and vocabulary total all reduce (tiny re-aggs, not
    corpus passes); the scoring joins are int64-keyed equi-joins
    (hashed keys, never multi-word strings on the wire — AQE
    broadcasts them while they fit, and at web scale they stay
    vocabulary-sized, orders of magnitude below the token stream);
    the one-row vocab total is a broadcast cross join. Documents with
    fewer than two tokens have no bigrams and drop out (same in the
    oracle)."""
    d = fanout(t(spark, sf_dir, "documents"))
    arr = F.split(F.trim(F.lower("text")), r"\s+")
    sz = F.size(arr)
    # adjacent-pair structs via arrays_zip of two slices: the split is
    # evaluated a constant number of times PER ROW. (A
    # transform(sequence(...), i -> element_at(arr, i)) lambda instead
    # re-evaluates the split per ELEMENT — O(tokens^2) per document,
    # measured ~2x wall-clock on this corpus and unbounded on long
    # documents.)
    # zip the FULL token array against its tail: arrays_zip pads the
    # shorter side with NULL, so every token appears exactly once as
    # w1 and the last token of each document rides a (w, NULL)
    # sentinel row. One explode then serves all FOUR consumers
    # (context counts, bigram counts, vocabulary, scoring probe) —
    # previously the vocabulary needed its own full-corpus
    # tokenize+explode+distinct pass, a second read of every byte of
    # text at 100 TB.
    pairs = F.arrays_zip(
        arr.alias("w1"),
        F.slice(arr, 2, sz - 1).alias("w2"),
    )
    # persist the compact (doc_id, c, g) int64 stream: it feeds two
    # consumers (the (c, g) type-count reduce and the scoring probe)
    # and without the barrier Catalyst recomputes the explode+md5
    # front end for each — the same CollapseProject trap the minhash
    # pipeline pins against. MEMORY_AND_DISK; ~24 bytes/token, spills
    # rather than OOMs; callers clear cache between queries.
    stream = (
        d.select("doc_id", F.explode(pairs).alias("s"))
        .select(
            "doc_id",
            hash64_expr(F.col("s.w1")).alias("c"),
            # NULL g marks the sentinel row — concat_ws SKIPS nulls,
            # so without the guard the sentinel would silently hash
            # as the bare unigram and pollute the bigram counts
            F.when(
                F.col("s.w2").isNotNull(),
                hash64_expr(F.concat_ws(" ", F.col("s.w1"), F.col("s.w2"))),
            ).alias("g"),
        )
        .persist()
    )
    # ONE full-stream aggregation: counts per (context, bigram) type —
    # vocabulary-sized output (one row per distinct bigram, plus one
    # (c, NULL) sentinel row per distinct final-token context). Context
    # counts, bigram counts AND the vocabulary all reduce from this
    # small table, so the token stream is aggregated exactly once (the
    # r07–r11 shape ran three stream-wide reduces — groupBy c, groupBy
    # g, count_distinct c — each a full map-side pass over every corpus
    # token at 100 TB).
    cg = stream.groupBy("c", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    pairs_cg = cg.filter(F.col("g").isNotNull())
    u = pairs_cg.groupBy("c").agg(F.sum("n").cast("bigint").alias("u_cnt"))
    b = pairs_cg.groupBy("g").agg(F.sum("n").cast("bigint").alias("b_cnt"))
    # vocabulary over the bigram-type table: every corpus token is a
    # w1 row of the stream exactly once (the sentinel keeps the final
    # token), and cg preserves each distinct c. Distinct over the
    # 60-bit hash — u_cnt/b_cnt already group on that hash, so this
    # adds no NEW collision assumption (a colliding word pair would
    # already merge their context counts).
    vocab = cg.agg(F.count_distinct("c").cast("bigint").alias("vocab"))
    bits = (
        F.length(F.bin(F.expr(f"({_LM_S} * (u_cnt + vocab)) div (b_cnt + 1)")))
        - 1
    ).cast("bigint")
    return (
        stream.join(b, "g")
        .join(u, "c")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("bits").cast("bigint").alias("total_bits"),
            F.round(
                F.sum("bits").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_bits"),
        )
    )


# ---------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------

_DSIR_BUCKETS = 512
_DSIR_TARGET_LANG = "en"
# 2^40 scale: qlog2 of probabilities down to 2^-40 stays positive;
# S*(cnt+1) fits int64 through ~10^5 x corpus growth over sf0.1 —
# beyond that widen to DECIMAL(38,0) (same identity).
_DSIR_S = 1 << 40

_DSIR_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END AS is_t,
         ({hash64_sql('w')} % {_DSIR_BUCKETS}) AS bucket
  FROM (SELECT doc_id, lang,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents)),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS r_total,
         CAST(SUM(is_t) AS BIGINT) AS t_total
  FROM tok),
cnt AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r_cnt,
         CAST(SUM(is_t) AS BIGINT) AS t_cnt
  FROM tok GROUP BY bucket),
w AS (
  SELECT bucket,
         CAST((length(bin(({_DSIR_S} * (t_cnt + 1))
                          // (t_total + {_DSIR_BUCKETS}))) - 1)
            - (length(bin(({_DSIR_S} * (r_cnt + 1))
                          // (r_total + {_DSIR_BUCKETS}))) - 1)
              AS BIGINT) AS wb
  FROM cnt CROSS JOIN totals)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(wb) AS BIGINT) AS score_bits,
       8 * SUM(wb) + 3 * COUNT(*) >= 0 AS keep
FROM tok JOIN w USING (bucket)
GROUP BY doc_id
"""


@register(
    "pipeline_dsir_importance",
    oracle=_DSIR_ORACLE,
    tags=("pipeline", "quality", "sampling", "dsir"),
)
def pipeline_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hash every token
    occurrence into one of 512 buckets, estimate add-one-smoothed
    bucket distributions for the TARGET corpus (lang='en' stands in
    for the high-quality target, e.g. Wikipedia) and the RAW corpus
    (everything), and score each document by the summed quantized
    log-ratio sum_f [log2 p_target(f) - log2 p_raw(f)] — documents
    whose features look target-like score near zero and survive
    importance resampling (``keep`` is mean log-ratio >= -0.375 bits,
    cleared of division into the exact int64 test
    ``8*score + 3*n >= 0``; the floor quantization of both log terms
    biases every weight downward, so 0 itself is the unreachable
    upper bound). Both log2 terms go through the exact
    ``length(bin(S*p_num div p_den)) - 1`` bit-math (the power-of-two
    scale cancels in the difference), so scores are int64 and
    bit-identical across engines.

    Scale shape: the token stream is a projection off the scan; the
    bucket histogram is ONE map-side-combinable groupBy producing
    exactly 512 rows carrying both distributions (raw count +
    conditional target count — no second pass over the target);
    the corpus-wide totals are derived FROM that 512-row histogram
    (``sum(r_cnt)``/``sum(t_cnt)`` — every token lands in exactly one
    bucket), not from a second full-stream aggregate, so the stream is
    scanned exactly twice: once for the histogram, once for scoring;
    the 512-row weight table broadcasts, so the scoring join never
    shuffles the stream; the per-document reduce is the only full
    shuffle. Recomputing the stream for the histogram and the scoring
    pass is two scans of a pruned (doc_id, lang, text) projection —
    cheaper at 100 TB than persisting an exploded token table."""
    d = fanout(t(spark, sf_dir, "documents"))
    stream = d.select(
        "doc_id",
        F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)
        .otherwise(0)
        .alias("is_t"),
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
    ).select(
        "doc_id",
        "is_t",
        (hash64_expr(F.col("w")) % _DSIR_BUCKETS).alias("bucket"),
    )
    cnt = stream.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("r_cnt"),
        F.sum("is_t").cast("bigint").alias("t_cnt"),
    )
    # corpus totals from the histogram itself — the buckets partition
    # the token stream, so summing the 512 rows is exact and saves a
    # full third scan of every corpus token (the r07–r11 shape ran
    # stream.agg(...) alongside the groupBy)
    totals = cnt.agg(
        F.sum("r_cnt").cast("bigint").alias("r_total"),
        F.sum("t_cnt").cast("bigint").alias("t_total"),
    )
    qlog_t = (
        F.length(
            F.bin(
                F.expr(
                    f"({_DSIR_S} * (t_cnt + 1))"
                    f" div (t_total + {_DSIR_BUCKETS})"
                )
            )
        )
        - 1
    )
    qlog_r = (
        F.length(
            F.bin(
                F.expr(
                    f"({_DSIR_S} * (r_cnt + 1))"
                    f" div (r_total + {_DSIR_BUCKETS})"
                )
            )
        )
        - 1
    )
    weights = (
        cnt.crossJoin(F.broadcast(totals))
        .select("bucket", (qlog_t - qlog_r).cast("bigint").alias("wb"))
    )
    return (
        stream.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("wb").cast("bigint").alias("score_bits"),
            (8 * F.sum("wb") + 3 * F.count(F.lit(1)) >= 0).alias("keep"),
        )
    )


# ---------------------------------------------------------------------
# BPE merge induction (one training step)
# ---------------------------------------------------------------------

_BPE_TOP = 50

_MERGE_ORACLE = r"""
WITH w AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
  FROM documents),
p AS (
  SELECT unnest(list_transform(range(1, length(w)),
                i -> substr(w, i, 2))) AS pair
  FROM w WHERE length(w) >= 2)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
FROM p GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT 50
"""


@register(
    "text_bpe_merge_candidates",
    oracle=_MERGE_ORACLE,
    tags=("text", "tokenization", "bpe"),
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One step of BPE tokenizer training at corpus scale: the top-50
    most frequent adjacent symbol pairs within words (Sennrich et al.
    2016 — each training step merges the argmax pair; iterating this
    query against a re-segmented corpus IS the training loop, and the
    first step is where >99% of the corpus-scan cost lives).

    Shape: explode words, build each word's adjacent pairs with a
    substr HOF (no per-element re-derivation of anything expensive —
    the word is a plain exploded column), ONE map-side-combinable
    groupBy on the pair, and a TakeOrderedAndProject top-50 (heap +
    driver merge, no global sort). The tie order (count desc, pair
    asc) is total, so the LIMIT frontier is deterministic on both
    engines."""
    d = fanout(t(spark, sf_dir, "documents"))
    w = d.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.col("w").substr(i, F.lit(2)),
    )
    return (
        w.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------
# KMV distinct-count sketch
# ---------------------------------------------------------------------

_KMV_K = 64
_TWO60 = float(1 << 60)  # 63 * 2^60 is exactly representable in double


@register(
    "agg_kmv_distinct_sketch",
    oracle=rf"""
    WITH tok AS (
      SELECT lang,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents),
    h AS (SELECT DISTINCT lang, {hash64_sql('w')} AS h FROM tok),
    exact AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM h GROUP BY lang),
    ranked AS (
      SELECT lang, h,
             row_number() OVER (PARTITION BY lang ORDER BY h) AS r
      FROM h),
    sk AS (
      SELECT lang, CAST(MAX(h) AS BIGINT) AS kth_min,
             CAST(COUNT(*) AS BIGINT) AS n_in_sketch
      FROM ranked WHERE r <= {_KMV_K} GROUP BY lang)
    SELECT e.lang, e.n_distinct, s.kth_min, s.n_in_sketch,
           CASE WHEN s.n_in_sketch < {_KMV_K}
                THEN CAST(e.n_distinct AS DOUBLE)
                ELSE ({_KMV_K - 1}.0 * {_TWO60!r})
                       / CAST(s.kth_min AS DOUBLE) END AS est_distinct
    FROM exact e JOIN sk s ON e.lang = s.lang
    """,
    tags=("agg", "sketch", "cardinality"),
)
def agg_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values cardinality sketch (Bar-Yossef et al. 2002 —
    the mergeable distinct-count sketch family HLL refines): per
    language, the 64 smallest distinct 60-bit token hashes; the
    estimator (K-1) * 2^60 / kth_min is reported NEXT TO the exact
    distinct count so the sketch's error is itself auditable. A
    sketch is the union-mergeable representation a 100 TB pipeline
    ships between stages (per-shard k-minima merge by taking the k
    smallest of the union — associative, bounded size), where an
    exact distinct count cannot be merged without re-shuffling.

    Scale shape: one combinable distinct on (lang, hash), then the
    per-group k-minima through the two-phase salted top-k
    (operators/skew.py) so a dominant language never sorts its whole
    hash set in one task. The estimator division is fixed-order IEEE
    on int64->double casts — bit-identical across engines. Sketches
    with fewer than K values fall back to the exact count (the
    standard KMV small-set rule), same branch in the oracle."""
    from ..operators.skew import salted_topk

    d = fanout(t(spark, sf_dir, "documents"))
    tok = d.select(
        "lang",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
    )
    h = tok.select("lang", hash64_expr(F.col("w")).alias("h")).distinct()
    exact = h.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct")
    )
    kmin = salted_topk(
        h,
        "lang",
        [F.asc("h")],
        _KMV_K,
        salt_expr=F.xxhash64(F.col("h")),
        rank_alias="r",
    )
    sk = kmin.groupBy("lang").agg(
        F.max("h").cast("bigint").alias("kth_min"),
        F.count(F.lit(1)).cast("bigint").alias("n_in_sketch"),
    )
    est = F.when(
        F.col("n_in_sketch") < _KMV_K, F.col("n_distinct").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1) * _TWO60) / F.col("kth_min").cast("double")
    )
    return (
        exact.join(sk, "lang")
        .select(
            "lang", "n_distinct", "kth_min", "n_in_sketch",
            est.alias("est_distinct"),
        )
    )


# ---------------------------------------------------------------------
# Composed curation funnel v2 (model-based stages chained)
# ---------------------------------------------------------------------

# mean_bits <= 24.35, cleared of division: 100*total <= 2435*n
_LM_CUT_NUM, _LM_CUT_DEN = 2435, 100


@register(
    "pipeline_curate_v2",
    oracle=rf"""
    WITH gopher AS (
      SELECT doc_id FROM ({_GOPHER_ORACLE}) g WHERE g.keep),
    lm AS (
      SELECT doc_id, n_bigrams, total_bits FROM ({_LM_ORACLE}) l
      WHERE {_LM_CUT_DEN} * l.total_bits <= {_LM_CUT_NUM} * l.n_bigrams),
    ds AS (
      SELECT doc_id, n_tokens, score_bits FROM ({_DSIR_ORACLE}) s
      WHERE s.keep),
    surv AS (
      SELECT d.doc_id, d.lang, d.source, d.text,
             lm.n_bigrams, lm.total_bits, ds.n_tokens, ds.score_bits
      FROM documents d
      JOIN gopher USING (doc_id)
      JOIN lm USING (doc_id)
      JOIN ds USING (doc_id)),
    keep1 AS (
      SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
               AS ck,
             MIN(doc_id) AS doc_id
      FROM surv GROUP BY 1)
    SELECT s.doc_id, s.lang, s.source,
           s.n_bigrams, s.total_bits, s.n_tokens, s.score_bits
    FROM surv s JOIN keep1 k ON s.doc_id = k.doc_id
    """,
    headline=True,
    tags=("pipeline", "curation", "composition"),
)
def pipeline_curate_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-based curation pipeline END TO END in one DAG —
    Gopher rules -> bigram-LM perplexity cut -> DSIR target-likeness
    -> exact keep-one dedup — returning the surviving documents with
    their scores. This is the composition a real training-data run
    executes; registering it as one query proves the stages compose
    lazily into a single Catalyst plan (no materialization between
    stages) and that the whole chain stays exact int64 (both cuts are
    cleared of division).

    Scale shape: the Gopher gate is computed INLINE on the document
    scan (``gopher_flags`` — a rule table join would add a
    corpus-corpus shuffle for data one projection derives); the
    LM/DSIR stages genuinely need their own corpus passes (vocabulary
    joins), but they reduce to per-document scores BEFORE joining, and
    both score joins key by doc_id so they share one hash-partitioning
    of the survivors (Catalyst reuses the exchange); the dedup groupBy
    touches only post-filter survivors."""
    d = t(spark, sf_dir, "documents")
    lm = text_bigram_lm_bits(spark, sf_dir).filter(
        _LM_CUT_DEN * F.col("total_bits")
        <= _LM_CUT_NUM * F.col("n_bigrams")
    ).select("doc_id", "n_bigrams", "total_bits")
    ds = pipeline_dsir_importance(spark, sf_dir).filter("keep").select(
        "doc_id", "n_tokens", "score_bits"
    )
    surv = (
        gopher_flags(d.select("doc_id", "lang", "source", "text"))
        .filter("keep")
        .select("doc_id", "lang", "source", "text")
        .join(lm, "doc_id")
        .join(ds, "doc_id")
    )
    # keep-one as a partition-window min over the content key — one
    # exchange on ck, replacing the old groupBy + join-back (which
    # re-shuffled both sides on doc_id for the same verdict)
    ck = F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    w = Window.partitionBy("ck")
    return (
        surv.withColumn("ck", ck)
        .withColumn("_min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_min_id"))
        .select(
            "doc_id", "lang", "source",
            "n_bigrams", "total_bits", "n_tokens", "score_bits",
        )
    )


# ---------------------------------------------------------------------
# BPE training loop (3 unrolled merge rounds)
# ---------------------------------------------------------------------

_BPE_ROUNDS = 3


def _o_seg_round(prev: str, rnd: int) -> str:
    """One oracle round: pair counts over the current segmentation,
    argmax merge (count desc, pair asc — a total order), greedy
    left-to-right application via a list_reduce fold."""
    return f"""
p{rnd} AS (
  SELECT p.s.a AS a, p.s.b AS b, CAST(SUM(cnt) AS BIGINT) AS pair_cnt
  FROM (SELECT cnt,
               unnest(list_transform(range(1, len(seg)),
                      i -> struct_pack(a := seg[i], b := seg[i+1]))) AS s
        FROM {prev} WHERE len(seg) >= 2) p
  GROUP BY 1, 2),
m{rnd} AS (
  SELECT a, b, pair_cnt FROM p{rnd}
  ORDER BY pair_cnt DESC, a, b LIMIT 1),
seg{rnd} AS (
  SELECT w, cnt,
         list_reduce(list_transform(seg, x -> [x]), (acc, x) ->
           CASE WHEN acc[-1] = m.a AND x[1] = m.b
                THEN list_append(list_slice(acc, 1, len(acc) - 1),
                                 acc[-1] || x[1])
                ELSE list_concat(acc, x) END) AS seg
  FROM {prev} CROSS JOIN m{rnd} m)"""


_BPE_TRAIN_ORACLE = (
    r"""
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY w),
seg0 AS (
  SELECT w, cnt,
         list_transform(range(1, length(w) + 1),
                        i -> substr(w, i, 1)) AS seg
  FROM words),"""
    + ",".join(_o_seg_round(f"seg{r - 1}", r) for r in range(1, _BPE_ROUNDS + 1))
    + "".join(
        f"""
SELECT {r} AS merge_rank, a, b, pair_cnt FROM m{r}
{'UNION ALL' if r < _BPE_ROUNDS else ''}"""
        for r in range(1, _BPE_ROUNDS + 1)
    )
)


def _pair_counts(seg_df: DataFrame) -> DataFrame:
    seg = F.col("seg")
    z = F.arrays_zip(
        F.slice(seg, 1, F.size(seg) - 1).alias("a"),
        F.slice(seg, 2, F.size(seg) - 1).alias("b"),
    )
    return (
        seg_df.filter(F.size("seg") >= 2)
        .select("cnt", F.explode(z).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("bigint").alias("pair_cnt"))
    )


def _apply_merge(seg_df: DataFrame, merge_df: DataFrame) -> DataFrame:
    """Greedy left-to-right merge application: fold the symbol array,
    fusing every (a, b) adjacency into one symbol. The 1-row argmax
    merge broadcasts; the fold is a per-row array HOF."""
    m = F.broadcast(
        merge_df.select(F.col("a").alias("_ma"), F.col("b").alias("_mb"))
    )
    folded = F.aggregate(
        F.col("seg"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.col("_ma"))
            & (x == F.col("_mb")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return seg_df.crossJoin(m).select(
        "w", "cnt", folded.alias("seg")
    )


@register(
    "text_bpe_train_merges",
    oracle=_BPE_TRAIN_ORACLE,
    tags=("text", "tokenization", "bpe", "iterative"),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, three full merge rounds (Sennrich et
    al. 2016): round r counts adjacent symbol pairs over the current
    segmentation weighted by word frequency, picks the argmax pair
    (count desc, pair asc — total order), and re-segments by greedy
    left-to-right fusion. Returns the learned merge table
    (merge_rank, a, b, pair_cnt) — the artifact a tokenizer ships.
    Unlike text_bpe_merge_candidates (one round of statistics), this
    is the actual data-dependent training LOOP, exactly oracled: each
    round's argmax feeds the next round's segmentation in both
    engines.

    Scale shape: training runs on the word-FREQUENCY table, not the
    corpus — one corpus-sized shuffle builds (word, count), and every
    round after that is vocabulary-bounded: pair counting is a
    combinable groupBy over the vocab, the 1-row argmax broadcasts,
    and merge application is a per-row array fold. Adding rounds adds
    constant-size plan stages (same property as the power-iteration
    operator), never another corpus pass."""
    d = fanout(t(spark, sf_dir, "documents"))
    # persist the word-FREQUENCY table: it is vocabulary-sized (tiny
    # next to the corpus) but EVERY round's argmax and re-segmentation
    # hangs off it, and without the barrier Catalyst re-derives the
    # corpus-sized explode+groupBy once per consumer — measured 7
    # distinct document scans for 3 rounds; with the barrier, ONE.
    # Callers clear cache between queries.
    words = (
        d.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()
    )
    seg0 = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    seg_df = words.select("w", "cnt", seg0.alias("seg"))
    merges = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        argmax = (
            _pair_counts(seg_df)
            .orderBy(F.desc("pair_cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
        )
        merges.append(
            argmax.select(
                F.lit(rnd).cast("int").alias("merge_rank"),
                "a", "b", "pair_cnt",
            )
        )
        if rnd < _BPE_ROUNDS:
            seg_df = _apply_merge(seg_df, argmax)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


_BPE_ENCODE_ORACLE = (
    r"""
WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY w),
seg0 AS (
  SELECT w, cnt,
         list_transform(range(1, length(w) + 1),
                        i -> substr(w, i, 1)) AS seg
  FROM words),"""
    + ",".join(_o_seg_round(f"seg{r - 1}", r) for r in range(1, _BPE_ROUNDS + 1))
    + f""",
enc AS (SELECT w, CAST(len(seg) AS BIGINT) AS sym_cnt FROM seg{_BPE_ROUNDS}),
docw AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
    FROM documents)
  WHERE w <> '')
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ws_tokens,
       CAST(SUM(sym_cnt) AS BIGINT) AS n_bpe_symbols,
       CAST(SUM(sym_cnt) AS DOUBLE) / COUNT(*) AS symbols_per_token
FROM docw JOIN enc USING (w)
GROUP BY doc_id"""
)


@register(
    "text_bpe_encode_corpus",
    oracle=_BPE_ENCODE_ORACLE,
    tags=("text", "tokenization", "bpe"),
)
def text_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other half of the tokenizer loop: train 3 BPE merges
    (exactly ``text_bpe_train_merges``' loop, including the final
    application the trainer itself skips), then ENCODE the corpus
    with them — per document: whitespace tokens, post-merge symbol
    count, and symbols-per-token (the compression the learned merges
    buy; 1.0 = merges never fired in that document).

    Scale shape: encoding is vocabulary-sized, not corpus-sized — the
    merges are applied once per DISTINCT word (the ``enc`` word →
    symbol-count table), and the corpus only pays a token→vocab
    equi-join plus one per-doc combinable groupBy. This is how real
    tokenizer pipelines amortize encoding (encode the vocab, then
    look up), and it keeps the 3-round merge machinery off the
    100 TB token stream entirely."""
    d = fanout(t(spark, sf_dir, "documents"))
    # same vocabulary-table persist barrier as text_bpe_train_merges
    # (measured 9 distinct document scans without it: every merge
    # round's argmax + re-segmentation re-derived the corpus explode).
    # With it: one scan to build the vocab, one scan for the per-doc
    # encode join below — the minimum this query can touch.
    words = (
        d.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()
    )
    seg0 = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    seg_df = words.select("w", "cnt", seg0.alias("seg"))
    for _ in range(_BPE_ROUNDS):
        argmax = (
            _pair_counts(seg_df)
            .orderBy(F.desc("pair_cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
        )
        seg_df = _apply_merge(seg_df, argmax)
    enc = seg_df.select("w", F.size("seg").cast("bigint").alias("sym_cnt"))
    docw = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    return (
        docw.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ws_tokens"),
            F.sum("sym_cnt").cast("bigint").alias("n_bpe_symbols"),
            (
                F.sum("sym_cnt").cast("double") / F.count(F.lit(1))
            ).alias("symbols_per_token"),
        )
    )


@register(
    "agg_kmv_merge_sources",
    oracle=rf"""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents),
    h AS (SELECT DISTINCT source, {hash64_sql('w')} AS h FROM tok),
    ranked AS (
      SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS r
      FROM h),
    sketches AS (SELECT DISTINCT h FROM ranked WHERE r <= {_KMV_K}),
    merged AS (
      SELECT h, row_number() OVER (ORDER BY h) AS r FROM sketches),
    mk AS (
      SELECT CAST(MAX(h) AS BIGINT) AS kth_min,
             CAST(COUNT(*) AS BIGINT) AS n_in_sketch
      FROM merged WHERE r <= {_KMV_K}),
    ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM (SELECT DISTINCT {hash64_sql('w')} AS h FROM tok)),
    ns AS (
      SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM documents)
    SELECT ns.n_sources, ex.n_distinct, mk.kth_min, mk.n_in_sketch,
           CASE WHEN mk.n_in_sketch < {_KMV_K}
                THEN CAST(ex.n_distinct AS DOUBLE)
                ELSE ({_KMV_K - 1}.0 * {_TWO60!r})
                       / CAST(mk.kth_min AS DOUBLE) END AS est_distinct
    FROM ns, ex, mk
    """,
    tags=("agg", "sketch", "cardinality", "merge"),
)
def agg_kmv_merge_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes sketches worth shipping: MERGEABILITY.
    Build an independent KMV sketch per source (k smallest distinct
    token hashes), then merge them — set-union the per-source minima
    and keep the k smallest — and estimate GLOBAL distinct tokens
    from the merged sketch alone, next to the exact global count for
    audit. At 100 TB this is the two-level rollup exact distinct
    cannot do: per-shard sketches are k·8 bytes each, merge cost is
    k·n_sources rows through one bounded top-k, and no re-shuffle of
    the original hash set ever happens (contrast ``ex`` here, which
    pays the full corpus-wide distinct and exists only as the audit).

    The merged estimator uses the identical fixed-order IEEE
    expression as ``agg_kmv_distinct_sketch``; merging k-minima sets
    is associative and commutative, so any merge tree gives the same
    sketch — the distributed-safety argument, in sketch form."""
    from ..operators.skew import salted_topk

    d = fanout(t(spark, sf_dir, "documents"))
    tok = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
    )
    hh = tok.select("source", hash64_expr(F.col("w")).alias("h"))
    h = hh.distinct()
    kmin = salted_topk(
        h,
        "source",
        [F.asc("h")],
        _KMV_K,
        salt_expr=F.xxhash64(F.col("h")),
        rank_alias="r",
    )
    # sketch union = set union of the per-source minima, keep k smallest
    merged = (
        kmin.select("h").distinct().orderBy(F.asc("h")).limit(_KMV_K)
    )
    mk = merged.agg(
        F.max("h").cast("bigint").alias("kth_min"),
        F.count(F.lit(1)).cast("bigint").alias("n_in_sketch"),
    )
    ex = hh.select("h").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct")
    )
    ns = d.agg(F.count_distinct("source").cast("bigint").alias("n_sources"))
    est = F.when(
        F.col("n_in_sketch") < _KMV_K, F.col("n_distinct").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1) * _TWO60) / F.col("kth_min").cast("double")
    )
    return (
        ns.crossJoin(ex)
        .crossJoin(mk)
        .select(
            "n_sources", "n_distinct", "kth_min", "n_in_sketch",
            est.alias("est_distinct"),
        )
    )
