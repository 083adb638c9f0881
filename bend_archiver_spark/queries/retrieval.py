"""Retrieval / membership operators for training-data curation.

Three operators a 100 TB corpus pipeline runs constantly:

- **BM25 search** (``text_bm25_search``): rank documents against a
  query-term set. The inverted-index shape (token-keyed tf/df
  aggregations, broadcast query terms, TakeOrderedAndProject top-k)
  is exactly the plan you want at scale — the candidate set is only
  the docs that share a term with the query, never the corpus.
- **Bloom-filter membership prefilter** (``dedup_bloom_prefilter``):
  the classic two-dataset dedup accelerator — build a compact bit-set
  over the reference corpus, broadcast it, and drop the (vast)
  majority of non-members before any join. False positives are
  expected and surfaced for audit against the exact join.
- **Token-surprisal quality score** (``text_surprisal_bits``): a
  perplexity-like rarity signal without transcendental functions —
  integer ``floor(log2(inverse token frequency))`` bits, exact in
  both engines via ``length(bin(x)) - 1``.

Exactness conventions follow queries/text2.py: frequencies are
integer-quantized (``div``), hashes are the portable md5-prefix
``hash64``, and any float arithmetic goes through exact decimal sums
with one final rounded cast.

Reference parity note: the reference engine has no retrieval surface
(SURVEY.md Table B — delegated/absent); these are beyond-reference
pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import fanout, register, t

# Fixed query-term set for the BM25 oracle check (a real deployment
# parameterizes this; a literal VALUES list keeps the oracle exact).
_BM25_TERMS = ("spark", "query", "shuffle", "partition")

# BM25 constants k1=1.2, b=0.75 as exact rationals scaled by 20:
#   (k1+1) = 44/20,  k1*(1-b) = 6/20,  k1*b = 18/20
# so with avgdl = total_len / n_docs the per-term score
#   idf * tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)
# becomes, after multiplying through by 20*total_len (all integers):
#   num = idf_q * tf * 44 * total_len
#   den = 20*total_len*tf + 6*total_len + 18*dl*n_docs
# Both sides are exact DECIMAL(38,0); the only float op is the final
# division + 6-dp round. idf_q = (1_000_000 * n_docs) div df — the
# same linear-idf quantization as text_tfidf_top_terms.


def _bm25_oracle() -> str:
    terms = ", ".join(f"('{w}')" for w in _BM25_TERMS)
    return rf"""
WITH qterms(token) AS (VALUES {terms}),
tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents),
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
  FROM tok GROUP BY doc_id),
corpus AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_len
  FROM dl),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok JOIN qterms USING (token)
  GROUP BY doc_id, token),
dfreq AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         CAST(CAST((1000000 * c.n_docs) // dfreq.df AS DECIMAL(38,0))
              * tf.tf * 44 * c.total_len AS DOUBLE)
         / CAST(20 * c.total_len * tf.tf + 6 * c.total_len
                + 18 * dl.dl * c.n_docs AS DOUBLE) AS term_score
  FROM tf
  JOIN dfreq USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus c),
totals AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
         round(CAST(CAST(SUM(CAST(term_score AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE), 6)
           AS bm25
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_terms_hit, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
FROM totals
ORDER BY rank
LIMIT 25
"""


@register(
    "text_bm25_search",
    oracle=_bm25_oracle(),
    tags=("text", "retrieval"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 documents by BM25 (k1=1.2, b=0.75) for a fixed query-term
    set, with linear-quantized idf and exact rational tf-normalization
    (constants scaled so num/den stay integral; see module header).

    Plan shape at scale: doc-length and corpus stats are one
    combinable pass; the query-term table is broadcast so the tf
    aggregation only ever touches matching postings (inverted-index
    semantics without materializing an index); corpus stats join is a
    single-row broadcast; the top-k is TakeOrderedAndProject — no
    global sort, no cartesian, candidate set bounded by posting sizes.
    """
    d = fanout(t(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
    )
    # dl and tf are each consumed by multiple downstream branches
    # (corpus stats, broadcast joins, dfreq) — persist them so the
    # full-corpus token explode runs ONCE per chain instead of once
    # per branch (measured 12.6s -> ~4s at sf0.1; both tables are
    # orders smaller than the corpus: one row per doc / per posting)
    dl = (
        tok.groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("dl"))
        .persist()
    )
    corpus = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    qterms = spark.createDataFrame(
        [(w,) for w in _BM25_TERMS], "token string"
    )
    tf = (
        tok.join(F.broadcast(qterms), "token")
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .persist()
    )
    dfreq = tf.groupBy("token").agg(
        F.count_distinct("doc_id").cast("bigint").alias("df")
    )
    # Reduce per-doc lengths to the candidate set BEFORE any broadcast
    # decision: `dl` is corpus-proportional (one row per document), so
    # force-broadcasting it would exceed the broadcast limit at 100x.
    # The semi join bounds it by posting sizes; no hint — stats/AQE
    # elect broadcast when the candidate set is genuinely small.
    cand_dl = dl.join(tf.select("doc_id"), "doc_id", "left_semi")
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(cand_dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "term_score",
            (
                F.expr("(1000000 * n_docs) div df").cast("decimal(38,0)")
                * F.col("tf") * F.lit(44) * F.col("total_len")
            ).cast("double")
            / (
                F.lit(20) * F.col("total_len") * F.col("tf")
                + F.lit(6) * F.col("total_len")
                + F.lit(18) * F.col("dl") * F.col("n_docs")
            ).cast("double"),
        )
    )
    totals = scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_terms_hit"),
        F.round(
            F.sum(F.col("term_score").cast("decimal(38,9)")).cast("double"), 6
        ).alias("bm25"),
    )
    win = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        totals.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(25)
        .withColumn("rank", F.row_number().over(win).cast("bigint"))
        .select("doc_id", "n_terms_hit", "bm25", "rank")
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership prefilter
# ---------------------------------------------------------------------------
# k=3 hash positions in an m=8192-slot filter, built over the exact
# text of the reference partition (source = 'src0') and probed by all
# other documents. Position i = hash64(text || '#i') % 8192 with the
# portable md5-prefix hash, so both engines derive identical bit-sets.
# The oracle expresses the same semantics relationally (distinct
# positions + per-probe position joins); the Spark implementation
# materializes the broadcast bitmap a real pipeline would ship.

_BLOOM_M = 8192
_BLOOM_SEEDS = ("#0", "#1", "#2")


def _bloom_pos_sql(seed: str) -> str:
    return (
        f"((('0x' || substr(md5(text || '{seed}'), 1, 15))::BIGINT)"
        f" % {_BLOOM_M})"
    )


_BLOOM_ORACLE = rf"""
WITH ref AS (
  SELECT DISTINCT text FROM documents WHERE source = 'src0'),
refpos AS (
  SELECT DISTINCT pos FROM (
    SELECT {_bloom_pos_sql('#0')} AS pos FROM ref
    UNION ALL SELECT {_bloom_pos_sql('#1')} FROM ref
    UNION ALL SELECT {_bloom_pos_sql('#2')} FROM ref)),
probe AS (
  SELECT doc_id, text,
         {_bloom_pos_sql('#0')} AS p0,
         {_bloom_pos_sql('#1')} AS p1,
         {_bloom_pos_sql('#2')} AS p2
  FROM documents WHERE source <> 'src0')
SELECT pr.doc_id,
       (r0.pos IS NOT NULL AND r1.pos IS NOT NULL
        AND r2.pos IS NOT NULL) AS bloom_hit,
       (rf.text IS NOT NULL) AS exact_dup
FROM probe pr
LEFT JOIN refpos r0 ON r0.pos = pr.p0
LEFT JOIN refpos r1 ON r1.pos = pr.p1
LEFT JOIN refpos r2 ON r2.pos = pr.p2
LEFT JOIN ref rf ON rf.text = pr.text
"""


@register(
    "dedup_bloom_prefilter",
    oracle=_BLOOM_ORACLE,
    tags=("dedup", "bloom", "membership"),
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter prefilter for cross-corpus exact dedup: build a
    k=3 / m=8192 bit-set over the ``src0`` reference texts, broadcast
    it, and flag each probe doc whose three positions are all set —
    alongside the ``exact_dup`` verdict so false positives are
    auditable (a production run filters on ``bloom_hit`` before the
    verification join; the flag table is returned for the oracle).

    At 100 TB the bitmap is a few MiB broadcast regardless of corpus
    size, and the expensive exact-text verification join runs only on
    bloom survivors (here: the returned rows), not the whole probe
    side. The Spark plan has no shuffle on the probe side at all —
    the bitmap arrives as a one-row broadcast array and membership is
    three ``array_contains`` lookups.
    """
    docs = t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("source") == "src0").select("text").distinct()

    def pos(seed: str) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.col("text"), F.lit(seed))), 1, 15),
                16, 10,
            ).cast("bigint") % _BLOOM_M
        )

    refpos = (
        ref.select(
            F.explode(F.array(*[pos(s) for s in _BLOOM_SEEDS])).alias("pos")
        )
        .agg(F.sort_array(F.collect_set("pos")).alias("bitmap"))
    )
    probe = docs.filter(F.col("source") != "src0").select(
        "doc_id",
        "text",
        pos("#0").alias("p0"),
        pos("#1").alias("p1"),
        pos("#2").alias("p2"),
    )
    hit = (
        F.array_contains("bitmap", F.col("p0"))
        & F.array_contains("bitmap", F.col("p1"))
        & F.array_contains("bitmap", F.col("p2"))
    )
    survivors = probe.crossJoin(F.broadcast(refpos)).withColumn(
        "bloom_hit", hit
    )
    # exact verdict via a broadcast probe of the reference texts (a
    # real pipeline would run this join only on bloom survivors; the
    # full flag table is returned here so the driver check is
    # non-trivial at every scale factor)
    return (
        survivors.join(
            F.broadcast(ref.withColumn("exact_dup", F.lit(True))),
            "text",
            "left",
        )
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
        )
    )


# ---------------------------------------------------------------------------
# Integer-log2 token surprisal
# ---------------------------------------------------------------------------

_SURPRISAL_ORACLE = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents),
counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok),
rarity AS (
  SELECT token,
         CAST(length(bin((1000000000 * c.total) // cnt)) - 1 AS BIGINT)
           AS bits
  FROM counts CROSS JOIN corpus c),
perdoc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(r.bits) AS BIGINT) AS total_bits
  FROM tok t JOIN rarity r USING (token)
  GROUP BY t.doc_id)
SELECT doc_id, n_tokens, total_bits,
       round(CAST(total_bits AS DOUBLE) / n_tokens, 6) AS mean_bits
FROM perdoc
"""


@register(
    "text_surprisal_bits",
    oracle=_SURPRISAL_ORACLE,
    tags=("text", "quality"),
)
def text_surprisal_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-like document quality score without transcendentals:
    per-token surprisal = floor(log2(quantized inverse corpus
    frequency)) computed exactly as ``length(bin(x)) - 1`` (identical
    integer bit-math in Spark and DuckDB), averaged per document.
    Low mean-bits flags boilerplate (all-common tokens); high
    mean-bits flags noise/garbage — the two tails a curation pipeline
    cuts first.

    Two combinable aggregations plus a broadcast join of the (small)
    vocabulary rarity table against the token stream; the single-row
    corpus total is broadcast. No shuffle exceeds vocabulary size.
    """
    d = fanout(t(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
    )
    counts = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("cnt"))
    corpus = tok.agg(F.count("*").cast("bigint").alias("total"))
    rarity = (
        counts.crossJoin(F.broadcast(corpus))
        .withColumn(
            "bits",
            (
                F.length(F.bin(F.expr("(1000000000 * total) div cnt"))) - 1
            ).cast("bigint"),
        )
        .select("token", "bits")
    )
    perdoc = (
        tok.join(F.broadcast(rarity), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("bits").cast("bigint").alias("total_bits"),
        )
    )
    return perdoc.select(
        "doc_id",
        "n_tokens",
        "total_bits",
        F.round(F.col("total_bits").cast("double") / F.col("n_tokens"), 6)
        .alias("mean_bits"),
    )
