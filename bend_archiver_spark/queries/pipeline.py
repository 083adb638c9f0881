"""Composed curation pipelines — the end-to-end flows a training-data
engineer actually runs, built from the same operators the individual
queries expose. Both are pure DataFrame compositions with exact
oracles, proving the operators compose without correctness drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import hash64_expr, hash64_sql, register, t

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
    metadata. The gate is the inline ``quality_flag`` expression on
    the document scan (rule-identical to the quality_scores operator;
    a rule-table join here would cost a corpus-corpus shuffle for
    data one projection derives), and the keeper's metadata rides the
    same groupBy via min_by — so the whole pipeline is ONE
    map-combinable shuffle, no joins at all."""
    from ..operators.textops import quality_flag

    d = t(spark, sf_dir, "documents")
    passed = d.filter(quality_flag("text", min_words=_MIN_WORDS))
    set_key = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
            ),
        )
    )
    return (
        passed.select(
            "doc_id", "lang", "source", "n_chars", set_key.alias("set_key")
        )
        .groupBy("set_key")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by(
                F.struct("lang", "source", "n_chars"), F.col("doc_id")
            ).alias("m"),
        )
        .select("doc_id", "m.lang", "m.source", "m.n_chars")
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


@register(
    "pipeline_hash_sample",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS BIGINT) AS chars_sampled
    FROM documents
    WHERE {hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 < 10
    GROUP BY lang
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% corpus sample keyed on a portable hash of the
    document id — the reproducible-sampling primitive a training
    pipeline needs (same docs selected on every run, every engine,
    any partitioning; ``df.sample`` is seed+partition dependent).
    At 100 TB this is a pushed-down filter, not a shuffle."""
    d = t(spark, sf_dir, "documents")
    bucket = hash64_expr(F.col("doc_id").cast("string")) % 100
    return (
        d.filter(bucket < 10)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("n_chars").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("chars_sampled"),
        )
    )


@register(
    "pipeline_train_val_test",
    oracle=f"""
    SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (
      SELECT lang,
             CASE
               WHEN {hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 < 80
                 THEN 'train'
               WHEN {hash64_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
                 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    ) assigned
    GROUP BY lang, split
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from the same portable hash
    buckets — membership is a pure function of the document id, so
    re-runs, engine changes, and repartitioning never move a document
    across splits (the property that prevents train/test leakage)."""
    d = t(spark, sf_dir, "documents")
    bucket = hash64_expr(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "pipeline_stratified_sample",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled
    FROM documents
    WHERE {hash64_sql("CAST(doc_id AS VARCHAR)")} % 100
          < (CASE WHEN lang = 'en' THEN 10 ELSE 40 END)
    GROUP BY lang
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-language rates (down-sample the
    dominant language, keep more of the rest — the data-mixing knob
    for training corpora). Same portable-hash bucket as the uniform
    sample, so membership is reproducible and a document's fate never
    depends on partitioning; unlike ``df.sampleBy`` the rates are
    exact-deterministic, not Bernoulli draws."""
    d = t(spark, sf_dir, "documents")
    bucket = hash64_expr(F.col("doc_id").cast("string")) % 100
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(40))
    return (
        d.filter(bucket < rate)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


_SHARD_TOKEN_BUDGET = 10_000


@register(
    "pipeline_token_budget_shards",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tok,
             {hash64_sql("CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tok,
             CAST(SUM(n_tok) OVER (
               ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
      FROM tok
    )
    SELECT CAST(FLOOR((c - n_tok) / {_SHARD_TOKEN_BUDGET}.0) AS BIGINT)
             AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM cum
    GROUP BY 1
    """,
    tags=("pipeline", "sharding"),
)
def pipeline_token_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget shards: shuffle the
    corpus reproducibly (order by portable hash), running-total the
    token counts, and open a new shard every 10k tokens — how
    training data gets bin-packed into files of roughly equal token
    mass. A document is assigned by where it *starts*, so shards can
    overhang the budget by at most one document. The global ordered
    cumulative sum runs through operators/prefix.prefix_sum — a
    range-partition + per-partition-scan + broadcast-offsets plan
    that stays parallel (a bare ``Window.orderBy`` would drag the
    whole corpus through one partition)."""
    from ..operators.prefix import prefix_sum

    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tok"),
        hash64_expr(F.col("doc_id").cast("string")).alias("h"),
    )
    cum = prefix_sum(tok, ["h", "doc_id"], "n_tok").withColumn(
        "c", F.col("c").cast("bigint")
    )
    shard = F.floor(
        (F.col("c") - F.col("n_tok")) / F.lit(float(_SHARD_TOKEN_BUDGET))
    ).cast("bigint")
    return (
        cum.select(shard.alias("shard_id"), "n_tok")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tok").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("total_tokens"),
        )
    )


_TEMP_MIX_ORACLE = f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang),
mn AS (SELECT MIN(n_docs) AS min_docs FROM counts),
probs AS (
  SELECT lang, n_docs,
         CAST(floor(sqrt(CAST(min_docs AS DOUBLE)
                         / CAST(n_docs AS DOUBLE)) * 1000000)
              AS BIGINT) AS thresh
  FROM counts, mn),
kept AS (
  SELECT d.lang,
         CAST(COUNT(*) FILTER (
           WHERE {hash64_sql("concat('mix_', d.doc_id)")} % 1000000
                 < p.thresh) AS BIGINT) AS n_kept
  FROM documents d JOIN probs p ON p.lang = d.lang
  GROUP BY d.lang)
SELECT p.lang, p.n_docs, CAST(p.thresh AS DOUBLE) / 1000000 AS keep_prob,
       k.n_kept
FROM probs p JOIN kept k ON k.lang = p.lang
"""


@register(
    "pipeline_temperature_mix",
    oracle=_TEMP_MIX_ORACLE,
    tags=("pipeline", "sampling"),
)
def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (alpha = 0.5): each
    language stratum keeps documents with probability
    ``sqrt(min_stratum / stratum)``, flattening the size distribution
    the way multilingual-corpus mixing does (rare strata keep 100%,
    the dominant stratum is downsampled toward parity). Membership is
    decided by the portable md5 hash of the doc id against a per-
    strata integer threshold — fully deterministic, partition-
    independent, and reproducible on re-runs over grown corpora.
    ``sqrt`` and division are IEEE correctly-rounded, so the
    thresholds are bit-identical across engines. The stratum stats
    are two tiny broadcast joins; the corpus scan stays a single
    filter pass at any scale."""
    d = t(spark, sf_dir, "documents")
    # persist the per-language counts (|languages| rows): they feed
    # the min aggregate, the threshold table, and the final output
    # join, and without the barrier each consumer re-runs the corpus
    # groupBy — measured 5 document scans for what is one count pass
    # plus one filter pass. Callers clear cache between queries.
    counts = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .persist()
    )
    mn = counts.agg(F.min("n_docs").alias("min_docs"))
    probs = counts.join(F.broadcast(mn)).select(
        "lang",
        "n_docs",
        F.floor(
            F.sqrt(
                F.col("min_docs").cast("double") / F.col("n_docs").cast("double")
            )
            * 1000000
        )
        .cast("bigint")
        .alias("thresh"),
    )
    accepted = hash64_expr(F.concat(F.lit("mix_"), F.col("doc_id"))) % 1000000 < F.col("thresh")
    kept = (
        d.join(F.broadcast(probs.select("lang", "thresh")), "lang")
        .groupBy("lang")
        .agg(
            F.count_if(accepted).cast("bigint").alias("n_kept"),
        )
    )
    return probs.join(kept, "lang").select(
        "lang",
        "n_docs",
        (F.col("thresh").cast("double") / 1000000).alias("keep_prob"),
        "n_kept",
    )


_RESERVOIR_ORACLE = f"""
WITH ranked AS (
  SELECT source, doc_id,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY {hash64_sql("concat('rsv_', doc_id)")}, doc_id
         ) AS BIGINT) AS rn
  FROM documents)
SELECT source, doc_id, rn FROM ranked WHERE rn <= 5
"""


@register(
    "pipeline_reservoir_per_source",
    oracle=_RESERVOIR_ORACLE,
    tags=("pipeline", "sampling"),
)
def pipeline_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sample (k=5 per source): rank documents
    by the portable hash of their id and keep the first five — the
    deterministic equivalent of per-key reservoir sampling
    (hash-ordering a uniform-ish permutation), reproducible across
    runs and unchanged for surviving members when the corpus grows.
    Complements the fixed-*rate* samplers (pipeline_hash_sample,
    pipeline_stratified_sample): eval sets want fixed size, not fixed
    rate.

    Skew-safe shape: WindowExec sorts the whole group (no per-group
    heap), so a dominating source would funnel through one task; the
    two-phase salted top-k (operators/skew.py) bounds every sort to
    ~1/16 of the hottest source, then takes the exact window over at
    most 16*5 survivors per source. Same oracle."""
    from ..operators.skew import salted_topk

    d = t(spark, sf_dir, "documents")
    rank_key = hash64_expr(F.concat(F.lit("rsv_"), F.col("doc_id")))
    return salted_topk(
        d,
        "source",
        [rank_key, F.col("doc_id")],
        5,
        salt_expr=F.xxhash64(F.col("doc_id")),
        rank_alias="rn",
    ).select("source", "doc_id", "rn")


_CHUNK_SIZE = 200
_CHUNK_STRIDE = 150

_CHUNK_ORACLE = f"""
WITH starts AS (
  SELECT doc_id, text, n_chars,
         unnest(range(0, n_chars, {_CHUNK_STRIDE})) AS chunk_start
  FROM documents),
chunks AS (
  SELECT doc_id,
         CAST(chunk_start // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
         CAST(chunk_start AS BIGINT) AS chunk_start,
         substr(text, chunk_start + 1, {_CHUNK_SIZE}) AS chunk
  FROM starts)
SELECT doc_id, chunk_idx, chunk_start,
       CAST(length(chunk) AS BIGINT) AS chunk_len,
       md5(chunk) AS chunk_md5
FROM chunks
"""


@register(
    "pipeline_chunk_documents",
    oracle=_CHUNK_ORACLE,
    tags=("pipeline", "chunking"),
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (200-char windows, stride 150,
    25% overlap) — the context-window splitting step that precedes
    tokenization and packing in an LLM ingest pipeline. Chunk starts
    come from a per-row ``sequence`` explode (a zero-shuffle
    generator); each chunk carries its offset, length, and content
    hash so downstream dedup/packing can operate without re-reading
    the text. At 100 TB this runs as a map-only stage — no exchange
    anywhere in the plan."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    starts = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_chars") - 1, F.lit(_CHUNK_STRIDE)
            )
        ).alias("chunk_start"),
    )
    chunk = F.substring(
        F.col("text"), F.col("chunk_start") + 1, _CHUNK_SIZE
    )
    return starts.select(
        "doc_id",
        F.expr(f"chunk_start div {_CHUNK_STRIDE}")
        .cast("bigint")
        .alias("chunk_idx"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
        F.md5(chunk.cast("binary")).alias("chunk_md5"),
    )


_CHUNK_DEDUP_ORACLE = f"""
WITH starts AS (
  SELECT doc_id, text, n_chars,
         unnest(range(0, n_chars, {_CHUNK_STRIDE})) AS chunk_start
  FROM documents),
chunks AS (
  SELECT doc_id, md5(substr(text, chunk_start + 1, {_CHUNK_SIZE})) AS chunk_md5
  FROM starts),
keepers AS (
  SELECT chunk_md5, MIN(doc_id) AS keeper_doc,
         CAST(COUNT(*) AS BIGINT) AS n_copies
  FROM chunks GROUP BY chunk_md5)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) FILTER (WHERE k.keeper_doc = c.doc_id) AS BIGINT)
         AS n_kept,
       CAST(COUNT(*) FILTER (WHERE k.n_copies > 1) AS BIGINT)
         AS n_shared
FROM chunks c JOIN keepers k ON k.chunk_md5 = c.chunk_md5
GROUP BY c.doc_id
"""


@register(
    "pipeline_dedup_chunks",
    oracle=_CHUNK_DEDUP_ORACLE,
    tags=("pipeline", "chunking", "dedup"),
)
def pipeline_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup composed over the sliding-window
    chunker: each chunk's content hash elects a keeper (min doc_id);
    per document, report how many of its chunks it owns vs shares —
    the sub-document dedup pass that strips boilerplate spans
    repeated across a corpus without dropping whole documents. One
    shuffle on the content hash, one on doc_id; both combinable."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    chunks = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_chars") - 1, F.lit(_CHUNK_STRIDE))
        ).alias("chunk_start"),
        "text",
    ).select(
        "doc_id",
        F.md5(
            F.substring(
                F.col("text"), F.col("chunk_start") + 1, _CHUNK_SIZE
            ).cast("binary")
        ).alias("chunk_md5"),
    )
    keepers = chunks.groupBy("chunk_md5").agg(
        F.min("doc_id").alias("keeper_doc"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )
    return (
        chunks.join(keepers, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.count_if(F.col("keeper_doc") == F.col("doc_id"))
            .cast("bigint")
            .alias("n_kept"),
            F.count_if(F.col("n_copies") > 1)
            .cast("bigint")
            .alias("n_shared"),
        )
    )
