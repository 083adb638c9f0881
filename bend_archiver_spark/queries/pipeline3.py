"""Round-6 pipeline + verification operators.

- ``pipeline_systematic_sample``: every 50th document in a
  deterministic hash order — systematic sampling with the global
  rank from the DISTRIBUTED prefix sum, never a SinglePartition
  row_number.
- ``pipeline_interleave_sources``: deterministic round-robin data
  mixing across sources — the "interleave shards from different
  sources" operator in front of sequential training readers. The
  per-source rank comes from ONE global prefix-sum rank plus
  broadcast per-source offsets (a per-source window would sort each
  corpus-proportional source in one task).
- ``verify_block_fingerprints``: order-independent content checksum
  (bit_xor of row hashes) per key block — the archiver's
  count-verification (A31) strengthened to content equality; two
  such tables diff block-by-block to localize corruption without
  moving rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.prefix import grouped_rank, prefix_sum
from .base import hash64_expr, hash64_sql, register, t

_SAMPLE_EVERY = 50
_BLOCK_W = 1000  # l_orderkey block width for fingerprinting


@register(
    "pipeline_systematic_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {hash64_sql("concat('sys_', doc_id)")} AS hk
      FROM documents),
    r AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY hk, doc_id) AS rank
      FROM h)
    SELECT doc_id, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank % {_SAMPLE_EVERY} = 1
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_systematic_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Systematic 1-in-50 sample in a deterministic pseudo-random
    order: rank every document by its 60-bit id hash (so the stride
    walks a shuffled order, not ingestion order — the classic
    periodicity hazard of systematic sampling) and keep ranks
    = 1 mod 50. The rank is the distributed prefix sum of ones
    (``operators/prefix.py``) — a bare row_number() OVER (ORDER BY)
    would single-task the corpus. Partition-invariant and repeatable:
    the sample is a pure function of doc ids."""
    d = t(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        hash64_expr(F.concat(F.lit("sys_"), F.col("doc_id"))).alias("hk"),
    )
    ranked = prefix_sum(
        h.withColumn("_one", F.lit(1)),
        ["hk", "doc_id"],
        "_one",
        out_col="rank",
        precision="decimal(38,0)",
    ).select("doc_id", F.col("rank").cast("bigint").alias("rank"))
    return ranked.filter(F.col("rank") % _SAMPLE_EVERY == 1)


@register(
    "pipeline_interleave_sources",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             {hash64_sql("concat('mix_', doc_id)")} AS hk
      FROM documents WHERE source IS NOT NULL),
    si AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx,
             COUNT(*) OVER () AS n_sources
      FROM (SELECT DISTINCT source FROM h)),
    r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY hk, doc_id) AS src_rank
      FROM h)
    SELECT r.doc_id, r.source,
           CAST(r.src_rank AS BIGINT) AS src_rank,
           CAST((r.src_rank - 1) * si.n_sources + si.src_idx AS BIGINT)
             AS position
    FROM r JOIN si USING (source)
    """,
    tags=("pipeline", "mixing"),
)
def pipeline_interleave_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic round-robin source interleave — training-data
    mixing that alternates sources (position = (rank_within_source-1)
    * n_sources + source_index) so a sequential reader never sees one
    source's documents bunched together. Within each source the order
    is the 60-bit id hash (shuffled but reproducible).

    Scale shape: the within-source rank does NOT use a per-source
    window (a dominant source would sort in one task). Instead ONE
    global prefix-sum rank over (source, hash, doc_id) — sources are
    contiguous in that total order — minus each source's broadcast
    start offset (exclusive running total of per-source counts over
    the |sources|-row table) gives the same rank with every phase
    parallel (the shared ``grouped_rank`` helper); bit-identical to
    the window form, which the oracle uses. NULL sources are filtered
    on BOTH engines: src_idx is a CROSS-group artifact, and Spark
    (NULLS FIRST) and DuckDB (NULLS LAST) would index a NULL group at
    opposite ends, shifting every position — the grouped_rank caller
    contract."""
    d = t(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    h = d.select(
        "doc_id",
        "source",
        hash64_expr(F.concat(F.lit("mix_"), F.col("doc_id"))).alias("hk"),
    )
    ranked = grouped_rank(h, "source", ["hk", "doc_id"], out_col="src_rank")
    from pyspark.sql import Window

    counts = h.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    ws = Window.orderBy("source")
    si = counts.select(
        "source",
        (F.row_number().over(ws) - 1).cast("bigint").alias("src_idx"),
    ).crossJoin(
        counts.agg(F.count(F.lit(1)).cast("bigint").alias("n_sources"))
    )
    return ranked.join(F.broadcast(si), "source").select(
        "doc_id",
        "source",
        F.col("src_rank"),
        (
            (F.col("src_rank") - 1) * F.col("n_sources") + F.col("src_idx")
        ).alias("position"),
    )


_FP_ROW_SQL = (
    "concat(l_orderkey::VARCHAR, '|', l_partkey::VARCHAR, '|', "
    "CAST(round(l_quantity * 100, 0) AS BIGINT)::VARCHAR, '|', "
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)::VARCHAR, '|', "
    "l_returnflag)"
)


@register(
    "verify_block_fingerprints",
    oracle=f"""
    SELECT CAST(l_orderkey // {_BLOCK_W} AS BIGINT) AS block,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor({hash64_sql(_FP_ROW_SQL)}) AS BIGINT) AS checksum
    FROM lineitem
    GROUP BY 1
    """,
    headline=True,
    tags=("verify", "archiver", "fingerprint"),
)
def verify_block_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Block-level content fingerprints of the fact table: per
    1000-orderkey block, the row count AND the bit_xor of 60-bit row
    hashes — XOR is order- and partition-independent, so two sides of
    an archive (source extract vs target) produce identical checksums
    iff their block contents match exactly, and a mismatch names the
    block to re-extract without moving any rows (the reference
    verifies COUNTs only, A31 cf. /root/reference/worker/worker.go;
    this is the content-equality upgrade). Floats enter the hash as
    x100-quantized int64 strings — identical text on both engines —
    and the whole fingerprint pass is ONE map-combinable groupBy."""
    li = t(spark, sf_dir, "lineitem")
    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.round(F.col("l_quantity") * 100, 0).cast("bigint").cast("string"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .cast("string"),
        F.col("l_returnflag"),
    )
    return (
        li.select(
            F.expr(f"l_orderkey div {_BLOCK_W}").cast("bigint").alias(
                "block"
            ),
            hash64_expr(row_str).alias("h"),
        )
        .groupBy("block")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(h)").cast("bigint").alias("checksum"),
        )
    )
