"""Similarity-search operators — parameterized library API over an
``array<float>`` embedding column.

Components are integer-quantized (``round(x * 1e6)`` as int64) before
accumulation so dot products and norms are exact integer arithmetic —
deterministic across runs/partitionings (see queries/similarity.py for
why double->decimal casts are not portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["explode_quantized", "cosine_pairs", "cosine_topk", "lsh_buckets"]

QSCALE = 1_000_000


def explode_quantized(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, i, xq): positional explode with quantized components.
    Fans the input out to full parallelism first — a single-file
    corpus otherwise serializes the explode on one core."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return df.select(
        F.col(id_col).alias("vec_id"), F.posexplode(vec_col).alias("i", "x")
    ).select(
        "vec_id",
        "i",
        F.round(F.col("x").cast("double") * QSCALE, 0).cast("long").alias("xq"),
    )


def _norms(e: DataFrame) -> DataFrame:
    return e.groupBy("vec_id").agg(F.sum(F.col("xq") * F.col("xq")).alias("nrm"))


def _cosine() -> Column:
    return F.col("dot").cast("double") / (
        F.sqrt(F.col("nrm_q").cast("double"))
        * F.sqrt(F.col("nrm_c").cast("double"))
    )


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs with cosine >= threshold — exact, O(n^2/2) via the
    index-aligned join. The small-corpus baseline / verification
    oracle; use lsh_buckets + cosine_topk for large corpora."""
    e = explode_quantized(df, id_col, vec_col)
    norms = _norms(e)
    ea = e.select(F.col("vec_id").alias("vec_a"), "i", F.col("xq").alias("qa"))
    eb = e.select(F.col("vec_id").alias("vec_b"), "i", F.col("xq").alias("qb"))
    dots = (
        ea.join(eb, "i")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("vec_a"), F.col("nrm").alias("nrm_q"))
    nb = norms.select(F.col("vec_id").alias("vec_b"), F.col("nrm").alias("nrm_c"))
    return (
        dots.join(na, "vec_a")
        .join(nb, "vec_b")
        .select("vec_a", "vec_b", _cosine().alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    query_filter: Column,
    k: int = 5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k cosine neighbors for the query subset (rows matching
    ``query_filter``). Brute force against the whole corpus, or
    restricted to ``candidates`` (query_id, neighbor_id) from an LSH /
    IVF bucketing stage. Deterministic (cosine desc, id) ranking."""
    e = explode_quantized(corpus, id_col, vec_col)
    norms = _norms(e)
    qids = corpus.filter(query_filter).select(
        F.col(id_col).alias("query_id")
    )
    q = e.join(
        F.broadcast(qids), e.vec_id == qids.query_id
    ).select("query_id", "i", F.col("xq").alias("qa"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), "i", F.col("xq").alias("qb"))
    pairs = q.join(c, "i").filter(F.col("neighbor_id") != F.col("query_id"))
    if candidates is not None:
        pairs = pairs.join(candidates, ["query_id", "neighbor_id"], "left_semi")
    dots = pairs.groupBy("query_id", "neighbor_id").agg(
        F.sum(F.col("qa") * F.col("qb")).alias("dot")
    )
    nq = norms.select(F.col("vec_id").alias("query_id"), F.col("nrm").alias("nrm_q"))
    nc = norms.select(
        F.col("vec_id").alias("neighbor_id"), F.col("nrm").alias("nrm_c")
    )
    w = Window.partitionBy("query_id").orderBy(_cosine().desc(), F.col("neighbor_id"))
    return (
        dots.join(F.broadcast(nq), "query_id")
        .join(nc, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).alias("rank"),
            _cosine().alias("cosine"),
        )
        .filter(F.col("rank") <= k)
    )


def lsh_buckets(
    spark: SparkSession,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH buckets: (vec_id, bucket). Hyperplanes
    are ±1 vectors derived from the portable md5 hash — deterministic,
    reproducible, no stored model. More planes -> smaller buckets ->
    cheaper search, lower recall."""
    signs = (
        spark.range(n_planes)
        .select(F.col("id").cast("int").alias("j"))
        .crossJoin(spark.range(dim).select(F.col("id").cast("int").alias("i")))
        .select(
            "j",
            "i",
            F.when(
                F.conv(
                    F.substring(F.md5(F.concat_ws("_", "j", "i")), 1, 15), 16, 10
                ).cast("bigint")
                % 2
                == 1,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("sgn"),
        )
    )
    e = explode_quantized(corpus, id_col, vec_col)
    proj = (
        e.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("xq") * F.col("sgn")).alias("dot_j"))
    )
    return proj.groupBy("vec_id").agg(
        F.sum(
            F.when(
                F.col("dot_j") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("bucket")
    )
