"""Similarity-search operators — parameterized library API over an
``array<float>`` embedding column.

Numeric determinism: components are quantized to integers
(``round(x * 1e6)`` as int64) before any accumulation, so every dot
product and norm is **exact int64 arithmetic** — bit-identical across
engines, partitionings, and evaluation strategies. That freedom is
what allows the fast path here: dots are computed with
``zip_with``/``aggregate`` over paired arrays (one row per pair, no
64x positional explode+join — measured ~2x faster at 5k vectors), and
the results still match the explode-based DuckDB oracles exactly
because integer addition is associative.

The LSH hyperplane signs are derived from the portable md5 hash; they
are computed driver-side into array literals (identical values to the
SQL form), so bucketing needs no sign-table join at all.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.base import fanout

__all__ = [
    "adaptive_planes",
    "adaptive_tables",
    "explode_quantized",
    "quantized_vectors",
    "cosine_pairs",
    "cosine_pairs_lsh",
    "cosine_topk",
    "lsh_buckets",
    "lsh_table_buckets",
]

QSCALE = 1_000_000

# Scale-adaptive LSH sizing. With a FIXED plane count p there are only
# 2^p buckets per table, so by convexity of sum-of-C(bucket,2) the
# candidate volume of ANY corpus of n vectors is at least
# tables * 2^p * C(n/2^p, 2) ~ n^2/2^p — a floor no corpus shape can
# beat (uniform occupancy is the BEST case, clustered corpora are
# strictly worse). 6 planes is right for thousands of vectors and a
# quadratic wall at hundreds of thousands; the standard fix (Indyk &
# Motwani; Charikar's hyperplane family) is planes ~ log2(n), keeping
# expected bucket occupancy — and therefore candidates-per-vector —
# constant as the corpus grows.
LSH_PLANES_FLOOR = 6  # never fewer: the small-corpus sweet spot
LSH_PLANES_CAP = 15  # 32k buckets/table; revisit past ~2M vectors
LSH_TARGET_BUCKET = 64  # target mean bucket occupancy

# Table-count amplification alongside the plane growth. Growing planes
# alone makes the gate selective but collapses recall: a pair agreeing
# with per-plane probability p* survives one table with p*^planes, so
# recall over T tables is 1-(1-p*^planes)^T — at a fixed T=8 the
# cosine-0.85 near-dup recall falls 0.95 -> 0.56 between 6 and 12
# planes. The standard LSH amplification (Indyk–Motwani: hold
# T * p*^planes constant) grows tables by (1/p*)^(extra planes) at a
# chosen DESIGN cosine. The ladder below is
# ceil(8 * (1/p*)^(p - 6)) for p in [6, 15] with p* = 1 - acos(0.85)/pi
# (the near-dup design point), which holds measured recall at:
#   cosine 0.95: >= 0.998 at every rung;  0.90: 0.982 -> 0.991;
#   cosine 0.85: 0.950 -> 0.923 (the designed-for band);
#   cosine 0.70: 0.78 -> 0.44;  0.45: 0.46 -> 0.07 — low-threshold
# recall is NOT held (amplifying it is exponentially expensive; LSH is
# a near-dup gate, not a low-similarity join). Work cost is the n^rho
# law: total projections = tables * planes per vector, and candidate
# volume grows linearly with tables while staying O(n) per table.
# Hardcoded integer literals so the DuckDB oracle mirrors the exact
# ladder (a float-acos at query time could round differently);
# tests/test_oracle_parity.py re-derives it from the formula.
LSH_DESIGN_COSINE = 0.85
LSH_TABLES_LADDER = (8, 10, 12, 15, 18, 22, 26, 32, 38, 46)


def adaptive_tables(n_planes: int) -> int:
    """Table count paired with ``n_planes`` by the amplification
    ladder above — clamped to the [floor, cap] plane range."""
    idx = min(max(n_planes, LSH_PLANES_FLOOR), LSH_PLANES_CAP)
    return LSH_TABLES_LADDER[idx - LSH_PLANES_FLOOR]


def adaptive_planes(
    n_vectors: int,
    floor_planes: int = LSH_PLANES_FLOOR,
    target_bucket: int = LSH_TARGET_BUCKET,
    cap: int = LSH_PLANES_CAP,
) -> int:
    """Smallest plane count p in [floor_planes, cap] with
    ``2^p * target_bucket >= n_vectors`` (i.e. mean bucket occupancy
    <= target_bucket). Pure integer arithmetic — the DuckDB oracle
    mirrors it as a threshold CASE ladder over the same boundaries
    (queries/dedup.py), so the two engines can never diverge on
    float-log rounding at an exact power-of-two corpus size."""
    p = floor_planes
    while p < cap and (1 << p) * target_bucket < n_vectors:
        p += 1
    return p


def _hash_sign(j: int, i: int) -> int:
    """±1 from the portable 60-bit md5 hash of 'j_i' — identical to
    the SQL-side derivation (queries/base.py hash64)."""
    h = int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 1 else -1


def _q6_array(vec_col: str) -> Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * QSCALE, 0).cast("long"),
    )


def _dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, vq, nrm): quantized array + exact squared norm, fanned
    out to full parallelism (small single-file corpora otherwise
    serialize all vector math on one core)."""
    out = fanout(df)
    out = out.select(
        F.col(id_col).alias("vec_id"), _q6_array(vec_col).alias("vq")
    )
    return out.select(
        "vec_id", "vq", _dot(F.col("vq"), F.col("vq")).alias("nrm")
    )


def explode_quantized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [*extra], i, xq): positional explode with quantized
    components — the row form used where per-dimension joins are
    genuinely needed. ``extra_cols`` carries metadata (e.g. the label)
    THROUGH the explode so callers never join the corpus-sized
    component stream back to the source table for columns one scan
    already had."""
    out = fanout(df)
    return out.select(
        F.col(id_col).alias("vec_id"),
        *extra_cols,
        F.posexplode(vec_col).alias("i", "x"),
    ).select(
        "vec_id",
        *extra_cols,
        "i",
        F.round(F.col("x").cast("double") * QSCALE, 0).cast("long").alias("xq"),
    )


def _cosine_from(dot: Column, nrm_a: Column, nrm_b: Column) -> Column:
    return dot.cast("double") / (
        F.sqrt(nrm_a.cast("double")) * F.sqrt(nrm_b.cast("double"))
    )


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs with cosine >= threshold — exact, O(n^2/2) pair rows
    with one zip_with dot each. The small-corpus baseline /
    verification oracle; use lsh_buckets + cosine_topk for large
    corpora."""
    v = quantized_vectors(df, id_col, vec_col)
    a = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("vq").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("vq").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = _cosine_from(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
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
    IVF bucketing stage. Deterministic (cosine desc, id) ranking.

    The query side is broadcast with its vectors; each corpus row
    computes one integer dot — no positional explode, no index join.
    """
    v = quantized_vectors(corpus, id_col, vec_col)
    qids = corpus.filter(query_filter).select(F.col(id_col).alias("query_id"))
    q = v.join(
        F.broadcast(qids), v.vec_id == qids.query_id
    ).select("query_id", F.col("vq").alias("qv"), F.col("nrm").alias("nrm_q"))
    c = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vq").alias("cv"),
        F.col("nrm").alias("nrm_c"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    if candidates is not None:
        pairs = pairs.join(candidates, ["query_id", "neighbor_id"], "left_semi")
    cos = _cosine_from(
        _dot(F.col("qv"), F.col("cv")), F.col("nrm_q"), F.col("nrm_c")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_table_buckets(
    v: DataFrame,
    n_tables: int = 8,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Multi-table hyperplane LSH: (vec_id, tbl, bucket) — table ``t``
    uses the ``n_planes`` hyperplanes with global indices
    ``[t*n_planes, (t+1)*n_planes)`` so every table is an independent
    hash family. ``v`` is a :func:`quantized_vectors` frame. All
    ``n_tables * n_planes`` sign projections are computed in ONE
    narrow pass (no join, no shuffle) and exploded to one row per
    (vector, table).

    Multiple tables trade candidate volume for recall: a pair is a
    candidate if it collides in ANY table, so recall at cosine ``c``
    is ``1 - (1 - p^planes)^tables`` with ``p = 1 - acos(c)/pi`` —
    8x6 gives ~99.8% at c=0.9 while keeping random (c~0) collisions
    ~1/2^6 per table. Recall falls as planes grow at FIXED tables
    (8x12 is ~0.56 at c=0.85); callers that grow planes with corpus
    size must amplify tables alongside (:func:`adaptive_tables`,
    the ``LSH_TABLES_LADDER`` recall matrix).

    The sign matrix is computed JVM-side ONCE (a one-row broadcast,
    same md5 derivation as :func:`_hash_sign`) and the projections run
    through higher-order functions — one compiled lambda looped at
    runtime. Unrolling tables*planes*dim literal sign expressions
    instead costs seconds of driver-side analysis before the first row
    moves (measured 11s -> 1s warm at 8x6x64)."""
    signs_sql = f"""
      transform(sequence(0, {n_tables * n_planes - 1}), g ->
        transform(sequence(0, {dim - 1}), i ->
          CASE WHEN CAST(conv(substring(md5(concat(g, '_', i)), 1, 15), 16, 10)
                     AS BIGINT) % 2 = 1
               THEN 1L ELSE -1L END))
    """
    signs_df = v.sparkSession.range(1).select(F.expr(signs_sql).alias("_signs"))
    vv = v.crossJoin(F.broadcast(signs_df)).withColumn(
        "_dots", F.transform(F.col("_signs"), lambda row: _dot(F.col("vq"), row))
    )
    tb = F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.struct(
            t.cast("int").alias("tbl"),
            F.aggregate(
                F.sequence(F.lit(0), F.lit(n_planes - 1)),
                F.lit(0).cast("long"),
                lambda acc, b: acc + F.when(
                    F.element_at(F.col("_dots"), (t * n_planes + b + 1).cast("int")) > 0,
                    F.pow(F.lit(2.0), b.cast("double")).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ).alias("bucket"),
        ),
    )
    return vv.select("vec_id", F.explode(tb).alias("tb")).select(
        "vec_id",
        F.col("tb.tbl").alias("tbl"),
        F.col("tb.bucket").alias("bucket"),
    )


def cosine_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_tables: int | None = 8,
    n_planes: int | None = 6,
    dim: int = 64,
) -> DataFrame:
    """Near-dup pairs with cosine >= threshold, candidates gated by
    multi-table hyperplane LSH — the scale path for
    :func:`cosine_pairs`. Candidates are pairs sharing a bucket in any
    table (a shuffle join on (tbl, bucket), never O(n^2)); each
    candidate is then verified with one exact int64 ``zip_with`` dot.
    Missed pairs are those colliding in no table: a pair at cosine c
    agrees with each plane with probability p = 1 - acos(c)/pi, so
    recall is 1 - (1 - p^planes)^tables — NOT effectively 1; see the
    ``LSH_TABLES_LADDER`` comment for the measured recall matrix
    (>= 0.92 for cosine >= 0.85 at every rung, decaying at lower
    thresholds, e.g. ~0.46 -> ~0.13 at cosine 0.45 between the floor
    and 12 planes — inherent to LSH amplification economics).

    ``n_planes=None`` sizes the gate from the corpus:
    :func:`adaptive_planes` keeps mean bucket occupancy bounded
    (planes ~ log2(n)), which is what holds candidates to O(n) as the
    corpus scales — a fixed plane count has an n^2/2^p candidate
    FLOOR regardless of corpus shape (see the module comment).
    ``n_tables=None`` pairs the table count with the plane count via
    :func:`adaptive_tables`, holding near-dup recall as planes grow
    (a fixed 8 tables at 12 planes would drop cosine-0.85 recall to
    ~0.56). The corpus size comes from one ``v.count()`` over the
    just-persisted quantized frame — the sizing probe doubles as the
    cache materialization pass, so adaptive sizing adds no extra
    source scan."""
    # persist the quantized-vector table FIRST: it feeds the sizing
    # probe, the bucket derivation AND both verification sides; without
    # the barrier each consumer re-runs the scan+quantize — measured 4
    # embedding scans; with it, ONE (the re-derivations off the cache
    # are map-only). Same footprint as the vectors themselves; spills
    # rather than OOMs. Callers clear cache between queries.
    v = quantized_vectors(df, id_col, vec_col).persist()
    if n_planes is None:
        n_planes = adaptive_planes(v.count())
    if n_tables is None:
        n_tables = adaptive_tables(n_planes)
    buckets = lsh_table_buckets(v.select("vec_id", "vq"), n_tables, n_planes, dim)
    a = buckets.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    b = buckets.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    va = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("vq").alias("va"),
        F.col("nrm").alias("na"),
    )
    vb = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("vq").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = _cosine_from(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
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
    are ±1 vectors derived from the portable md5 hash, materialized as
    array literals at plan time — each vector's bucket is ``n_planes``
    zip_with dots, no join. More planes -> smaller buckets -> cheaper
    search, lower recall."""
    v = quantized_vectors(corpus, id_col, vec_col).select("vec_id", "vq")
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        signs = F.array(
            *[F.lit(_hash_sign(j, i)).cast("long") for i in range(dim)]
        )
        dot_j = _dot(F.col("vq"), signs)
        bucket = bucket + F.when(
            dot_j > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return v.select("vec_id", bucket.alias("bucket"))
