"""Product quantization (PQ) — the compression + search format real
100 TB vector stores run on (IVF-PQ: Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

Two passes:

- ``embedding_pq_encode``: encode every vector as M sub-codebook ids
  (the build side of a PQ index);
- ``ann_pq_adc_topk``: asymmetric-distance search — queries stay exact,
  database vectors are represented by their codes, distances come from
  a per-query lookup table over sub-centroids.

Like embedding.py's fixed-codebook operators, the sub-codebooks are
FIXED (subspace slices of the vectors with ``vec_id < _PQ_K``) instead
of trained, which keeps every stage exact int64 arithmetic (components
quantized at 1e6) and therefore driver-checkable end-to-end; swapping a
trained codebook changes no plan shape.

Scale design: the codebook is a broadcast (K vectors); encoding is one
broadcast fan-out join + one map-side-combinable groupBy + one window
on (vec_id, subspace); ADC search broadcasts the per-query LUT
(Q*M*K rows) and touches each code row once — no all-pairs product
anywhere. Reference delegates all compute (SURVEY §2 Table B "None");
this is a beyond-reference operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.similarity import explode_quantized
from .base import fanout, hash64_sql, register, t

_PQ_M = 8  # subspaces (64-dim embeddings -> 8 dims per subspace)
_PQ_K = 4  # centroids per sub-codebook: slices of vectors vec_id < 4
_SUB_DIM = 8
_N_QUERIES = 10  # vec_id < 10 is the query set (as in queries/similarity.py)
_TOP_K = 5

# quantized components with subspace index, shared CTE
_EM_SQL = f"""
      SELECT vec_id,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS xq,
             (generate_subscripts(embedding, 1) - 1) // {_SUB_DIM} AS m,
             generate_subscripts(embedding, 1) - 1 AS i
      FROM embeddings
"""

_PQ_ENCODE_ORACLE = f"""
WITH e AS ({_EM_SQL}),
cent AS (SELECT vec_id AS cid, m, i, xq FROM e WHERE vec_id < {_PQ_K}),
d2 AS (
  SELECT v.vec_id, v.m, c.cid,
         SUM((v.xq - c.xq) * (v.xq - c.xq)) AS dist
  FROM e v JOIN cent c ON c.i = v.i
  GROUP BY 1, 2, 3),
ranked AS (
  SELECT vec_id, m, cid, dist,
         row_number() OVER (PARTITION BY vec_id, m
                            ORDER BY dist, cid) AS rn
  FROM d2)
SELECT vec_id, m AS subspace, cid AS code,
       CAST(dist AS BIGINT) AS dist_q
FROM ranked WHERE rn = 1
"""


def _subspace_distances(
    spark: SparkSession, sf_dir: str, persist: bool = False
) -> DataFrame:
    """(vec_id, m, cid, dist): exact int64 squared L2 from every
    vector's subspace slice to every sub-centroid — the shared front
    end of encode and ADC search. ``persist`` only when the caller
    consumes it through multiple branches (ADC: codes + per-query
    LUT); single-consumer encode skips the cache-write overhead (same
    policy as minhash's persist_shingles)."""
    emb = t(spark, sf_dir, "embeddings")
    e = explode_quantized(emb, "vec_id", "embedding").withColumn(
        "m", (F.col("i") / _SUB_DIM).cast("int")
    )
    cent = e.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), "i", F.col("xq").alias("cq")
    )
    diff = F.col("xq") - F.col("cq")
    d2 = (
        e.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "m", "cid")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    return d2.persist() if persist else d2


def _encoded(d2: DataFrame) -> DataFrame:
    """(vec_id, subspace, code, dist_q): nearest sub-centroid per
    subspace by exact int64 squared L2, ties to the smaller code."""
    win = Window.partitionBy("vec_id", "m").orderBy("dist", "cid")
    return (
        d2.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("m").alias("subspace"),
            F.col("cid").alias("code"),
            F.col("dist").cast("bigint").alias("dist_q"),
        )
    )


@register(
    "embedding_pq_encode",
    oracle=_PQ_ENCODE_ORACLE,
    tags=("embedding", "quantization", "pq"),
)
def embedding_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding: each 64-dim vector becomes 8 sub-codebook ids (one
    nearest centroid per 8-dim slice, exact int64 distances, ties to
    the smaller id) plus the per-subspace quantization error. 8 codes
    x 2 bits replace 256 bytes of float32 — the compression that makes
    billion-vector stores fit in memory. One broadcast join + one
    combinable groupBy + one (vec_id, subspace) window; at 100 TB the
    window key is fine-grained enough to never concentrate."""
    return _encoded(_subspace_distances(spark, sf_dir))


_PQ_ADC_ORACLE = f"""
WITH e AS ({_EM_SQL}),
cent AS (SELECT vec_id AS cid, m, i, xq FROM e WHERE vec_id < {_PQ_K}),
d2 AS (
  SELECT v.vec_id, v.m, c.cid,
         SUM((v.xq - c.xq) * (v.xq - c.xq)) AS dist
  FROM e v JOIN cent c ON c.i = v.i
  GROUP BY 1, 2, 3),
codes AS (
  SELECT vec_id, m, cid AS code
  FROM (SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, cid) AS rn
        FROM d2) r
  WHERE rn = 1),
lut AS (
  SELECT vec_id AS query_id, m, cid, dist FROM d2
  WHERE vec_id < {_N_QUERIES}),
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         SUM(l.dist) AS adc_dist_q
  FROM codes c
  JOIN lut l ON l.m = c.m AND l.cid = c.code
  WHERE c.vec_id <> l.query_id
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, neighbor_id, CAST(adc_dist_q AS BIGINT) AS adc_dist_q,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist_q, neighbor_id) AS rank
  FROM adc)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, adc_dist_q
FROM ranked WHERE rank <= {_TOP_K}
"""


@register(
    "ann_pq_adc_topk",
    oracle=_PQ_ADC_ORACLE,
    tags=("embedding", "ann", "pq"),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k: each query precomputes a lookup
    table of exact distances to every sub-centroid (Q x M x K rows —
    broadcast), then a database vector's approximate distance is just
    the sum of M table lookups on its codes. The scan side touches
    each (vec_id, subspace) code row once via a broadcast hash join —
    the IVF-PQ search shape that serves billion-vector ANN, with no
    per-vector float math at query time. Ties rank to the smaller
    neighbor id; all arithmetic exact int64."""
    d2 = _subspace_distances(spark, sf_dir, persist=True)
    codes = _encoded(d2).select(
        "vec_id", F.col("subspace").alias("m"), "code"
    )
    lut = d2.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "m",
        F.col("cid").alias("code"),
        "dist",
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dist").cast("bigint").alias("adc_dist_q"))
    )
    rank_win = Window.partitionBy("query_id").orderBy(
        "adc_dist_q", "neighbor_id"
    )
    return (
        adc.withColumn(
            "rank", F.row_number().over(rank_win).cast("bigint")
        )
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", "adc_dist_q")
    )


# ---------------------------------------------------------------------
# Random-projection dimensionality reduction (Johnson-Lindenstrauss)
# ---------------------------------------------------------------------

_RP_DOUT = 16  # 64 -> 16 dims

# sign_{j,i} = +1/-1 from the portable hash of "rp_j_i" (decorrelated
# from the LSH planes by the prefix)
_RP_SIGNS_SQL = f"""
      SELECT p.j, d.i,
             CASE WHEN {hash64_sql("concat('rp_', p.j, '_', d.i)")} % 2 = 1
                  THEN 1 ELSE -1 END AS sgn
      FROM (SELECT unnest(range(0, {_RP_DOUT})) AS j) p,
           (SELECT unnest(range(0, 64)) AS i) d
"""

_RP_ORACLE = f"""
WITH e AS ({_EM_SQL}),
signs AS ({_RP_SIGNS_SQL}),
norms AS (SELECT vec_id, SUM(xq * xq) AS nrm FROM e GROUP BY vec_id),
proj AS (
  SELECT e.vec_id, s.j, SUM(e.xq * s.sgn) AS yq
  FROM e JOIN signs s ON s.i = e.i
  GROUP BY 1, 2),
pn AS (SELECT vec_id, SUM(yq * yq) AS pnrm FROM proj GROUP BY vec_id)
SELECT n.vec_id,
       CAST(n.nrm AS BIGINT) AS orig_sq_norm,
       CAST(p.pnrm AS BIGINT) AS proj_sq_norm,
       CAST(p.pnrm AS DOUBLE) / ({_RP_DOUT} * nullif(n.nrm, 0)) AS jl_ratio
FROM norms n JOIN pn p ON p.vec_id = n.vec_id
"""


@register(
    "embedding_random_projection",
    oracle=_RP_ORACLE,
    tags=("embedding", "dimensionality-reduction"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    deterministic +-1 sign matrix (Achlioptas, "Database-friendly
    random projections", 2001: +-1 entries preserve distances like
    Gaussian ones), reporting per-vector squared norms and the
    norm-preservation ratio E[ratio] = 1 — the audit every
    project-then-ANN pipeline runs before trusting reduced vectors.

    Scale design: the whole query is MAP-ONLY — the 16x64 sign matrix
    is built once as a one-row broadcast literal (same md5 derivation
    as the LSH planes, 'rp_' prefix), each vector computes its 16
    projections and both norms inside one higher-order-function
    projection, zero shuffles end to end (pinned in test_plans.py).
    At 100 TB this is a pure scan; the 4x-shorter vectors then cut
    every downstream ANN dot product by 4x. All arithmetic exact
    int64 (components quantized at 1e6)."""
    from ..operators.similarity import quantized_vectors, _dot

    signs_sql = f"""
      transform(sequence(0, {_RP_DOUT - 1}), j ->
        transform(sequence(0, 63), i ->
          CASE WHEN CAST(conv(substring(md5(concat('rp_', j, '_', i)), 1, 15),
                             16, 10) AS BIGINT) % 2 = 1
               THEN 1L ELSE -1L END))
    """
    emb = t(spark, sf_dir, "embeddings")
    v = quantized_vectors(emb, "vec_id", "embedding")
    signs_df = spark.range(1).select(F.expr(signs_sql).alias("_signs"))
    vv = v.crossJoin(F.broadcast(signs_df))
    yqs = F.transform(F.col("_signs"), lambda row: _dot(F.col("vq"), row))
    pnrm = F.aggregate(
        yqs, F.lit(0).cast("long"), lambda acc, y: acc + y * y
    )
    return vv.select(
        "vec_id",
        F.col("nrm").cast("bigint").alias("orig_sq_norm"),
        pnrm.cast("bigint").alias("proj_sq_norm"),
        (
            pnrm.cast("double")
            / (F.lit(_RP_DOUT) * F.nullif(F.col("nrm"), F.lit(0)))
        ).alias("jl_ratio"),
    )


# ---------------------------------------------------------------------
# Top singular direction (two exact power-iteration steps)
# ---------------------------------------------------------------------

_TSD_SCALE = 64  # floor(x*64): 6-bit components keep two exact
# matrix-vector products inside int64 up to ~50k vectors (sf1); for
# larger corpora carry the sums in DECIMAL(38,0) — same identity.


@register(
    "embedding_top_singular_direction",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * {_TSD_SCALE})
                           AS BIGINT)) AS q
      FROM embeddings),
    c AS (
      SELECT i.i AS i, j.j AS j,
             CAST(SUM(q.q[i.i + 1] * q.q[j.j + 1]) AS BIGINT) AS c
      FROM q, range(0, 64) i(i), range(0, 64) j(j)
      GROUP BY 1, 2),
    v1 AS (SELECT i, CAST(SUM(c) AS BIGINT) AS pass1 FROM c GROUP BY i),
    v2 AS (
      SELECT c.i AS i, CAST(SUM(c.c * v1.pass1) AS BIGINT) AS pass2
      FROM c JOIN v1 ON v1.i = c.j GROUP BY c.i)
    SELECT CAST(v1.i AS BIGINT) AS dim, v1.pass1, v2.pass2
    FROM v1 JOIN v2 ON v1.i = v2.i
    """,
    tags=("embedding", "pca", "iterative"),
)
def embedding_top_singular_direction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top singular direction of the embedding matrix by TWO exact
    power-iteration steps — the direction 'all-but-the-top'
    post-processing (Mu & Viswanath 2018) removes, and the building
    block of embedding whitening. v_2 = (X^T X)^2 · 1, computed
    entirely in int64 on 6-bit-quantized components so both engines
    agree bit-for-bit (double-cast before the scale multiply: a
    float-precision product could floor differently across engines).

    Scale shape: the Gram matrix arrives from ONE explode of a
    per-row 64x64 product array (map-side, partial-agg combinable
    into exactly 4096 groups — the corpus is never shuffled, only
    4096-row partials); both iteration steps are joins/aggregates
    over the fixed 4096-row matrix with the 64-row vector broadcast.
    Adding iterations is adding 64-row joins — the plan grows by a
    constant per step, never by data."""
    e = fanout(t(spark, sf_dir, "embeddings"))
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * _TSD_SCALE).cast("bigint"),
    )
    prods = F.flatten(
        F.transform(q, lambda qi: F.transform(q, lambda qj: qi * qj))
    )
    c = (
        e.select(F.posexplode(prods).alias("pos", "p"))
        .groupBy("pos")
        .agg(F.sum("p").cast("bigint").alias("c"))
        .select(
            (F.col("pos") / 64).cast("bigint").alias("i"),
            (F.col("pos") % 64).cast("bigint").alias("j"),
            "c",
        )
    )
    v1 = c.groupBy("i").agg(F.sum("c").cast("bigint").alias("pass1"))
    v2 = (
        c.join(
            F.broadcast(
                v1.select(F.col("i").alias("j"), F.col("pass1").alias("w"))
            ),
            "j",
        )
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("w")).cast("bigint").alias("pass2"))
    )
    return (
        v1.join(v2, "i")
        .select(F.col("i").alias("dim"), "pass1", "pass2")
    )
