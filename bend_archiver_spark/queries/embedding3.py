"""Round-6 embedding-space evaluation operators.

- ``embedding_centroid_distances``: pairwise Euclidean distances
  between per-label centroids, in EXACT cross-multiplied integer/
  decimal arithmetic (no per-dim mean division before the compare).
- ``embedding_knn_label_accuracy``: 1-NN label prediction accuracy of
  the embedding space per true label — "are these embeddings good
  features" as one query.
- ``embedding_silhouette_centroid``: simplified (centroid-based)
  silhouette score per label — cohesion vs separation of the label
  clusters.
- ``embedding_distance_histogram``: the distribution of query-corpus
  cosines in exact 0.05 bins — the calibration curve for picking ANN
  thresholds.

Numeric policy (same as ``queries/similarity.py``): components are
quantized to int64 once, every dot/norm/centroid moment is exact
integer or decimal arithmetic, and each reported distance/ratio is
one identical double chain on both engines with an explicit round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import similarity as ops
from .base import register, t
from .similarity import _COSINE_SQL, _E_SQL, _NORMS_SQL

_ACC_QUERIES = 100  # vec_id < 100 are the 1-NN evaluation queries
_HIST_QUERIES = 50
_HIST_BINS = 20  # bin width 1/20 = 0.05


# --- exact centroid distances -------------------------------------------

_CENTROID_SQL = f"""
    SELECT label, i,
           CAST(SUM(xq) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM e JOIN embeddings USING (vec_id)
    GROUP BY 1, 2
"""

_CDIST_ORACLE = f"""
WITH e AS ({_E_SQL}),
c AS ({_CENTROID_SQL}),
p AS (
  SELECT a.label AS label_a, b.label AS label_b,
         a.n AS na, b.n AS nb,
         SUM(CAST(CAST(a.s * b.n - b.s * a.n AS DECIMAL(38,0))
                  * CAST(a.s * b.n - b.s * a.n AS DECIMAL(38,0))
                  AS DECIMAL(38,0))) AS d2s
  FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
  GROUP BY 1, 2, 3, 4)
SELECT CAST(label_a AS BIGINT) AS label_a,
       CAST(label_b AS BIGINT) AS label_b,
       round(sqrt(CAST(d2s AS DOUBLE)) / (na * nb) / 1000000.0, 9)
         AS centroid_dist
FROM p
"""


@register(
    "embedding_centroid_distances",
    oracle=_CDIST_ORACLE,
    tags=("embedding", "evaluation", "exact"),
)
def embedding_centroid_distances(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Euclidean distance between label centroids — the
    cluster-separation report. Centroid means are never divided:
    the per-dim difference sa/na - sb/nb is cross-multiplied to the
    EXACT integer sa*nb - sb*na, squared and summed in DECIMAL(38,0)
    (the squares reach ~1e24, past int64), so the only float ops are
    the final sqrt and two divisions — identical chains on both
    engines with a 9-dp round. Corpus cost: one (label, dim) grouped
    sum over the exploded components; everything after runs on
    |labels| x dims and |labels|^2 rows."""
    # label rides THROUGH the explode (extra_cols) — joining the
    # corpus-sized component stream back to the source table for a
    # column one scan already had would add a corpus shuffle
    e = ops.explode_quantized(
        t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        extra_cols=("label",),
    )
    c = (
        e.groupBy("label", "i")
        .agg(
            F.sum("xq").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    a = c.select(
        F.col("label").alias("label_a"),
        "i",
        F.col("s").alias("sa"),
        F.col("n").alias("na"),
    )
    b = c.select(
        F.col("label").alias("label_b"),
        "i",
        F.col("s").alias("sb"),
        F.col("n").alias("nb"),
    )
    diff = (F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")).cast(
        "decimal(38,0)"
    )
    p = (
        a.join(b, (a.i == b.i) & (F.col("label_a") < F.col("label_b")))
        .groupBy("label_a", "label_b", "na", "nb")
        .agg(F.sum((diff * diff).cast("decimal(38,0)")).alias("d2s"))
    )
    return p.select(
        F.col("label_a").cast("bigint").alias("label_a"),
        F.col("label_b").cast("bigint").alias("label_b"),
        F.round(
            F.sqrt(F.col("d2s").cast("double"))
            / (F.col("na") * F.col("nb"))
            / 1000000.0,
            9,
        ).alias("centroid_dist"),
    )


# --- 1-NN label accuracy ---------------------------------------------------

_KNN_ORACLE = f"""
WITH e AS ({_E_SQL}),
norms AS ({_NORMS_SQL}),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(q.xq * c.xq) AS dot
  FROM e q JOIN e c ON q.i = c.i
  WHERE q.vec_id < {_ACC_QUERIES} AND c.vec_id <> q.vec_id
  GROUP BY 1, 2),
nn AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY {_COSINE_SQL} DESC, neighbor_id) AS rank
    FROM dots
    JOIN norms nq ON nq.vec_id = query_id
    JOIN norms nc ON nc.vec_id = neighbor_id) WHERE rank = 1),
lab AS (SELECT vec_id, label FROM embeddings)
SELECT CAST(lt.label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN lp.label = lt.label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       round(CAST(SUM(CASE WHEN lp.label = lt.label THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM nn
JOIN lab lt ON lt.vec_id = nn.query_id
JOIN lab lp ON lp.vec_id = nn.neighbor_id
GROUP BY lt.label
"""


@register(
    "embedding_knn_label_accuracy",
    oracle=_KNN_ORACLE,
    tags=("embedding", "evaluation", "knn"),
)
def embedding_knn_label_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-nearest-neighbor label prediction accuracy per true label
    over a 100-query evaluation set — the standard "embedding
    quality" probe (a space where 1-NN cannot recover labels won't
    power retrieval either). The neighbor search is the exact
    ``cosine_topk`` at k=1 (deterministic (cosine DESC, id)
    tie-break); accuracy is exact integer counts with one final
    division. Scale: the query side broadcasts; at 100 TB the eval
    set stays fixed while the corpus scan parallelizes — or swap in
    the IVF/LSH candidate route, same downstream rollup."""
    emb = t(spark, sf_dir, "embeddings")
    nn = ops.cosine_topk(
        emb, "vec_id", "embedding", F.col("vec_id") < _ACC_QUERIES, k=1
    ).select("query_id", "neighbor_id")
    lab = emb.select("vec_id", "label")
    lt = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("label_t")
    )
    lp = lab.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("label_p"),
    )
    correct = F.when(F.col("label_p") == F.col("label_t"), 1).otherwise(0)
    return (
        # lt/lp are per-vector label tables (corpus-proportional) —
        # unhinted so AQE broadcasts the SMALL side (nn is bounded by
        # the query budget) instead of a forced big-side broadcast
        nn.join(lt, "query_id")
        .join(lp, "neighbor_id")
        .groupBy(F.col("label_t").cast("bigint").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.sum(correct).cast("bigint").alias("n_correct"),
        )
        .select(
            "label",
            "n_queries",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_queries"), 6
            ).alias("accuracy"),
        )
    )


# --- simplified silhouette ---------------------------------------------------

_SIL_ORACLE = f"""
WITH e AS ({_E_SQL}),
c AS ({_CENTROID_SQL}),
vd AS (
  SELECT e.vec_id, c.label,
         SUM(CAST(CAST(c.n * e.xq - c.s AS DECIMAL(38,0))
                  * CAST(c.n * e.xq - c.s AS DECIMAL(38,0))
                  AS DECIMAL(38,0))) AS d2s,
         MAX(c.n) AS n
  FROM e JOIN c ON c.i = e.i
  GROUP BY 1, 2),
dist AS (
  SELECT vec_id, label,
         sqrt(CAST(d2s AS DOUBLE)) / n / 1000000.0 AS d
  FROM vd),
ab AS (
  SELECT dist.vec_id, lab.label,
         MAX(CASE WHEN dist.label = lab.label THEN d END) AS a,
         MIN(CASE WHEN dist.label <> lab.label THEN d END) AS b
  FROM dist
  JOIN (SELECT vec_id, label FROM embeddings) lab USING (vec_id)
  GROUP BY 1, 2),
s AS (
  SELECT vec_id, label,
         round((b - a) / nullif(greatest(a, b), 0), 9) AS sil
  FROM ab)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(CAST(SUM(CAST(sil AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
         AS mean_silhouette
FROM s GROUP BY label
"""


@register(
    "embedding_silhouette_centroid",
    oracle=_SIL_ORACLE,
    tags=("embedding", "evaluation", "clustering"),
)
def embedding_silhouette_centroid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simplified silhouette per label: for every vector, a = distance
    to its OWN label centroid, b = distance to the nearest OTHER
    centroid, s = (b - a) / max(a, b); report the per-label mean — the
    cohesion-vs-separation score (near 1 = tight well-separated
    clusters, near 0/negative = overlapping labels). Each
    vector-to-centroid distance is the exact cross-multiplied decimal
    sum sum_d (n*x_d - s_d)^2 with ONE sqrt+division chain (identical
    both engines); per-vector s is rounded to 9 dp BEFORE the decimal
    mean so the rollup is order-independent. Corpus cost: one
    (label, dim) centroid pass and one vector x |labels| distance
    pass against the broadcast centroid table."""
    emb = t(spark, sf_dir, "embeddings")
    # the TRUE label rides through the explode (extra_cols), so
    # neither the centroid pass nor the silhouette rollup ever joins
    # the corpus-sized component/distance stream back to the source
    # table — the old plan force-broadcast the per-vector label table,
    # which is corpus-proportional and would die at 100x
    el = ops.explode_quantized(
        emb, "vec_id", "embedding", extra_cols=("label",)
    )
    c = (
        el.groupBy("label", "i")
        .agg(
            F.sum("xq").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select(F.col("label").alias("clabel"), "i", "s", "n")
    )
    term = (F.col("n") * F.col("xq") - F.col("s")).cast("decimal(38,0)")
    vd = (
        el.join(F.broadcast(c), "i")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum((term * term).cast("decimal(38,0)")).alias("d2s"),
            F.max("n").alias("n"),
        )
    )
    dist = vd.select(
        "vec_id",
        "label",
        "clabel",
        (
            F.sqrt(F.col("d2s").cast("double")) / F.col("n") / 1000000.0
        ).alias("d"),
    )
    ab = (
        dist.groupBy("vec_id", "label")
        .agg(
            F.max(
                F.when(F.col("clabel") == F.col("label"), F.col("d"))
            ).alias("a"),
            F.min(
                F.when(F.col("clabel") != F.col("label"), F.col("d"))
            ).alias("b"),
        )
    )
    sil = F.round(
        (F.col("b") - F.col("a"))
        / F.nullif(F.greatest("a", "b"), F.lit(0)),
        9,
    )
    return (
        ab.select("label", sil.alias("sil"))
        .groupBy(F.col("label").cast("bigint").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            (
                F.sum(F.col("sil").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_silhouette"),
        )
    )


# --- cosine distance histogram ------------------------------------------------

_HIST_ORACLE = f"""
WITH e AS ({_E_SQL}),
norms AS ({_NORMS_SQL}),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(q.xq * c.xq) AS dot
  FROM e q JOIN e c ON q.i = c.i
  WHERE q.vec_id < {_HIST_QUERIES} AND c.vec_id <> q.vec_id
  GROUP BY 1, 2),
cos AS (
  SELECT floor({_COSINE_SQL} * {_HIST_BINS}) AS bin
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = neighbor_id)
SELECT CAST(bin AS BIGINT) AS bin,
       round(bin / {_HIST_BINS}.0, 6) AS cos_lo,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM cos GROUP BY bin
"""


@register(
    "embedding_distance_histogram",
    oracle=_HIST_ORACLE,
    tags=("embedding", "profiling"),
)
def embedding_distance_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distribution of query-to-corpus cosines in 0.05-wide bins over
    a 50-query probe set — the calibration curve that tells you where
    similarity thresholds and LSH operating points sit for THIS
    corpus before building an index. The cosine is the exact-int
    dot/norm chain (identical doubles both engines), so the floor
    binning cannot disagree; counts are exact. Scale: |Q| x N with
    the query side broadcast — the same sampled-probe note as
    ``ann_recall_curve``."""
    emb = t(spark, sf_dir, "embeddings")
    v = ops.quantized_vectors(emb, "vec_id", "embedding")
    q = v.filter(F.col("vec_id") < _HIST_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vq").alias("qv"),
        F.col("nrm").alias("nrm_q"),
    )
    c = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vq").alias("cv"),
        F.col("nrm").alias("nrm_c"),
    )
    cos = ops._cosine_from(
        ops._dot(F.col("qv"), F.col("cv")),
        F.col("nrm_q"),
        F.col("nrm_c"),
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(F.floor(cos * _HIST_BINS).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            "bin",
            F.round(F.col("bin") / float(_HIST_BINS), 6).alias("cos_lo"),
            "n_pairs",
        )
    )
