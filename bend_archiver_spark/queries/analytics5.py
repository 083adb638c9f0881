"""BFS reachability, marketing attribution, language-ID evaluation,
and per-dimension embedding standardization.

- ``graph_bfs_hops``: bounded-depth breadth-first search over the
  part co-occurrence graph — frontier-expansion reachability, the
  primitive behind "within k hops" graph queries. Iterations are the
  node-bounded cached-join shape shared by PageRank and LPA.
- ``events_attribution_last_touch``: last-touch marketing
  attribution — each purchase credited to the user's most recent
  preceding touch event — via an IGNORE-NULLS running last over the
  per-user total order; the classic sessionless attribution model.
- ``text_langid_confusion``: the evaluation matrix for the language
  ID heuristic (``text_langid_heuristic``): label x guess counts and
  per-label recall share — model evaluation as a first-class
  distributed query.
- ``embedding_standardize_dims``: per-dimension z-score
  standardization of the embedding matrix (the preprocessing step in
  front of PCA/whitening/clustering), with exact decimal moment sums
  per dimension so the statistics are partition-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import bfs_hops
from .analytics3 import EDGES_CTE, cooccur_edges
from .base import register, t
from .text import _STOPWORDS, _SW_SQL

_BFS_HOPS = 3


def _bfs_hop_sql(i: int) -> str:
    # every CTE here is referenced more than once downstream (v{i}
    # feeds both the next hop's NOT IN and the next union) —
    # MATERIALIZED stops DuckDB 1.0's inline-per-reference expansion,
    # which otherwise re-evaluates the whole edge pipeline once per
    # reference and goes exponential in the hop count
    return f"""
    f{i} AS MATERIALIZED (
      SELECT DISTINCT a.nbr AS node
      FROM adj a JOIN d{i - 1} ON a.node = d{i - 1}.node),
    d{i} AS MATERIALIZED (
      SELECT node, {i} AS dist FROM f{i}
      WHERE node NOT IN (SELECT node FROM v{i - 1})),
    v{i} AS MATERIALIZED (
      SELECT * FROM v{i - 1} UNION ALL SELECT * FROM d{i})
    """


_BFS_ORACLE = (
    f"WITH {EDGES_CTE},"
    + """
    adj AS MATERIALIZED (
            SELECT u AS node, v AS nbr FROM edges
            UNION ALL SELECT v, u FROM edges),
    src AS (SELECT MIN(node) AS node
            FROM (SELECT node FROM adj)),
    d0 AS (SELECT node, 0 AS dist FROM src),
    v0 AS MATERIALIZED (SELECT * FROM d0)
    """
    + "".join("," + _bfs_hop_sql(i) for i in range(1, _BFS_HOPS + 1))
    + f"""
    SELECT node AS p_partkey, CAST(dist AS BIGINT) AS hop
    FROM v{_BFS_HOPS}
    """
)


@register(
    "graph_bfs_hops",
    oracle=_BFS_ORACLE,
    tags=("graph", "iterative", "reachability"),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first search to depth 3 from a deterministic source
    (the minimum part key in the graph): every reachable node with
    its hop distance. Each expansion is one adjacency equi-join of
    the current frontier plus an anti-join against the visited set —
    both node-bounded and cached, so like the PageRank and LPA loops
    the iteration cost is independent of the corpus after the one
    edge-building pass (``cooccur_edges``). The frontier join is the
    textbook distributed BFS: at 100 TB depth-k reachability is k
    shuffles on the node key, with the visited table as the only
    growing state (bounded by |V|). The source is an aggregate-derived
    1-row broadcast, not a driver-side collect."""
    edges = cooccur_edges(spark, sf_dir)
    return bfs_hops(edges, hops=_BFS_HOPS, src="u", dst="v").select(
        F.col("node").alias("p_partkey"),
        F.col("dist").cast("bigint").alias("hop"),
    )


_TOUCH_TYPES = ("click", "view", "signup")
_TOUCH_IN = ", ".join(f"'{c}'" for c in _TOUCH_TYPES)

_ATTR_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, event_type, value,
         last_value(CASE WHEN event_type IN ({_TOUCH_IN})
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS touch
  FROM events)
SELECT COALESCE(touch, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
FROM tagged WHERE event_type = 'purchase'
GROUP BY 1
"""


@register(
    "events_attribution_last_touch",
    oracle=_ATTR_ORACLE,
    tags=("sessions", "window", "attribution"),
)
def events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the
    user's most recent preceding touch event (click/view/signup;
    'direct' when none precedes), with purchase count and
    decimal-exact revenue per channel. The running last-non-null over
    the per-user (ts, event_id) total order is the standard
    sessionless attribution formulation — ONE hash exchange on
    user_id feeds the window, and the rollup after the purchase
    filter is channel-bounded. The total order makes the credited
    channel unique on both engines; Spark's last(ignorenulls) and the
    oracle's last_value IGNORE NULLS walk the same frame."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch_expr = F.when(
        F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type")
    )
    tagged = ev.select(
        "event_type",
        "value",
        F.last(touch_expr, ignorenulls=True).over(w).alias("touch"),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )


_CONF_ORACLE = f"""
WITH feat AS (
  SELECT lang AS lang_label,
         CASE WHEN CAST(len(list_filter(
                     string_split_regex(trim(lower(text)), '\\s+'),
                     w -> list_contains(['{_SW_SQL}'], w))) AS DOUBLE)
                   / len(string_split_regex(trim(lower(text)), '\\s+'))
                   >= 0.02
              THEN 'en' ELSE 'und' END AS lang_guess
  FROM documents),
cells AS (
  SELECT lang_label, lang_guess, COUNT(*) AS n
  FROM feat GROUP BY 1, 2),
tot AS (
  SELECT lang_label, SUM(n) AS label_n FROM cells GROUP BY 1)
SELECT cells.lang_label, lang_guess,
       CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / label_n AS label_share
FROM cells JOIN tot USING (lang_label)
"""


@register(
    "text_langid_confusion",
    oracle=_CONF_ORACLE,
    tags=("text", "langid", "evaluation"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the language-ID heuristic: (label, guess)
    cell counts plus each cell's share of its label row — per-label
    recall on the diagonal. Model evaluation expressed as the same
    distributed shapes as everything else: the guess is the
    ``text_langid_heuristic`` decision re-applied (one map-only
    pass), the cells are a combinable groupBy bounded by
    |labels| x |guesses|, and the share join runs entirely on that
    bounded cell table. Exact int64 counts; one correctly-rounded
    division per cell."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower("text")), r"\s+")
    markers = F.filter(words, lambda w: w.isin(*_STOPWORDS))
    ratio = F.size(markers).cast("double") / F.size(words)
    feat = d.select(
        F.col("lang").alias("lang_label"),
        F.when(ratio >= 0.02, F.lit("en"))
        .otherwise(F.lit("und"))
        .alias("lang_guess"),
    )
    cells = feat.groupBy("lang_label", "lang_guess").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.groupBy("lang_label").agg(F.sum("n").alias("label_n"))
    return cells.join(F.broadcast(tot), "lang_label").select(
        "lang_label",
        "lang_guess",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.col("label_n")).alias("label_share"),
    )


_STD_ORACLE = """
WITH elems AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS dim,
         unnest(embedding) AS v
  FROM embeddings),
stats AS (
  SELECT dim,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                       AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxx
  FROM elems GROUP BY dim),
z AS (
  SELECT vec_id, label, elems.dim,
         -- + 0 normalizes IEEE signed zero: round() of a tiny
         -- negative is -0.0 in DuckDB but +0.0 in Spark (BigDecimal
         -- rounding has no signed zero) — first seen at 100x, where
         -- a rotated replica's element lands exactly on the dim mean
         round((CAST(v AS DOUBLE) - sx / n)
                 / sqrt((sxx - sx * sx / n) / (n - 1)), 6) + 0 AS zv
  FROM elems JOIN stats ON elems.dim = stats.dim)
SELECT vec_id, label, CAST(dim - 1 AS BIGINT) AS dim, zv
FROM z
"""


@register(
    "embedding_standardize_dims",
    oracle=_STD_ORACLE,
    tags=("embedding", "preprocessing"),
)
def embedding_standardize_dims(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension z-score standardization of the embedding matrix
    — the preprocessing in front of PCA, whitening, and distance-
    based clustering (unstandardized dims let one scale dominate).
    The dimension statistics are exact decimal moment sums over the
    element explode (combinable, |dims| groups) — the float32
    elements are widened to DOUBLE BEFORE the decimal cast, because
    Spark rounds float->decimal via the float's shortest decimal
    representation while DuckDB rounds the exact binary value (1-ulp
    moment divergence, observed at sf0.01 dim 28); double->decimal
    rounds identically on both engines — broadcast back onto
    the element stream; each element is then one identical
    (v - mean)/std double chain with a 6-dp round absorbing ulp
    drift (``agg_corr_manual`` policy). The output is the EXPLODED
    scalar frame (vec_id, label, dim, zv) — one row per element, the
    driver-hashable canonical shape (array columns break the
    harness's pandas sort canonicalizer: r05's only red row).
    Downstream consumers that want vectors regroup with
    transform(sort_array(collect_list(struct(dim, zv)))), s.zv) —
    deterministic because the struct sort is a total order — via the
    unregistered ``standardized_vectors`` helper below. Scale: two
    corpus-element passes (stats + apply); nothing vector x vector.
    Oracle dim is generate_subscripts-1 (1-based) aligned to
    posexplode's 0-based pos."""
    e = t(spark, sf_dir, "embeddings")
    elems = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "v"),
    )
    vd = F.col("v").cast("double")
    stats = elems.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vd.cast("decimal(38,6)")).cast("double").alias("sx"),
        F.sum((vd * vd).cast("decimal(38,6)")).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    # + 0.0 normalizes IEEE signed zero (oracle twin carries the same
    # term): Spark's round() of a tiny negative returns +0.0 while
    # DuckDB's keeps -0.0 — divergent only when an element lands
    # EXACTLY on its dimension mean, which first happens at 100x
    zv = F.round(
        (vd - sx / n) / F.sqrt((sxx - sx * sx / n) / (n - 1)), 6
    ) + F.lit(0.0)
    return elems.join(F.broadcast(stats), "dim").select(
        "vec_id",
        "label",
        F.col("dim").cast("bigint").alias("dim"),
        zv.alias("zv"),
    )


def standardized_vectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Array-shaped companion of ``embedding_standardize_dims`` for
    downstream vector consumers (PCA, clustering): regroups the
    exploded z-scores back into (vec_id, label, zvec) with the
    deterministic struct-sort regroup. Unregistered — array outputs
    are not driver-hashable (see the registry lint in
    tests/test_registry.py)."""
    z = embedding_standardize_dims(spark, sf_dir)
    return (
        z.groupBy("vec_id", "label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "zv"))),
                lambda s: s["zv"],
            ).alias("zvec")
        )
        .select("vec_id", "label", "zvec")
    )
