"""Link prediction + ABC (Pareto) classification — the last two
round-5 registry slots (driver emission cap: 50 unchecked rows).

- ``graph_common_neighbors``: common-neighbor link prediction over
  the part co-occurrence graph — for non-adjacent pairs, how many
  shared neighbors suggest a missing edge. Completes the graph
  family: structure (triangles) -> communities (LPA) -> reachability
  (BFS) -> prediction.
- ``orders_abc_classification``: the classic ABC / Pareto revenue
  analysis (A = parts covering the first 80% of revenue, B to 95%,
  C the tail), with the class boundaries decided in EXACT decimal
  arithmetic (cum*5 <= total*4, cum*20 <= total*19) so no float
  threshold comparison can flip a boundary row between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.prefix import prefix_sum
from .analytics3 import EDGES_CTE, cooccur_edges
from .base import register, t

_CN_MIN = 1  # >= 1 common neighbor (the synthetic graphs are
# sparse: >= 2 leaves zero candidates at the driver's sf0.01)

_CN_ORACLE = f"""
WITH {EDGES_CTE},
adj AS (SELECT u AS node, v AS nbr FROM edges
        UNION ALL SELECT v, u FROM edges),
wedge AS (
  SELECT x.nbr AS a, y.nbr AS b, COUNT(*) AS n_common
  FROM adj x JOIN adj y ON x.node = y.node AND x.nbr < y.nbr
  GROUP BY 1, 2),
cand AS (
  SELECT a, b, n_common FROM wedge
  WHERE n_common >= {_CN_MIN}
    AND NOT EXISTS (SELECT 1 FROM edges
                    WHERE edges.u = a AND edges.v = b))
SELECT a AS part_a, b AS part_b,
       CAST(n_common AS BIGINT) AS n_common
FROM cand
"""


@register(
    "graph_common_neighbors",
    oracle=_CN_ORACLE,
    tags=("graph", "link-prediction"),
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction: NON-adjacent part pairs
    ranked by how many neighbors they share in the co-occurrence
    graph (>= 1 here) — the baseline score every link predictor is
    measured against (Liben-Nowell & Kleinberg 2003). Candidate
    pairs come from the wedge self-join on the shared middle node
    (cost = sum(deg^2), the same wedge stream the triangle counter
    bounds; at 100 TB cap hub degrees first or reuse the
    (degree, id)-oriented form), one combinable pair count, and an
    ANTI-join against the existing edge list so only absent edges
    survive — never an all-pairs product over the catalog."""
    edges = cooccur_edges(spark, sf_dir)
    adj = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    x = adj.select("node", F.col("nbr").alias("a"))
    y = adj.select("node", F.col("nbr").alias("b"))
    wedge = (
        x.join(y, "node")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= _CN_MIN)
    )
    existing = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    return wedge.join(existing, ["a", "b"], "left_anti").select(
        F.col("a").alias("part_a"),
        F.col("b").alias("part_b"),
        F.col("n_common").cast("bigint").alias("n_common"),
    )


_ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS revenue
  FROM lineitem GROUP BY l_partkey),
c AS (
  SELECT l_partkey, revenue,
         SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
         SUM(revenue) OVER () AS total
  FROM rev)
SELECT l_partkey,
       CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(cum AS VARCHAR) AS DOUBLE)
         / CAST(CAST(total AS VARCHAR) AS DOUBLE) AS cum_share,
       CASE WHEN cum * 5 <= total * 4 THEN 'A'
            WHEN cum * 20 <= total * 19 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c
"""


@register(
    "orders_abc_classification",
    oracle=_ABC_ORACLE,
    tags=("analytics", "window", "pareto"),
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto revenue analysis: parts ranked by revenue, tagged
    A while their cumulative share stays within 80% of total revenue,
    B to 95%, C after — inventory management's 80/20 rule as a query.
    The per-part revenue reduce is one map-combinable groupBy; the
    cumulative walk runs the TOTAL order (revenue DESC, partkey —
    ties broken by key so the running sum, and therefore every class
    boundary, is unique on both engines) through the DISTRIBUTED
    two-phase prefix sum (``operators/prefix.py``): part cardinality
    grows linearly with the corpus, so a bare global window would be
    a one-task sort of tens of millions of rows at 100 TB. The
    descending order is expressed by negating the exact decimal
    revenue (strictly monotone, lossless), and the grand total is a
    scalar aggregate broadcast back — never an OVER () window. Class
    boundaries compare in EXACT decimal cross-multiplication
    (cum*5 <= total*4; cum*20 <= total*19): no float ratio ever
    decides a class, so a boundary-straddling part cannot flip
    between engines; the reported cum_share double is display-only."""
    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("revenue")
    )
    total = rev.agg(
        F.sum("revenue").cast("decimal(38,6)").alias("total")
    )
    c = (
        prefix_sum(
            rev.withColumn("_negrev", -F.col("revenue")),
            ["_negrev", "l_partkey"],
            "revenue",
            out_col="cum",
            precision="decimal(38,6)",
        )
        .drop("_negrev")
        .crossJoin(F.broadcast(total))
    )
    cls = (
        F.when(F.col("cum") * 5 <= F.col("total") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
    )
    return c.select(
        "l_partkey",
        F.col("revenue").cast("double").alias("revenue"),
        (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
        cls.alias("abc_class"),
    )
