"""Round-6 graph structure operators over the part co-occurrence
graph (shared ``cooccur_edges`` barrier / ``EDGES_CTE`` oracle).

- ``graph_kcore_peel``: bounded k-core decomposition — iteratively
  remove nodes of degree < k; the standard "dense core" extraction
  (the unbounded fixpoint converges in at most |V| rounds; registered
  here at 3 rounds, which already reaches the fixpoint on graphs
  whose peel cascades are short — the iteration shape, caching, and
  oracle unrolling are identical at any round count).
- ``graph_edge_jaccard``: neighborhood Jaccard similarity of each
  EDGE's endpoints — the classic tie-strength / embeddedness score
  (Easley-Kleinberg): edges inside communities score high, bridges
  score near zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics3 import EDGES_CTE, cooccur_edges
from .base import register, t  # noqa: F401 — t used by siblings' pattern

_KCORE_K = 2
_KCORE_ROUNDS = 3


def _kcore_round_sql(prev: str, rnd: int) -> str:
    return f"""
    d{rnd} AS (
      SELECT a.node, COUNT(*) AS c
      FROM adj a
      JOIN {prev} x ON a.node = x.node
      JOIN {prev} y ON a.nbr = y.node
      GROUP BY a.node),
    n{rnd} AS (SELECT node FROM d{rnd} WHERE c >= {_KCORE_K}),
    rm{rnd} AS (
      SELECT node, {rnd} AS peel_round FROM {prev}
      WHERE node NOT IN (SELECT node FROM n{rnd}))
    """


_KCORE_ORACLE = (
    f"WITH {EDGES_CTE},"
    + """
    adj AS (SELECT u AS node, v AS nbr FROM edges
            UNION ALL SELECT v, u FROM edges),
    n0 AS (SELECT DISTINCT node FROM adj)
    """
    + "".join(
        "," + _kcore_round_sql(f"n{i - 1}", i)
        for i in range(1, _KCORE_ROUNDS + 1)
    )
    + f"""
    SELECT node AS p_partkey, CAST(peel_round AS BIGINT) AS peel_round
    FROM ({" UNION ALL ".join(f"SELECT * FROM rm{i}" for i in range(1, _KCORE_ROUNDS + 1))})
    UNION ALL
    SELECT node AS p_partkey, CAST(0 AS BIGINT) AS peel_round
    FROM n{_KCORE_ROUNDS}
    """
)


@register(
    "graph_kcore_peel",
    oracle=_KCORE_ORACLE,
    tags=("graph", "iterative", "core"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onion decomposition by k-core peeling (k = 2, 3 rounds): every
    round drops nodes whose degree WITHIN the surviving subgraph is
    under k; each node is labeled with the round that removed it
    (1-based; 0 = still in the core after all rounds) — the coreness
    layering community/nucleus analyses start from, and — unlike
    reporting the (possibly empty) final core alone — a result with
    one row per NODE at every corpus scale, so the correctness gate
    always has content to hash. Each round is one adjacency
    double-semi-join against the (persisted, |V|-bounded) survivor
    set plus a combinable degree count — iteration never re-touches
    lineitem, the node-bounded loop contract of PageRank/LPA;
    per-round persists keep lineage linear in rounds."""
    edges = cooccur_edges(spark, sf_dir)
    adj = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
        .persist()
    )
    nodes = adj.select("node").distinct().persist()
    removed = []
    for rnd in range(1, _KCORE_ROUNDS + 1):
        deg = (
            adj.join(nodes, "node", "left_semi")
            .join(
                nodes.select(F.col("node").alias("nbr")), "nbr", "left_semi"
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        survivors = (
            deg.filter(F.col("c") >= _KCORE_K).select("node").persist()
        )
        removed.append(
            nodes.join(survivors, "node", "left_anti").select(
                "node", F.lit(rnd).cast("bigint").alias("peel_round")
            )
        )
        nodes = survivors
    out = nodes.select(
        "node", F.lit(0).cast("bigint").alias("peel_round")
    )
    for r in removed:
        out = out.unionAll(r)
    return out.select(F.col("node").alias("p_partkey"), "peel_round")


_EJ_ORACLE = f"""
WITH {EDGES_CTE},
adj AS (SELECT u AS node, v AS nbr FROM edges
        UNION ALL SELECT v, u FROM edges),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM adj GROUP BY node),
cn AS (
  SELECT e.u, e.v, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM edges e
  JOIN adj x ON x.node = e.u
  JOIN adj y ON y.node = e.v AND y.nbr = x.nbr
  GROUP BY e.u, e.v)
SELECT e.u AS part_a, e.v AS part_b,
       COALESCE(cn.n_common, 0) AS n_common,
       round(CAST(COALESCE(cn.n_common, 0) AS DOUBLE)
               / (du.d + dv.d - COALESCE(cn.n_common, 0)), 6) AS jaccard
FROM edges e
JOIN deg du ON du.node = e.u
JOIN deg dv ON dv.node = e.v
LEFT JOIN cn ON cn.u = e.u AND cn.v = e.v
"""


@register(
    "graph_edge_jaccard",
    oracle=_EJ_ORACLE,
    tags=("graph", "similarity", "embeddedness"),
)
def graph_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge embeddedness: neighborhood Jaccard |N(u) n N(v)| /
    |N(u) u N(v)| for every EDGE (u, v) — high values mark
    intra-community ties, near-zero marks bridges (the
    Easley-Kleinberg tie-strength measure; the union keeps u and v
    themselves, the standard open-neighborhood convention |union| =
    du + dv - cn). Common-neighbor counts come from the wedge stream
    RESTRICTED to existing edges (two adjacency equi-joins pinned on
    the edge endpoints — cost sum(deg^2) like the triangle counter,
    never all pairs); degrees are one combinable count; exact int64
    throughout with one final rounded division."""
    edges = cooccur_edges(spark, sf_dir)
    adj = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
        .persist()
    )
    deg = adj.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    x = adj.select(F.col("node").alias("u"), F.col("nbr").alias("w"))
    y = adj.select(F.col("node").alias("v"), F.col("nbr").alias("w"))
    cn = (
        edges.join(x, "u")
        .join(y, ["v", "w"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    nc = F.coalesce(F.col("n_common"), F.lit(0).cast("bigint"))
    return (
        edges.join(du, "u")
        .join(dv, "v")
        .join(cn, ["u", "v"], "left")
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            nc.alias("n_common"),
            F.round(
                nc.cast("double") / (F.col("du") + F.col("dv") - nc), 6
            ).alias("jaccard"),
        )
    )
