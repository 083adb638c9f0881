"""Iterative graph ranking over the event-transition graph.

PageRank with exact integer arithmetic: ranks are scaled to
``_SCALE`` = 10^12 and every step uses integer multiply + truncating
division, so three iterations produce bit-identical int64 ranks in
Spark and DuckDB under ANY partitioning — the same
"exact arithmetic makes distribution safe" contract as the quantized
embeddings and floor-log2 bit math (SCALE.md rule 6).

Graph: nodes = distinct event types, edges = consecutive event-type
transitions per user (the Markov chain ``events_transition_matrix``
materializes), edge weight = transition count. Damping 0.85 as
15/100 + 85/100 integer fractions.

Scale design: the corpus is touched exactly once — the per-user lag
window + one map-combinable groupBy that builds the edge list. From
there everything is node-bounded: the rank table is |types| rows and
broadcasts into each iteration's join, edges are at most |types|^2
rows, and each of the 3 iterations adds constant-size operators to
the plan (never another pass over events). Sink nodes (no out-edges)
simply leak their mass — the standard simplification; the 1-row node
count joins in by broadcast, no driver-side collect.

Int64 headroom: rank <= 10^12 and rank * w must stay < 2^63, so edge
weights up to ~9.2e6 are safe; for corpora with heavier single
transitions, drop _SCALE to 10^9 (headroom 9.2e9) — precision is
still far below observable rank differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t

_SCALE = 1_000_000_000_000  # 10^12
_ITERS = 3

_EDGES_SQL = """
    seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    edges AS (
      SELECT prev_type AS src, event_type AS dst, COUNT(*) AS w
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
    e2 AS (SELECT edges.src, dst, w, out_w FROM edges JOIN outw USING (src)),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    nn AS (SELECT COUNT(DISTINCT event_type) AS n FROM events)
"""


def _iter_sql(prev: str, rnd: int) -> str:
    """One integer PageRank step as two CTEs (contrib + new ranks)."""
    return f"""
    c{rnd} AS (
      SELECT dst, SUM((r.rank * w) // out_w) AS contrib
      FROM {prev} r JOIN e2 ON r.node = e2.src GROUP BY dst),
    r{rnd} AS (
      SELECT node,
             ((15 * {_SCALE}) // (100 * n))
               + ((85 * COALESCE(contrib, 0)) // 100) AS rank
      FROM nodes LEFT JOIN c{rnd} ON node = c{rnd}.dst, nn)
    """


_PR_ORACLE = (
    "WITH "
    + _EDGES_SQL
    + f", r0 AS (SELECT node, ({_SCALE} // n) AS rank FROM nodes, nn)"
    + "".join("," + _iter_sql(f"r{i - 1}", i) for i in range(1, _ITERS + 1))
    + f"""
    SELECT node AS event_type,
           CAST(rank AS BIGINT) AS rank_scaled,
           CAST(rank AS DOUBLE) / 1e12 AS rank_frac
    FROM r{_ITERS}
    """
)


@register(
    "graph_pagerank_event_types",
    oracle=_PR_ORACLE,
    headline=True,  # round-5 showcase: iterative graph rank
    tags=("graph", "iterative"),
)
def graph_pagerank_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 iterations) over the
    event-type transition graph, in exact scaled-integer arithmetic:
    rank'(v) = (15·S)/(100·N) + 85·Σ_u (rank(u)·w_uv div out_u) / 100
    with every division a truncating int64 div — bit-identical to the
    DuckDB oracle because no float ever enters the loop. One corpus
    pass builds the edge list; each iteration is a broadcast join of
    the |types|-row rank table against the |types|^2-row edge table,
    so iteration cost is independent of corpus size (contrast
    ``dedup_connected_components``, whose frontier IS corpus-sized)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    edges = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # Persist the three node-bounded tables: each of the _ITERS rank
    # updates references them, and without barriers every iteration's
    # lineage re-scans the events corpus (measured: 14 scans for 3
    # iterations). With them, events is read once per table and the
    # iterations are constant-size joins over cached rows.
    e2 = edges.join(outw, "src").persist()  # <= |types|^2 rows
    nodes = (
        ev.select(F.col("event_type").alias("node")).distinct().persist()
    )
    nn = ev.agg(F.count_distinct("event_type").alias("n")).persist()

    ranks = nodes.crossJoin(nn).select(
        "node", F.expr(f"{_SCALE} div n").alias("rank")
    )
    for _ in range(_ITERS):
        contrib = (
            ranks.join(e2, ranks["node"] == e2["src"])
            .select("dst", F.expr("(rank * w) div out_w").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(nn)
            .select(
                "node",
                (
                    F.expr(f"(15 * {_SCALE}) div (100 * n)")
                    + F.expr("(85 * coalesce(contrib, 0)) div 100")
                ).alias("rank"),
            )
        )
    return ranks.select(
        F.col("node").alias("event_type"),
        F.col("rank").cast("bigint").alias("rank_scaled"),
        (F.col("rank").cast("double") / F.lit(1e12)).alias("rank_frac"),
    )
