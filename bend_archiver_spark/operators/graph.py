"""Distributed graph operators: connected components for dedup
clustering.

Pairwise near-dup detection (Jaccard / MinHash / SimHash / cosine)
yields *edges*; corpus curation needs *clusters* — keep one document
per component, drop the rest. Turning pairs into components is a
transitive closure, which no single SQL pass expresses; this module
implements it as iterative min-label propagation, the standard
Spark-first formulation (each iteration = one join + one map-side
combinable aggregation; converges in O(graph diameter) rounds, and
near-dup graphs have tiny diameters — clusters are cliques or short
chains).

Scale notes: per round the big shuffle is edges-joined-with-labels on
the destination key; the label table is (node, label) int64 pairs —
orders of magnitude smaller than the corpus. ``localCheckpoint``
truncates the growing lineage each round (on a cluster, use a
checkpoint dir on the job's storage instead). Convergence is detected
with an exact decimal SUM of labels: labels only ever decrease, so
the sum is strictly monotonic until fixpoint — one cheap aggregate
per round instead of a change-count join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    node_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by min-label propagation.

    ``edges``: undirected pair rows (``src``, ``dst``).
    ``nodes``: one row per vertex (``node_col``) — vertices with no
    edges become singleton components.

    Returns (``node_col``, ``component_id``) where ``component_id`` is
    the minimum vertex id reachable from the node — the unique
    fixpoint, independent of partitioning and iteration order.
    """
    und = edges.select(
        F.col(src).cast("bigint").alias("a"), F.col(dst).cast("bigint").alias("b")
    )
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # materialize the edge list once: its lineage is the (expensive)
    # pair-finding pipeline, and every propagation round re-reads it
    und = und.localCheckpoint()
    labels = nodes.select(
        F.col(node_col).cast("bigint").alias("node")
    ).withColumn("label", F.col("node"))

    prev_sum = None
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("neigh_min"))
        )
        labels = (
            labels.join(neigh, labels["node"] == neigh["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("neigh_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        # exact, order-independent convergence probe: labels are
        # monotonically non-increasing, so an unchanged sum == fixpoint
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.select(
        F.col("node").alias(node_col), F.col("label").alias("component_id")
    )
