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

__all__ = ["connected_components", "triangle_counts", "label_propagation", "bfs_hops"]


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    node_col: str = "doc_id",
    max_iter: int = 25,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Connected components by min-label propagation.

    ``edges``: undirected pair rows (``src``, ``dst``).
    ``nodes``: one row per vertex (``node_col``) — vertices with no
    edges become singleton components.

    Returns (``node_col``, ``component_id``) where ``component_id`` is
    the minimum vertex id reachable from the node — the unique
    fixpoint, independent of partitioning and iteration order.

    Fault tolerance: iteration state is truncated with
    ``localCheckpoint`` by default — blocks live on executors, so an
    executor LOSS mid-run kills the lineage and fails the job (fine
    single-box and for short runs; a restart recomputes). For long
    cluster runs pass ``reliable_checkpoint=True`` to write each
    round's state to ``sparkContext.setCheckpointDir``'s fault-tolerant
    store (HDFS/object store) instead — iterations then survive
    executor loss at the cost of one distributed write per round.
    Requires the caller to have set a checkpoint dir."""
    und = edges.select(
        F.col(src).cast("bigint").alias("a"), F.col(dst).cast("bigint").alias("b")
    )
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))

    def _barrier(df: DataFrame) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint()
        return df.localCheckpoint()

    # materialize the edge list once: its lineage is the (expensive)
    # pair-finding pipeline, and every propagation round re-reads it
    und = _barrier(und)
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
        )
        # pointer jumping: also adopt the label OF the current label
        # (a node in the same component, so membership is preserved).
        # Edge propagation alone moves the min ONE hop per round —
        # the 100x sweep caught a 340k-edge near-dup graph whose
        # longest chains exceed 25 hops, so max_iter silently returned
        # unmerged components (29120 vs the true 29097). With the
        # compression hop the reachable frontier DOUBLES per round:
        # 25 rounds cover diameter ~2^25 at one extra label-table
        # self-join per round (node-sized, smaller than the edge join).
        ptr = labels.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        labels = (
            labels.join(ptr, labels["label"] == ptr["pnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
        )
        labels = _barrier(labels)
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


def triangle_counts(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Exact per-node triangle count + local clustering coefficient by
    degree-ordered wedge closure (node-iterator++ / Chiba-Nishizeki).

    ``edges`` is an undirected edge list, one row per edge in either
    orientation (no duplicates). Every edge is re-oriented from its
    lower to its higher endpoint under the (degree, id) total order,
    which caps each out-degree at O(sqrt(m)) on ANY degree
    distribution — the wedge table stays m^1.5-bounded even on a
    hub-and-spoke graph, where id-ordering would put C(hub_deg, 2)
    wedges through the hub. Each triangle is enumerated exactly once
    from its (degree, id)-minimal corner. Input should be persisted by
    the caller if its lineage is expensive — this operator references
    it from four join arms. Returns (node, degree, n_triangles,
    clustering_coeff)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    # no forced broadcast: the degree table is |V| rows, which at
    # 100 TB graph scale can exceed executor memory — let AQE pick
    # broadcast vs shuffle from the measured size at runtime
    ed = e.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    e_or = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dd"),
    ).persist()
    e1 = e_or.select("src", F.col("dst").alias("a"), F.col("dd").alias("da"))
    e2 = e_or.select("src", F.col("dst").alias("b"), F.col("dd").alias("db"))
    wedges = e1.join(e2, "src").filter(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    )
    closure = e_or.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    tri = wedges.join(closure, ["a", "b"])
    tn = (
        tri.select(F.explode(F.array("src", "a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    coeff = F.when(
        F.col("degree") >= 2,
        (2 * F.coalesce(F.col("n_tri"), F.lit(0))).cast("double")
        / (F.col("degree").cast("double") * (F.col("degree") - 1)),
    ).otherwise(F.lit(0.0))
    return deg.join(tn, "node", "left").select(
        "node",
        F.col("degree").cast("bigint").alias("degree"),
        F.coalesce(F.col("n_tri"), F.lit(0))
        .cast("bigint")
        .alias("n_triangles"),
        coeff.alias("clustering_coeff"),
    )


def label_propagation(
    edges: DataFrame, rounds: int = 3, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), made deterministic by the (count DESC, label ASC)
    tie-break total order — reproducible under any partitioning,
    unlike the paper's random tie-break. Each round is node-bounded:
    one adjacency equi-join against the |V|-row label table, a
    map-combinable (node, label) count, and a degree-bounded window;
    per-round persists keep the plan linear in rounds. Returns
    (node, label)."""
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    adj = (
        e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .persist()
    )
    labels = adj.select("node").distinct().withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(rounds):
        cnt = (
            adj.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .persist()
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    hops: int = 3,
    src: str = "u",
    dst: str = "v",
    source: DataFrame | None = None,
) -> DataFrame:
    """Bounded-depth breadth-first search: every node reachable from
    ``source`` (a 1-column, typically 1-row DataFrame of seed nodes;
    default = the graph's minimum node id, derived as an aggregate —
    never a driver-side collect) with its hop distance. Each expansion
    is a frontier equi-join plus an anti-join against the visited
    set; the frontier join is left to AQE rather than force-broadcast
    — one hop from a hub makes the frontier O(|V|), and a forced
    broadcast of that would OOM the driver at graph scale (AQE still
    broadcasts the early, genuinely-small frontiers from their
    measured runtime size). k-hop reachability costs k node-keyed
    shuffles with the |V|-bounded visited table as the only growing
    state. Returns (node, dist)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    adj = (
        e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .persist()
    )
    if source is None:
        source = adj.agg(F.min("node").alias("node"))
    visited = source.select("node", F.lit(0).alias("dist")).persist()
    frontier = visited
    for i in range(1, hops + 1):
        reached = (
            adj.join(frontier.select("node"), "node")
            .select(F.col("nbr").alias("node"))
            .distinct()
        )
        new = reached.join(visited, "node", "left_anti").select(
            "node", F.lit(i).alias("dist")
        )
        visited = visited.unionAll(new).persist()
        frontier = new
    return visited
