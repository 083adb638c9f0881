"""Graph structure + frontier + sketch-quantile analytics.

Three operator families the round-4 registry did not yet cover:

- ``graph_triangle_count``: exact triangle counting / local clustering
  coefficient over the part co-occurrence graph — the canonical
  "structure beyond degree" graph statistic (community density,
  spam-graph detection). The enumeration is the wedge-closure join
  over an ORIENTED edge list, never an all-pairs product.
- ``pareto_frontier_parts``: the 2-D skyline (Pareto frontier) of the
  part catalog under (minimize price, maximize size) — computed with
  the single-sort running-max formulation, not the textbook
  O(n^2) NOT EXISTS dominance scan.
- ``agg_histogram_quantile``: a MERGEABLE fixed-width histogram
  quantile sketch with its error contract audited in-query: each
  estimated quantile is bracketed against the EXACT order statistic
  (distributed prefix-sum rank) and a boolean proves
  ``est_lo <= exact < est_hi``. Fixed bins make the sketch
  deterministic and partition-invariant by construction — two
  corpora's sketches merge by adding bin counts (contrast t-digest /
  GK summaries, whose merge results depend on arrival order, which
  would break this repo's bit-identical-under-any-partitioning
  contract, SCALE.md rule 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import triangle_counts
from ..operators.prefix import prefix_max, prefix_sum
from .base import register, t

# same support floor as orders_basket_affinity: an edge is a part pair
# co-occurring in >= 3 orders
_TRI_MIN_SUPPORT = 3

# shared CTE: the part co-occurrence graph (oriented u < v) — used by
# triangle counting here and label propagation in analytics4.
# MATERIALIZED: DuckDB 1.0 inlines non-recursive CTEs at every
# reference, so a multi-arm consumer (triangles join edges 3x, BFS
# touches adj per hop) would re-run the lineitem self-join per arm —
# at the 10x sweep scale that turned the BFS oracle into an 80 GB
# temp-spill. Materializing is the oracle-side twin of the Spark
# side's persisted cooccur_edges barrier.
EDGES_CTE = f"""
li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_SUPPORT})
"""


def cooccur_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED oriented (u < v) edge list of the part co-occurrence
    graph: part pairs sharing >= 3 orders. Pair enumeration is the
    order-key self-join (bounded by basket size, never the catalog
    squared); the persist is the barrier that lets graph algorithms
    reference the edge list from several join arms without re-running
    the self-join per arm (callers clearCache between queries — repo
    convention)."""
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    return (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _TRI_MIN_SUPPORT)
        .select("u", "v")
        .persist()
    )


_TRI_ORACLE = f"""
WITH {EDGES_CTE},
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
tn AS (
  SELECT node, COUNT(*) AS n_tri FROM (
    SELECT a AS node FROM tri UNION ALL
    SELECT b FROM tri UNION ALL
    SELECT c FROM tri) GROUP BY node),
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT u AS node FROM edges UNION ALL
    SELECT v FROM edges) GROUP BY node)
SELECT deg.node AS p_partkey,
       CAST(degree AS BIGINT) AS degree,
       CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_triangles,
       CASE WHEN degree >= 2
            THEN CAST(2 * COALESCE(n_tri, 0) AS DOUBLE)
                   / (CAST(degree AS DOUBLE) * (degree - 1))
            ELSE CAST(0 AS DOUBLE) END AS clustering_coeff
FROM deg LEFT JOIN tn ON deg.node = tn.node
"""


@register(
    "graph_triangle_count",
    oracle=_TRI_ORACLE,
    headline=True,  # round-5 showcase: wedge-closure graph structure
    tags=("graph", "join", "structure"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + local clustering coefficient per node of
    the part co-occurrence graph (edges = part pairs sharing >= 3
    orders), by DEGREE-ORDERED wedge closure (node-iterator++ /
    Chiba–Nishizeki): every edge is oriented from its lower to its
    higher endpoint under the (degree, id) total order, a wedge is two
    out-edges of one node with its endpoints again (degree, id)-
    ordered, and a triangle is a wedge closed by an oriented edge.
    Orienting by degree instead of raw id caps every out-degree at
    O(sqrt(m)) — on a hub-and-spoke graph raw-id orientation puts
    C(hub_degree, 2) wedges through the hub while degree-ordering
    produces ZERO (all spoke edges point INTO the hub) — so the
    intermediate wedge table is m^1.5-bounded on ANY degree
    distribution, the property that survives a skewed 100 TB graph.
    Each triangle {x,y,z} is enumerated exactly once from its
    (degree, id)-minimal corner; the triangle SET is identical under
    any acyclic orientation, which is why the oracle can use the plain
    a<b<c form. Pair enumeration reuses the basket self-join (bounded
    by basket size); the degree table joins in by broadcast; the
    coefficient 2t/(d(d-1)) is a single correctly-rounded double
    division over exact int64 counts on both engines."""
    edges = cooccur_edges(spark, sf_dir)
    return triangle_counts(edges, src="u", dst="v").select(
        F.col("node").alias("p_partkey"),
        "degree",
        "n_triangles",
        "clustering_coeff",
    )


_SKYLINE_ORACLE = """
WITH g AS (
  SELECT p_retailprice AS price, MAX(p_size) AS pmax
  FROM part GROUP BY 1),
g2 AS (
  SELECT price, pmax,
         MAX(pmax) OVER (ORDER BY price
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS run_lt
  FROM g)
SELECT p_partkey, p_name,
       p_retailprice AS price,
       CAST(p_size AS BIGINT) AS size
FROM part JOIN g2 ON p_retailprice = g2.price
WHERE (run_lt IS NULL OR run_lt < p_size) AND pmax <= p_size
"""


@register(
    "pareto_frontier_parts",
    oracle=_SKYLINE_ORACLE,
    tags=("analytics", "skyline", "window"),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: parts not dominated under (cheaper-or-equal price,
    larger-or-equal size, at least one strict). Instead of the
    O(n^2) NOT-EXISTS dominance scan, dominance collapses to two
    running maxima over the PRICE-DISTINCT table: p is dominated iff
    max-size-at-strictly-cheaper-price >= p.size (run_lt) OR
    max-size-at-the-same-price > p.size (pmax). The groupBy(price) is
    map-combinable, and since round 7 the exclusive running max over
    the distinct-price table goes through ``prefix_max`` — the
    two-phase range-exchange scan — instead of an unpartitioned
    window, so the plan holds even when distinct-price cardinality
    grows with the corpus. The per-price maxima then broadcast back
    onto the part scan, so the corpus-side cost is one combinable
    aggregate + one broadcast-join pass. Ties on both axes survive
    (two identical frontier points do not dominate each other) —
    same in the oracle."""
    p = t(spark, sf_dir, "part")
    g = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("pmax")
    )
    g2 = prefix_max(g, ["price"], "pmax", out_col="run_lt", exclusive=True)
    keep = (
        F.col("run_lt").isNull() | (F.col("run_lt") < F.col("p_size"))
    ) & (F.col("pmax") <= F.col("p_size"))
    return (
        p.join(
            F.broadcast(g2), p["p_retailprice"] == g2["price"]
        )
        .filter(keep)
        .select(
            "p_partkey",
            "p_name",
            F.col("p_retailprice").alias("price"),
            F.col("p_size").cast("bigint").alias("size"),
        )
    )


_BIN_W = 10_000  # fixed bin width over o_totalprice
_QUANTS = (0.5, 0.9, 0.99)

_HISTQ_ORACLE = f"""
WITH n AS (SELECT COUNT(*) AS n FROM orders),
t AS (
  SELECT q, CAST(ceil(q * n) AS BIGINT) AS r
  FROM (SELECT unnest([{", ".join(str(q) for q in _QUANTS)}]) AS q), n),
hist AS (
  SELECT CAST(floor(o_totalprice / {_BIN_W}) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM orders GROUP BY 1),
cum AS (
  SELECT bin, SUM(c) OVER (ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum
  FROM hist),
est AS (
  SELECT q, r, MIN(bin) AS eb
  FROM t JOIN cum ON cum >= r GROUP BY q, r),
ranked AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk
  FROM orders)
SELECT q, r AS target_rank,
       CAST(eb * {_BIN_W} AS DOUBLE) AS est_lo,
       CAST((eb + 1) * {_BIN_W} AS DOUBLE) AS est_hi,
       o_totalprice AS exact_value,
       (o_totalprice >= eb * {_BIN_W}
        AND o_totalprice < (eb + 1) * {_BIN_W}) AS within_bin
FROM est JOIN ranked ON rk = r
"""


@register(
    "agg_histogram_quantile",
    oracle=_HISTQ_ORACLE,
    headline=True,  # round-5 showcase: mergeable sketch + exact audit
    tags=("agg", "sketch", "order-statistics"),
)
def agg_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-width histogram quantile sketch, audited
    against the exact order statistic in the same result: for each
    target quantile q in (0.5, 0.9, 0.99) the sketch answer is the
    first bin whose cumulative count reaches rank ceil(q*n), reported
    as the [est_lo, est_hi) bracket, and ``within_bin`` proves the
    EXACT q-th value (distributed prefix-sum rank, same machinery as
    ``agg_exact_median_distributed``) falls inside it — the sketch's
    |error| <= bin-width contract as a checkable column, not a claim.
    Fixed bins are what make this 100 TB-safe: the histogram is one
    map-combinable groupBy whose result is partition-invariant and
    MERGEABLE across corpora/days by adding counts (unlike
    t-digest/GK, whose merges are order-sensitive), the cumulative
    walk runs over the ~60-row bin table, and the only corpus-scale
    extra is the exact-rank audit itself."""
    o = t(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey", F.lit(1).alias("one")
    )
    n = o.agg(F.count(F.lit(1)).alias("n"))
    targets = n.select(
        F.explode(F.array(*[F.lit(q) for q in _QUANTS])).alias("q"), "n"
    ).select("q", F.ceil(F.col("q") * F.col("n")).cast("bigint").alias("r"))
    hist = o.groupBy(
        F.floor(F.col("o_totalprice") / _BIN_W).cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bin", F.sum("c").over(wb).alias("cum"))
    est = (
        F.broadcast(targets)
        .join(cum, F.col("cum") >= F.col("r"))
        .groupBy("q", "r")
        .agg(F.min("bin").alias("eb"))
    )
    ranked = prefix_sum(o, ["o_totalprice", "o_orderkey"], "one", out_col="rk")
    exact = ranked.join(
        F.broadcast(targets.select(F.col("r").alias("rk_t"))),
        F.col("rk") == F.col("rk_t"),
    ).select(F.col("rk"), F.col("o_totalprice").alias("exact_value"))
    est_lo = (F.col("eb") * _BIN_W).cast("double")
    est_hi = ((F.col("eb") + 1) * _BIN_W).cast("double")
    return (
        est.join(exact, est["r"] == exact["rk"])
        .select(
            "q",
            F.col("r").alias("target_rank"),
            est_lo.alias("est_lo"),
            est_hi.alias("est_hi"),
            "exact_value",
            (
                (F.col("exact_value") >= est_lo)
                & (F.col("exact_value") < est_hi)
            ).alias("within_bin"),
        )
    )
