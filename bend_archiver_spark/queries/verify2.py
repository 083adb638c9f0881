"""Dataset verification beyond row counts: referential integrity,
key uniqueness, and distribution-drift tests.

The reference verifies an archive by count comparison
(`/root/reference/verifier/verify.go`); ``verify.py`` upgrades that
to content fingerprints and ``archiver2.py`` to row-level diffs. This
module adds the remaining production verification layer:

- ``verify_referential_integrity``: orphan counts for every foreign
  key relationship in the schema — the join-integrity audit a
  warehouse runs after every load.
- ``verify_key_uniqueness``: primary-key duplicate audit per table —
  the precondition every keyed MERGE/upsert silently assumes.
- ``profile_ks_drift``: the two-sample Kolmogorov-Smirnov statistic
  between two sources' document-length distributions, computed
  EXACTLY in integers (max |cum_a * n_b - cum_b * n_a| over the
  combined support, one division at the end) — the standard
  data-drift monitor between two corpus snapshots/sources.
- ``profile_chi2_independence``: chi-square independence of
  event_type x day-of-week — seasonality/independence testing with
  integer observed counts and per-cell contributions rounded to
  decimal BEFORE the cross-cell sum, keeping the statistic
  partition-invariant (double addition across cells would be
  order-dependent).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import register, t

# (name, child table, fk col, parent table, pk col, parent is a
# broadcastable dimension)
_RELS = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey", False),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey", True),
)

_RI_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS relationship,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {child} c
            WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                              WHERE p.{pk} = c.{fk})) AS n_orphans
    """
    for name, child, fk, parent, pk, _ in _RELS
)


@register(
    "verify_referential_integrity",
    oracle=_RI_ORACLE,
    tags=("archiver", "verify", "integrity"),
)
def verify_referential_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Foreign-key orphan audit over every relationship in the
    schema: per FK, the child row count and the number of child rows
    whose key has no parent — the verification layer that catches
    partial loads and out-of-order syncs count comparison
    (`/root/reference/verifier/verify.go`) cannot see. Each
    child table is scanned ONCE no matter how many FKs it carries:
    its relationships chain as left joins against distinct parent-key
    tables carrying a hit marker (dimension parents broadcast —
    nation/region/part/supplier; the fact-fact pairs lineitem->orders
    and orders->customer hash-join on their load key), and a single
    combinable aggregate emits total + per-FK orphan counts, unpivoted
    to one row per relationship. 7 relationships cost 5 table scans
    total (lineitem's three FKs share one pass)."""
    by_child: dict[str, list] = {}
    for rel in _RELS:
        by_child.setdefault(rel[1], []).append(rel)
    rows = []
    for child, rels in by_child.items():
        c = t(spark, sf_dir, child).select(*[r[2] for r in rels])
        for i, (name, _, fk, parent, pk, dim) in enumerate(rels):
            p = (
                t(spark, sf_dir, parent)
                .select(F.col(pk).alias(fk))
                .distinct()
                .withColumn(f"hit{i}", F.lit(1))
            )
            c = c.join(p if not dim else F.broadcast(p), fk, "left")
        agg = c.agg(
            F.count(F.lit(1)).alias("n_child"),
            *[
                F.sum(F.when(F.col(f"hit{i}").isNull(), 1).otherwise(0)).alias(
                    f"orph{i}"
                )
                for i in range(len(rels))
            ],
        )
        for i, (name, *_rest) in enumerate(rels):
            rows.append(
                agg.select(
                    F.lit(name).alias("relationship"),
                    F.col("n_child").cast("bigint").alias("n_child"),
                    F.col(f"orph{i}").cast("bigint").alias("n_orphans"),
                )
            )
    return reduce(DataFrame.unionAll, rows)


_KEYS = (
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("orders", ("o_orderkey",)),
    ("customer", ("c_custkey",)),
    ("part", ("p_partkey",)),
    ("supplier", ("s_suppkey",)),
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
)

_UNIQ_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{table}' AS table_name,
           '{",".join(key)}' AS key_cols,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {table}) AS n_rows,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT 1 FROM {table}
                  GROUP BY {", ".join(key)})) AS n_keys,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT 1 FROM {table}
                  GROUP BY {", ".join(key)}
                  HAVING COUNT(*) > 1)) AS n_dup_keys
    """
    for table, key in _KEYS
)


@register(
    "verify_key_uniqueness",
    oracle=_UNIQ_ORACLE,
    tags=("archiver", "verify", "integrity"),
)
def verify_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key duplicate audit: per table, total rows, distinct
    key groups, and the number of keys appearing more than once —
    the precondition every keyed MERGE / SCD upsert / idempotent
    re-archive silently assumes, checked explicitly. Per table one
    map-combinable key groupBy feeds both the distinct count and the
    duplicate count (a second, group-count-bounded aggregate); the
    8-row union is constant-size. At 100 TB this runs as one pass
    per table with no joins at all."""
    rows = []
    for table, key in _KEYS:
        tbl = t(spark, sf_dir, table)
        groups = tbl.groupBy(*key).agg(F.count(F.lit(1)).alias("c")).persist()
        summary = groups.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_keys"),
        )
        rows.append(
            summary.select(
                F.lit(table).alias("table_name"),
                F.lit(",".join(key)).alias("key_cols"),
                "n_rows",
                "n_keys",
                "n_dup_keys",
            )
        )
    return reduce(DataFrame.unionAll, rows)


_KS_A, _KS_B = "src0", "src1"

_KS_ORACLE = f"""
WITH f AS (
  SELECT n_chars AS v,
         CASE WHEN source = '{_KS_A}' THEN 1 ELSE 0 END AS a,
         CASE WHEN source = '{_KS_B}' THEN 1 ELSE 0 END AS b
  FROM documents WHERE source IN ('{_KS_A}', '{_KS_B}')),
pv AS (
  SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM f GROUP BY v),
cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_a,
         SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_b
  FROM pv),
n AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM f)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(MAX(abs(cum_a * nb - cum_b * na)) AS BIGINT) AS ks_num,
       CAST(MAX(abs(cum_a * nb - cum_b * na)) AS DOUBLE)
         / (na * nb) AS ks_stat
FROM cum, n
GROUP BY na, nb
"""


@register(
    "profile_ks_drift",
    oracle=_KS_ORACLE,
    headline=True,  # round-5 showcase: exact-integer drift statistic
    tags=("profile", "drift", "statistics"),
)
def profile_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between two sources'
    document-length distributions — the standard drift monitor
    between corpus snapshots — computed EXACTLY: D = max over the
    combined support of |ECDF_a - ECDF_b| is evaluated as the integer
    max of |cum_a*n_b - cum_b*n_a| (int64: cum <= n, so the products
    stay below n^2 ~ 10^10 at sf1000) with ONE double division at
    the end, so the statistic is bit-identical under any partitioning
    and both engines. Shuffle shape: one source-filtered combinable
    groupBy to the distinct-value table, then a value-bounded
    cumulative window and a 1-row max; the window is unpartitioned
    but runs over DISTINCT lengths (bounded by the value domain, not
    the corpus — same dimension-bounded argument as the skyline)."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("source").isin(_KS_A, _KS_B)
    )
    f = d.select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == _KS_A, 1).otherwise(0).alias("a"),
        F.when(F.col("source") == _KS_B, 1).otherwise(0).alias("b"),
    )
    pv = f.groupBy("v").agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = pv.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    n = f.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    diff = F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
    return (
        cum.crossJoin(F.broadcast(n))
        .groupBy("na", "nb")
        .agg(F.max(diff).alias("ks_num"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.col("ks_num").cast("bigint").alias("ks_num"),
            (
                F.col("ks_num").cast("double")
                / (F.col("na") * F.col("nb"))
            ).alias("ks_stat"),
        )
    )


_EPOCH = "2024-01-01"

_CHI2_ORACLE = f"""
WITH obs AS (
  SELECT event_type,
         (((date_trunc('day', ts)::DATE - DATE '{_EPOCH}') % 7) + 7) % 7 AS dow,
         COUNT(*) AS o
  FROM events GROUP BY 1, 2),
rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
ct AS (SELECT dow, SUM(o) AS c FROM obs GROUP BY 1),
n AS (SELECT SUM(o) AS n FROM obs),
cells AS (
  SELECT CAST((CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
              * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
              / (CAST(r AS DOUBLE) * c / n) AS DECIMAL(38,6)) AS contrib
  FROM obs JOIN rt USING (event_type) JOIN ct USING (dow), n)
SELECT (SELECT CAST((COUNT(DISTINCT event_type) - 1)
                    * (COUNT(DISTINCT (((date_trunc('day', ts)::DATE
                                       - DATE '{_EPOCH}') % 7) + 7) % 7) - 1)
               AS BIGINT) FROM events) AS dof,
       CAST(CAST(SUM(contrib) AS VARCHAR) AS DOUBLE) AS chi2
FROM cells
"""


@register(
    "profile_chi2_independence",
    oracle=_CHI2_ORACLE,
    tags=("profile", "drift", "statistics"),
)
def profile_chi2_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-square independence test of event_type x day-of-week —
    "is activity mix seasonal?" as a query. Observed counts are exact
    int64 from one combinable groupBy; expected counts and per-cell
    contributions are identical double chains; each contribution is
    rounded to DECIMAL(38,6) BEFORE the cross-cell sum so the
    statistic does not depend on cell visit order (double addition
    is not associative; decimal addition is — the dec_sum argument
    applied to a derived quantity). Everything after the first
    groupBy runs on |types| x 7 cells; dow is pure day arithmetic,
    no engine weekday numbering."""
    ev = t(spark, sf_dir, "events")
    dow = F.pmod(
        F.datediff(F.date_trunc("day", F.col("ts")).cast("date"), F.lit(_EPOCH)),
        F.lit(7),
    )
    obs = ev.groupBy(F.col("event_type"), dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("o")
    ).persist()
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    contrib = (
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    ).cast("decimal(38,6)")
    cells = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .select(contrib.alias("contrib"))
    )
    # the two distinct counts run as SEPARATE single-distinct
    # aggregates over the persisted cell table: two distincts in one
    # Aggregate go through RewriteDistinctAggregates' Expand, which
    # (a) doubles the input stream at scale and (b) assigns its group
    # ids in per-process hash order — the plan text itself is
    # nondeterministic across JVMs, which broke the recorded plan
    # fingerprints (PLANS.json)
    dt = obs.agg(
        (F.count_distinct("event_type") - 1).cast("bigint").alias("dt")
    )
    dd = obs.agg((F.count_distinct("dow") - 1).cast("bigint").alias("dd"))
    dof = dt.crossJoin(dd).select(
        (F.col("dt") * F.col("dd")).cast("bigint").alias("dof")
    )
    return dof.crossJoin(
        cells.agg(F.sum("contrib").cast("double").alias("chi2"))
    ).select("dof", "chi2")
