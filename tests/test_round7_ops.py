"""Round-7 operator property tests.

The leakage-safe split's contract is structural, not just
value-matching: a near-dup cluster must never span two splits under
the cluster-hash assignment, while the naive doc-hash assignment
genuinely scatters some multi-document clusters (otherwise the audit
column is vacuous).
"""

from pyspark.sql import functions as F

from bend_archiver_spark.operators import dedup as ops
from bend_archiver_spark.operators.graph import connected_components
from bend_archiver_spark.queries import REGISTRY
from bend_archiver_spark.queries.base import hash64_expr, t
from bend_archiver_spark.queries.dedup import _JACCARD_THRESHOLD


def _assignments(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    pairs = ops.jaccard_pairs(
        ops.shingle(d, "doc_id", "text"), _JACCARD_THRESHOLD
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs, d.select("doc_id"))

    def bucket(col):
        b = hash64_expr(col.cast("string")) % 100
        return F.when(b < 80, "train").when(b < 90, "val").otherwise("test")

    return comp.select(
        "doc_id",
        "component_id",
        bucket(F.col("component_id")).alias("split"),
        bucket(F.col("doc_id")).alias("naive_split"),
    )


class TestLeakageSafeSplit:
    def test_no_cluster_spans_splits(self, spark, sf_dir):
        """The invariant the operator exists for: every component maps
        to exactly ONE split under the cluster-hash assignment."""
        a = _assignments(spark, sf_dir)
        spanning = (
            a.groupBy("component_id")
            .agg(F.count_distinct("split").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        assert spanning == 0

    def test_naive_split_actually_leaks(self, spark, sf_dir):
        """The audit column must measure something real: at least one
        multi-doc cluster is scattered by the doc-hash split (if the
        corpus ever stops having such clusters, the test data — not
        the operator — changed)."""
        a = _assignments(spark, sf_dir)
        leaky = (
            a.groupBy("component_id")
            .agg(F.count_distinct("naive_split").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        assert leaky > 0

    def test_registered_totals_match_assignments(self, spark, sf_dir):
        """The registered per-split rollup must reconcile with the raw
        assignment frame: doc totals, cluster totals, leaky-cluster
        totals."""
        a = _assignments(spark, sf_dir).cache()
        out = {
            r["split"]: r
            for r in REGISTRY["pipeline_leakage_safe_split"]
            .spark(spark, sf_dir)
            .collect()
        }
        n_docs = a.count()
        n_clusters = a.select("component_id").distinct().count()
        assert sum(r["n_docs"] for r in out.values()) == n_docs
        assert sum(r["n_clusters"] for r in out.values()) == n_clusters
        leaky = (
            a.groupBy("component_id")
            .agg(F.count_distinct("naive_split").alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        assert (
            sum(r["n_naive_leaky_clusters"] for r in out.values()) == leaky
        )
        a.unpersist()


class TestExactSubstringRemoval:
    def test_partition_identity_and_coverage_bound(self, spark, sf_dir):
        """Structural contract: kept + removed == total for every doc,
        and removal never exceeds duplicated-span coverage (the keeper
        occurrence is exempt, so removed <= covered)."""
        rem = {
            r["doc_id"]: r
            for r in REGISTRY["dedup_exact_substring_removal"]
            .spark(spark, sf_dir)
            .collect()
        }
        cov = {
            r["doc_id"]: r["n_cov"]
            for r in REGISTRY["dedup_span_coverage"]
            .spark(spark, sf_dir)
            .collect()
        }
        assert rem, "no documents"
        for doc_id, r in rem.items():
            assert r["n_kept"] + r["n_removed"] == r["n_tokens"], doc_id
            assert r["n_removed"] <= cov[doc_id], doc_id
        # the transform is live on this corpus: something was removed
        assert any(r["n_removed"] > 0 for r in rem.values())
        # untouched docs fingerprint their original token stream
        assert all(
            r["cleaned_hash"] is not None for r in rem.values()
        )
