"""Partition-invariance: the engine's core determinism claim.

Every registered query promises BIT-IDENTICAL results under any
partitioning (decimal-exact sums, integer bit-math logs, total-order
windows). This test actually varies `spark.sql.shuffle.partitions`
(a runtime conf — takes effect per-query without a new session) and
compares full result sets for a representative slice of the registry:
shuffle-heavy aggregation, MinHash banding, the persist-barriered
bigram LM, the salted-window KMV sketch, the two-phase per-source cap,
and the composed curation funnel. A failure here means some operator
leaked partition-order dependence (e.g. a float sum or a
non-total-order window) that the DuckDB oracle comparison could mask
by luck at one fixed partitioning.
"""

import pytest

from bend_archiver_spark.queries import REGISTRY

QUERIES = [
    "tpch_q1",
    "dedup_minhash_lsh",
    "text_bigram_lm_bits",
    "agg_kmv_distinct_sketch",
    "pipeline_per_source_cap",
    "pipeline_curate_v2",
    # round-5 third-phase additions: CDC chunk stats (map-side marker
    # chunker + two groupBys), integer PageRank (iterative, cached
    # node tables), the prefix-sum weighted median (range exchange is
    # partition-count sensitive by construction — the offsets must
    # absorb it), the sketch merge, and the MMR greedy trajectory.
    "pipeline_cdc_chunks",
    "graph_pagerank_event_types",
    "agg_exact_weighted_median",
    "agg_kmv_merge_sources",
    "ann_topk_mmr",
    # round-5 fourth-phase additions: wedge-closure triangle counting
    # (persisted edge barrier + 3-arm self-join), the histogram
    # quantile sketch (fixed bins must make it invariant BY
    # CONSTRUCTION — this is the test of that claim), and the
    # span-coverage gram join (distinct-union of overlapping spans).
    "graph_triangle_count",
    "agg_histogram_quantile",
    "dedup_span_coverage",
    # fifth phase: synchronous LPA (deterministic tie-break is the
    # claim under test), the sketch merge (fixed bins => associative),
    # and per-group OLS (decimal moment sums).
    "graph_label_propagation",
    "agg_histogram_merge_sources",
    "agg_linear_regression_per_type",
    # sixth phase: BFS (anti-join frontier dedup), last-touch
    # attribution (IGNORE NULLS running last over a total order),
    # per-dim standardization (collect_list arrival order must be
    # neutralized by the struct sort).
    "graph_bfs_hops",
    "events_attribution_last_touch",
    "embedding_standardize_dims",
    # verification/drift family: the KS statistic is exact integers
    # until one division; chi2 rounds per-cell contributions to
    # decimal BEFORE the cross-cell sum — this test is what makes
    # that rounding policy load-bearing.
    "profile_ks_drift",
    "profile_chi2_independence",
    # final slots: ABC classes are decided by exact decimal
    # cross-multiplication over a total order — the claim under test.
    "orders_abc_classification",
    # round-6 additions: the distributed-ntile RFM scores (prefix-sum
    # ranks must absorb the partition count, same as the weighted
    # median), the dyadic EWMA (power-of-two weights => exact), the
    # CUSUM argmax (exact decimal statistic with day tie-break), the
    # Zipf octave fit (prefix-sum ranks + integer OLS), n-gram
    # novelty (min-owner groupBy), onion peeling (iterative semi-join
    # survivor sets), the source interleave (global prefix rank minus
    # broadcast offsets MUST equal the per-source window form), block
    # fingerprints (bit_xor is the order-independence claim itself),
    # and the LSH recall sweep (min-table aggregate over collisions).
    "orders_rfm_segmentation",
    "timeseries_ewma_daily",
    "timeseries_changepoint_cusum",
    "text_zipf_fit",
    "text_ngram_novelty_rate",
    "graph_kcore_peel",
    "pipeline_interleave_sources",
    "verify_block_fingerprints",
    "ann_recall_curve",
    # round-6 second batch: Gini (prefix ranks + exact decimal rank
    # products), islands encoding (two windows over one exchange),
    # shard packing (byte prefix sum), composed seasonal strength
    # (decimal re-sums of rounded components).
    "agg_gini_revenue",
    "events_runs_encoding",
    "multimodal_shard_pack",
    "timeseries_seasonal_strength",
    # round-6 third batch: HLL registers (int64 max + bit shifts are
    # the invariance claim), the integer-cross-multiplied threshold
    # sweep, and the ntile_distributed decile rollup.
    "agg_hll_distinct_sketch",
    "dedup_threshold_curve",
    "text_ttr_by_length_decile",
    # round-7 additions: the prefix_max skyline (the two-phase running
    # max must absorb the partition count exactly like the prefix
    # sums), and the composed quality+near-dup funnel (minhash pair
    # set and greedy drop rule must be partitioning-independent).
    "pareto_frontier_parts",
    "pipeline_curate_near_dedup",
    # the cleaned-text rebuild collects (pos, token) structs whose
    # arrival order varies with partitioning — array_sort must fully
    # neutralize it before the md5 fingerprint.
    "dedup_exact_substring_removal",
]


def _rows(spark, sf_dir, name):
    df = REGISTRY[name].spark(spark, sf_dir)
    cols = sorted(df.columns)
    out = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(out, key=repr)


def _drop_caches(spark):
    """Both the Spark block cache AND the analytics7 daily-rollup memo
    — the memo hands back the same (re-persisting) DataFrame, so
    without clearing it the second width would reread blocks (or a
    physical plan) materialized at the first width and the comparison
    would be vacuous for exactly the persisted stages."""
    from bend_archiver_spark.queries.analytics7 import clear_daily_cache

    spark.catalog.clearCache()
    clear_daily_cache()


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_partitioning(spark, sf_dir, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, sf_dir, name)
        _drop_caches(spark)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(spark, sf_dir, name)
        assert a == b
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        _drop_caches(spark)
