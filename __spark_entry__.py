"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2, keyed by
name; each callable takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — equivalent DuckDB ANSI SQL per query (omitted for
non-SQL-expressible operators, which get a rows-only check).

Implementations live in ``bend_archiver_spark.queries``; this module is
just the registry adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bend_archiver_spark.queries import REGISTRY

SF_SMOKE_DIR = "/root/testdata/sf0.001"

# Queries with a driver-green CORRECTNESS_r01 row. The round-1 driver
# checked exactly the first 50 registry entries in emission order, so
# emission is ordered never-checked-first: anything without a green
# row (including queries added later) goes to the front of the dict.
_GREEN_R01 = frozenset({
    "scan_predicate", "agg_count_filtered", "agg_minmax_key",
    "agg_minmax_time", "split_key_buckets", "split_time_buckets",
    "rollup_tables_count", "adaptive_batch_plan", "verify_archive_counts",
    "tpch_q1", "tpch_q3_topk", "tpch_q5_region_revenue", "tpch_q6_revenue",
    "window_top_orders_per_customer", "window_running_revenue",
    "sort_limit_topk_orders", "setops_repeat_customers",
    "setops_except_customers", "join_semi_customers_with_orders",
    "join_anti_customers_without_orders", "join_outer_order_fill_rate",
    "string_funcs_parts", "datetime_funcs_orders", "json_funcs_events",
    "rollup_lineitem_status", "pivot_status_by_segment",
    "distinct_flag_status", "asof_join_purchase_session",
    "array_funcs_embeddings", "math_funcs_orders", "tpch_q4_order_priority",
    "tpch_q10_returned_topk", "tpch_q12_priority_class",
    "tpch_q14_promo_ratio", "tpch_q16_part_suppliers",
    "tpch_q18_large_orders", "tpch_q19_disjunctive", "cube_flag_status",
    "grouping_sets_orders", "window_lag_lead_orders", "agg_stats_manual",
    "subquery_scalar_above_avg", "range_join_value_buckets",
    "conditional_funcs_customers", "join_salted_skew",
    "agg_percentiles_orders", "agg_argmax_orders", "tpch_q7_nation_trade",
})


# Queries with a driver-green CORRECTNESS_r03 row (hash_match true).
_GREEN_R03 = frozenset({
    "agg_collect_sorted", "agg_approx_distinct_users",
    "tpch_q8_market_share", "tpch_q17_small_quantity",
    "tpch_q9_product_profit", "tpch_q13_order_distribution",
    "tpch_q15_top_supplier", "tpch_q21_sole_return_supplier",
    "tpch_q22_idle_high_balance", "window_rank_metrics",
    "unpivot_lineitem_metrics", "window_range_sliding_revenue",
    "timeseries_gapfill_daily", "profile_columns_orders",
    "diagnose_key_skew", "map_funcs_events", "setops_all_lineitem",
    "timeseries_moving_avg", "session_window_native",
    "streaming_window_counts", "text_token_stats",
    "text_quality_scores", "text_langid_heuristic", "text_fingerprint",
    "text_tfidf_top_terms", "text_tf_cosine_pairs", "dedup_exact",
    "dedup_exact_tokenset", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding_cosine",
    "dedup_connected_components", "dedup_clusters_keep_one",
    "ann_topk_bruteforce", "ann_lsh_bucketed", "embedding_label_stats",
    "multimodal_binary_meta", "multimodal_frame_sample",
    "pipeline_curate_documents", "pipeline_incremental_dedup",
    "pipeline_hash_sample", "pipeline_train_val_test",
    "pipeline_stratified_sample", "pipeline_token_budget_shards",
    "udtf_token_stats",
})

# Queries with a driver-green CORRECTNESS_r04 row (hash_match true).
# Note three names overlap _GREEN_R01 (scan_predicate,
# agg_count_filtered, agg_minmax_key) — re-confirmed r04.
_GREEN_R04 = frozenset({
    "events_latest_snapshot", "zorder_bucket_stats",
    "verify_quality_constraints", "events_scd2_history",
    "variant_extract_events", "agg_approx_percentile_bounded",
    "agg_corr_manual", "events_value_outliers", "orders_rfm_segmentation",
    "tpch_q2_min_cost_supplier", "tpch_q11_important_parts",
    "tpch_q20_excess_suppliers", "window_first_last_orders",
    "sessionize_events", "funnel_signup_to_purchase",
    "text_length_histogram", "text_fuzzy_match_parts", "text_topk_ngrams",
    "embedding_kmeans_assign", "embedding_int8_quantize",
    "ann_ivf_fixed_codebook", "multimodal_feature_stub",
    "multimodal_resize_plan", "pipeline_temperature_mix",
    "pipeline_reservoir_per_source", "pipeline_chunk_documents",
    "pipeline_dedup_chunks", "udaf_weighted_discount",
    "grouped_map_minmax_norm", "text_pii_redact_events",
    "text_repetition_stats", "text_contamination_check",
    "dedup_semantic_keep_one", "pipeline_stage_funnel", "text_bm25_search",
    "dedup_bloom_prefilter", "text_surprisal_bits", "embedding_pq_encode",
    "ann_pq_adc_topk", "text_quality_classifier", "pipeline_per_source_cap",
    "text_duplicated_ngram_fraction", "text_bpe_regex_tokens",
    "pipeline_dataset_card", "events_interval_join_batch",
    "events_stream_dedup_batch", "events_transition_matrix",
    "scan_predicate", "agg_count_filtered", "agg_minmax_key",
})

# Queries with a driver-green CORRECTNESS_r05 row (hash_match true);
# 49 of 50 checked rows. The one red (embedding_standardize_dims,
# harness canonicalizer choking on its array column) was reshaped to
# the exploded scalar frame in round 6 and stays OUT of the checked
# set so it re-emits in tier 1 for a hash-checked row. Also excluded
# despite r04/r05 greens, because round 6 changed their plan or
# oracle (prefix-sum rewiring, dow-oracle parity, linreg guards):
# orders_abc_classification, orders_rfm_segmentation,
# timeseries_seasonal_decompose, profile_chi2_independence,
# agg_histogram_merge_sources, agg_linear_regression_per_type,
# graph_bfs_hops, graph_triangle_count.
_GREEN_R05 = frozenset({
    "agg_exact_median_distributed", "agg_exact_weighted_median",
    "agg_histogram_quantile", "agg_kmv_distinct_sketch",
    "agg_kmv_merge_sources", "ann_ivf_topk", "ann_topk_diversified",
    "ann_topk_incremental", "ann_topk_mmr", "archive_merge_upsert",
    "archive_resync_plan", "archive_snapshot_diff",
    "dedup_containment_pairs", "dedup_cross_corpus_minhash",
    "dedup_lsh_eval", "dedup_span_coverage",
    "embedding_random_projection", "embedding_top_singular_direction",
    "events_attribution_last_touch", "events_cohort_retention",
    "graph_common_neighbors", "graph_label_propagation",
    "graph_pagerank_event_types", "multimodal_decode_stub",
    "orders_basket_affinity", "pareto_frontier_parts",
    "pipeline_cdc_chunks", "pipeline_curate_v2",
    "pipeline_dsir_importance", "pipeline_per_source_cap_sketch",
    "pipeline_priority_sample", "profile_ks_drift",
    "text_bigram_lm_bits", "text_bpe_encode_corpus",
    "text_bpe_merge_candidates", "text_bpe_train_merges",
    "text_gopher_quality_rules", "text_langid_confusion",
    "text_phrase_search", "timeseries_seasonal_naive_backtest",
    "verify_key_uniqueness", "verify_referential_integrity",
})

# r05 greens whose implementation or oracle changed in round 6 — they
# must re-earn a driver row, so they are deliberately NOT in
# _GREEN_R05 above (see comment) and will lead the r06 emission.
_CHANGED_R06 = frozenset({
    "orders_abc_classification", "orders_rfm_segmentation",
    "timeseries_seasonal_decompose", "profile_chi2_independence",
    "agg_histogram_merge_sources", "agg_linear_regression_per_type",
    "graph_bfs_hops", "graph_triangle_count",
    "embedding_standardize_dims",
    # dec_sum refactor (identical expression chain, re-verified green
    # both scales) — re-emits out of caution
    "agg_corr_manual",
})

_ROWS_ONLY_BY_DESIGN = frozenset()

# Queries with a driver-green CORRECTNESS_r06 row (50/50 hash_match;
# includes every _CHANGED_R06 member plus the stalest r01-era
# re-confirmations).
_GREEN_R06 = frozenset({
    "adaptive_batch_plan", "agg_corr_manual", "agg_gini_revenue",
    "agg_histogram_merge_sources", "agg_hll_distinct_sketch",
    "agg_linear_regression_per_type", "agg_minmax_time",
    "agg_mode_per_group", "agg_skewness_kurtosis_manual",
    "ann_recall_curve", "dedup_cluster_size_histogram",
    "dedup_threshold_curve", "embedding_centroid_distances",
    "embedding_distance_histogram", "embedding_knn_label_accuracy",
    "embedding_silhouette_centroid", "embedding_standardize_dims",
    "events_runs_encoding", "graph_bfs_hops", "graph_edge_jaccard",
    "graph_kcore_peel", "graph_triangle_count", "multimodal_shard_pack",
    "orders_abc_classification", "orders_cohort_ltv",
    "orders_rfm_segmentation", "pipeline_interleave_sources",
    "pipeline_systematic_sample", "profile_chi2_independence",
    "rollup_tables_count", "split_key_buckets", "split_time_buckets",
    "text_entropy_bits", "text_ngram_novelty_rate", "text_sentence_stats",
    "text_source_vocab_overlap", "text_ttr_by_length_decile",
    "text_zipf_fit", "timeseries_anomaly_mad",
    "timeseries_changepoint_cusum", "timeseries_cross_correlation",
    "timeseries_ewma_daily", "timeseries_seasonal_decompose",
    "timeseries_seasonal_strength", "tpch_q1", "tpch_q3_topk",
    "tpch_q5_region_revenue", "verify_archive_counts",
    "verify_block_fingerprints", "window_cume_dist_orders",
})

# Queries whose plan changed in round 7 (forced corpus-proportional
# broadcasts removed per the r06 verdict; BM25 additionally gained the
# candidate semi-join reduction of its per-doc length table). Results
# are identical — the change is join-strategy hints — but convention
# says a changed plan re-earns its driver row, so they lead emission.
_CHANGED_R07 = frozenset({
    "tpch_q2_min_cost_supplier", "tpch_q3_topk",
    "tpch_q5_region_revenue", "tpch_q7_nation_trade",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q10_returned_topk", "tpch_q11_important_parts",
    "tpch_q14_promo_ratio", "tpch_q15_top_supplier",
    "tpch_q16_part_suppliers", "tpch_q17_small_quantity",
    "tpch_q18_large_orders", "tpch_q19_disjunctive",
    "tpch_q20_excess_suppliers", "tpch_q21_sole_return_supplier",
    "pivot_status_by_segment", "text_bm25_search",
    # skyline's exclusive running max moved onto prefix_max (the
    # two-phase range-exchange scan) — fact-scale safe, re-earns a row
    "pareto_frontier_parts",
    # rule expressions factored into gopher_flags (expression-identical,
    # re-verified green) — re-emits out of caution
    "text_gopher_quality_rules",
    # corpus-corpus joins removed: gopher gate inlined into the scan
    # (curate_v2, + keep-one as a window), quality gate inlined +
    # min_by metadata fold (curate_documents: 3 scans + 2 joins ->
    # 1 scan, 1 exchange), label carried through the explode
    # (centroid distances / silhouette — the silhouette also dropped
    # a forced corpus-proportional label broadcast)
    "pipeline_curate_v2",
    "pipeline_curate_documents",
    "embedding_centroid_distances",
    "embedding_silhouette_centroid",
    # broadcast-hint audit, second pass: part-count sides (basket
    # lift), FK customer keys, and per-vector label tables unhinted
    "orders_basket_affinity",
    "verify_quality_constraints",
    "embedding_knn_label_accuracy",
    # third audit pass: per-doc TF-vector norm table unhinted
    "text_tf_cosine_pairs",
})

# Queries with a driver-green CORRECTNESS_r07 AND _r08 row (the two
# rounds checked the identical 50-query set, 50/50 hash_match both
# times: the 28 _CHANGED_R07 members — which already include the four
# round-7 additions — plus 22 stalest r01-era re-confirmations).
_GREEN_R08 = frozenset({
    "array_funcs_embeddings", "asof_join_purchase_session",
    "datetime_funcs_orders", "dedup_exact_substring_removal",
    "dedup_source_priority_keep_one", "distinct_flag_status",
    "embedding_centroid_distances", "embedding_knn_label_accuracy",
    "embedding_silhouette_centroid", "join_anti_customers_without_orders",
    "join_outer_order_fill_rate", "join_semi_customers_with_orders",
    "json_funcs_events", "math_funcs_orders", "orders_basket_affinity",
    "pareto_frontier_parts", "pipeline_curate_documents",
    "pipeline_curate_near_dedup", "pipeline_curate_v2",
    "pipeline_leakage_safe_split", "pivot_status_by_segment",
    "rollup_lineitem_status", "setops_except_customers",
    "setops_repeat_customers", "sort_limit_topk_orders",
    "string_funcs_parts", "text_bm25_search", "text_gopher_quality_rules",
    "text_tf_cosine_pairs", "tpch_q10_returned_topk",
    "tpch_q11_important_parts", "tpch_q14_promo_ratio",
    "tpch_q15_top_supplier", "tpch_q16_part_suppliers",
    "tpch_q17_small_quantity", "tpch_q18_large_orders",
    "tpch_q19_disjunctive", "tpch_q20_excess_suppliers",
    "tpch_q21_sole_return_supplier", "tpch_q2_min_cost_supplier",
    "tpch_q3_topk", "tpch_q4_order_priority", "tpch_q5_region_revenue",
    "tpch_q6_revenue", "tpch_q7_nation_trade", "tpch_q8_market_share",
    "tpch_q9_product_profit", "verify_quality_constraints",
    "window_running_revenue", "window_top_orders_per_customer",
})

# Queries whose plan or expression changed in round 8 — they must
# re-earn a driver row, so they lead the r09 emission:
#  * agg_gini_revenue: forced corpus broadcast of the customer table
#    (alias `c`) removed after the structural guard flagged it
#    (queries/analytics8.py) — physical plan changed.
#  * text_quality_scores: passes_quality re-derived from quality_flag
#    (single-source-of-truth refactor) — expression-equivalent and
#    equivalence-pinned, re-emits out of caution (last row: r03).
_CHANGED_R08 = frozenset({
    "agg_gini_revenue", "text_quality_scores",
})

# Changed in round 9: the predicate-level tightening of the structural
# broadcast guard exposed embedding_label_stats force-broadcasting the
# full per-vector (vec_id, label) projection (corpus-proportional);
# the join was scan-fused away (label rides through explode_quantized)
# — plan changed, re-earns its driver row.
_CHANGED_R09 = frozenset({
    "embedding_label_stats",
    # oracle ALGORITHM rewrite (naive block-pair join -> symmetric-
    # delete candidates, queries/text.py): unlike the mechanical
    # rounding hop below, this changes what the oracle computes its
    # answer FROM, so it re-earns a driver row despite the
    # hash-equal verification at sf0.001/sf0.01/10x.
    "text_fuzzy_match_parts",
    # the LM vocabulary pass folded into the persisted token stream
    # (sentinel-padded arrays_zip, distinct over the unigram hash —
    # queries/quality2.py): one fewer full-corpus scan; plan changed
    # for the standalone query AND its curate_v2 composition, both
    # re-earn rows (hash-green at sf0.001 + sf0.01 post-change).
    "text_bigram_lm_bits", "pipeline_curate_v2",
    # redundant-corpus-scan audit (late round 9): persist barriers on
    # small derived tables collapsed measured re-scans — BPE word
    # table (train 7 scans -> 1, encode 9 -> 2), substring-removal
    # removed-positions table (6 -> 3), trigram TF table (4 -> 1),
    # jaccard shingle stream (4 -> 1). Plans changed, all five
    # re-earn rows (hash-green at sf0.001 + sf0.01 post-change).
    "text_bpe_train_merges", "text_bpe_encode_corpus",
    "dedup_exact_substring_removal", "text_tf_cosine_pairs",
    "dedup_ngram_jaccard",
    # second audit pass, barriers inside shared operators: per-key
    # estimate table in sketch_gated_topk (cap_sketch 6 scans -> 4),
    # quantized-vector table in cosine_pairs_lsh (embedding_cosine
    # 4 -> 1, also semantic_keep_one), per-language counts in
    # temperature_mix (5 -> 2). Plans changed for all four consumers.
    "pipeline_per_source_cap_sketch", "dedup_embedding_cosine",
    "dedup_semantic_keep_one", "pipeline_temperature_mix",
    # registry-wide audit (tools/scan_audit.py): the distinct
    # (order, part) pair stream was re-derived by five consumers (5
    # unbounded lineitem scans -> 1 with the barrier; the other eight
    # flagged queries were adjudicated fine — bounded probe scans or
    # AQE runtime ReusedExchange already dedupes their shared
    # subtrees). Plan changed, re-earns a row.
    "orders_basket_affinity",
    # prefix-filtered exact set-similarity join (Vernica 2010): the
    # no-candidates branch of jaccard_pairs now generates candidates
    # from rarest-first token prefixes instead of the raw token
    # self-join (quadratic in hot-token document frequency — the
    # shape that exhausted 78 GB of oracle temp disk at 100x). The
    # filter is EXACT, so results are bit-identical and the oracles
    # are unchanged; proven vs the brute join at three thresholds +
    # hot-token edge corpora (tests/test_operators.py), hash-green at
    # sf0.001, sf0.01, and 10x. Plans changed for all six consumers
    # (dedup_ngram_jaccard is already listed above).
    "dedup_connected_components", "dedup_clusters_keep_one",
    "dedup_source_priority_keep_one", "pipeline_leakage_safe_split",
    "dedup_lsh_eval",
    # prefix filtering extended to the remaining two raw posting
    # self-joins: the DIRECTED variant (contained-side prefix only,
    # container side full — operators.dedup.
    # prefix_filter_candidates_directed) for containment pairs, and
    # the min-threshold (0.5) symmetric filter for the threshold
    # curve. Both exact by the same theorem; proven vs brute joins
    # (tests/test_operators.py::TestPrefixFilterDirected), hash-green
    # at sf0.001 + sf0.01. Plans changed, both re-earn rows.
    # Additionally (same session), every prefix-filtered consumer —
    # the four _CC_CTE queries, ngram_jaccard, containment, curve —
    # now verifies on 60-bit HASHED shingles (hashed_shingle /
    # _HTOKS_SQL, the minhash path's established convention): int64
    # keys shuffle/spill ~3x less than trigram strings on both
    # engines. Hash-green at sf0.001 + sf0.01 + 10x.
    "dedup_containment_pairs", "dedup_threshold_curve",
    # two-level pigeonhole for simhash banding (4 wide blocks x
    # radius-2 ball join instead of eleven 6-bit equality bands,
    # which generated MORE collisions than the brute self-join at
    # 500k docs: 1.45e9 vs 1.25e9, measured; two-level: 3.9e7).
    # Equality to the direct join pinned at hamming 3/8/10
    # (tests/test_operators.py); hash-green at sf0.001 + sf0.01.
    # Plan changed, re-earns a row.
    "dedup_simhash",
})

# Queries with a driver-green CORRECTNESS_r09 row (50/50 hash_match:
# every _CHANGED_R08/_CHANGED_R09 member plus the stalest r01/r03-era
# re-confirmations the rotation emitted).
_GREEN_R09 = frozenset({
    "agg_approx_distinct_users", "agg_argmax_orders",
    "agg_collect_sorted", "agg_gini_revenue",
    "agg_percentiles_orders", "agg_stats_manual",
    "conditional_funcs_customers", "cube_flag_status",
    "dedup_clusters_keep_one", "dedup_connected_components",
    "dedup_containment_pairs", "dedup_embedding_cosine",
    "dedup_exact_substring_removal", "dedup_lsh_eval",
    "dedup_ngram_jaccard", "dedup_semantic_keep_one",
    "dedup_simhash", "dedup_source_priority_keep_one",
    "dedup_threshold_curve", "diagnose_key_skew",
    "embedding_label_stats", "grouping_sets_orders",
    "join_salted_skew", "map_funcs_events",
    "orders_basket_affinity", "pipeline_curate_v2",
    "pipeline_leakage_safe_split", "pipeline_per_source_cap_sketch",
    "pipeline_temperature_mix", "profile_columns_orders",
    "range_join_value_buckets", "session_window_native",
    "setops_all_lineitem", "streaming_window_counts",
    "subquery_scalar_above_avg", "text_bigram_lm_bits",
    "text_bpe_encode_corpus", "text_bpe_train_merges",
    "text_fuzzy_match_parts", "text_quality_scores",
    "text_tf_cosine_pairs", "timeseries_gapfill_daily",
    "timeseries_moving_avg", "tpch_q12_priority_class",
    "tpch_q13_order_distribution", "tpch_q22_idle_high_balance",
    "unpivot_lineitem_metrics", "window_lag_lead_orders",
    "window_range_sliding_revenue", "window_rank_metrics",
})

# Changed in round 10 (the simhash two-level block-width clamp does
# NOT re-tier: it only alters expressions on the non-dividing path no
# registered query takes — the registered dedup_simhash optimized
# plan was diffed byte-identical before/after):
#  * embedding_standardize_dims: the 100x family sweep caught a
#    0.0 vs -0.0 divergence (Spark's BigDecimal round has no signed
#    zero; DuckDB keeps IEEE -0.0 — manifests only when an element
#    lands exactly on its dimension mean, first possible at 100x).
#    Both engines now normalize with `+ 0.0` after the round —
#    expression changed on both sides, re-earns a driver row.
#  * the PPJoin length+positional candidate bounds (operators/
#    dedup.py prefix_filter_candidates[_directed] + the oracle
#    fragment): exact by theorem and pinned bit-equal to brute by
#    the unit suite, but the SPARK PLAN of every prefix-filter
#    consumer changed, so each re-earns a hash-checked driver row.
#    (CORRECTION, r10 ADVICE: the original comment here claimed the
#    MinHash consumers' Spark plans were untouched — wrong. The
#    round-10 verification rewrite (pair_intersections /
#    array_intersect replacing the exploded token re-join) changed
#    the plans of dedup_minhash_lsh, dedup_cross_corpus_minhash, and
#    pipeline_curate_near_dedup, and their oracles gained
#    list_intersect inter CTEs. dedup_minhash_lsh happened to ride
#    the staleness rotation and earned a green r10 driver row WITH
#    the new plan; the other two did not and are re-tiered in
#    _CHANGED_R11 below.)
_CHANGED_R10 = frozenset({
    "embedding_standardize_dims",
    "dedup_ngram_jaccard", "dedup_threshold_curve",
    "dedup_containment_pairs", "dedup_lsh_eval",
    "dedup_connected_components", "dedup_clusters_keep_one",
    "dedup_source_priority_keep_one", "pipeline_leakage_safe_split",
})

# Queries with a driver-green CORRECTNESS_r10 row (50/50 hash_match:
# every _CHANGED_R10 member plus the stalest r03/r04-era
# re-confirmations the rotation emitted — incl. dedup_minhash_lsh,
# whose round-10 plan change (pair_intersections verify path) was
# thereby driver-verified even though it was mistakenly left out of
# _CHANGED_R10).
_GREEN_R10 = frozenset({
    "agg_approx_percentile_bounded", "agg_count_filtered",
    "agg_minmax_key", "ann_ivf_fixed_codebook", "ann_lsh_bucketed",
    "ann_topk_bruteforce", "dedup_clusters_keep_one",
    "dedup_connected_components", "dedup_containment_pairs",
    "dedup_exact", "dedup_exact_tokenset", "dedup_lsh_eval",
    "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_source_priority_keep_one", "dedup_threshold_curve",
    "embedding_int8_quantize", "embedding_kmeans_assign",
    "embedding_standardize_dims", "events_latest_snapshot",
    "events_scd2_history", "events_value_outliers",
    "funnel_signup_to_purchase", "grouped_map_minmax_norm",
    "multimodal_binary_meta", "multimodal_feature_stub",
    "multimodal_frame_sample", "multimodal_resize_plan",
    "pipeline_chunk_documents", "pipeline_dedup_chunks",
    "pipeline_hash_sample", "pipeline_incremental_dedup",
    "pipeline_leakage_safe_split", "pipeline_reservoir_per_source",
    "pipeline_stratified_sample", "pipeline_token_budget_shards",
    "pipeline_train_val_test", "scan_predicate", "sessionize_events",
    "text_fingerprint", "text_langid_heuristic",
    "text_length_histogram", "text_tfidf_top_terms",
    "text_token_stats", "text_topk_ngrams", "udaf_weighted_discount",
    "udtf_token_stats", "variant_extract_events",
    "window_first_last_orders", "zorder_bucket_stats",
})

# Changed (or change-detected late) in round 11 — each re-earns a
# hash-checked driver row, so they lead the r11 emission:
#  * dedup_cross_corpus_minhash / pipeline_curate_near_dedup: their
#    round-10 Spark plans changed (pair_intersections /
#    array_intersect verification) and their oracles gained
#    list_intersect CTEs, but the _CHANGED_R10 set omitted them (r10
#    ADVICE, medium). Both are hash-green in the builder's own
#    sf0.001/sf0.01/10x/100x sweeps with the new plan; driver rows
#    are the hard signal they still owe.
#  * dedup_exact_substring_removal: round-11 oracle-only rewrite of
#    the cleaned-doc rebuild (per-position list_contains ->
#    boundary-slice concatenation, linear in doc length — r10
#    ADVICE, low). Value-invariant by full compares at sf0.001 +
#    sf0.01; re-emits under the text_fuzzy_match_parts precedent for
#    oracle ALGORITHM changes.
#  * dedup_simhash: oracle ALGORITHM rewrite — candidate generation
#    now mirrors the Spark two-level pigeonhole (4 wide blocks x
#    radius-2 enumerated balls) instead of the brute O(n^2)
#    fingerprint self-join, which is what lets the 100x sweep RUN
#    this oracle (1.25e11 brute pair evaluations -> ~4e7
#    candidates). Exact by the pigeonhole theorem; pigeonhole==brute
#    pinned in DuckDB itself at sf0.001 + sf0.01
#    (tests/test_oracle_parity.py).
#  * dedup_embedding_cosine / dedup_semantic_keep_one: the LSH gate's
#    plane count is now SCALE-ADAPTIVE on both engines (smallest p in
#    [6,15] with 2^p*64 >= n — Python integer loop Spark-side, the
#    generated threshold-CASE ladder oracle-side, lockstep-pinned).
#    Every driver corpus sits at the 6-plane floor so values are
#    unchanged where previously verified, but the plan gained the
#    corpus-size probe and the oracle gained the params CTE — plan
#    AND oracle changed, both re-earn rows.
_CHANGED_R11 = frozenset({
    "dedup_cross_corpus_minhash", "pipeline_curate_near_dedup",
    "dedup_exact_substring_removal",
    "dedup_simhash", "dedup_embedding_cosine",
    "dedup_semantic_keep_one",
})

# NOT re-tiered in round 9, deliberately: the DuckDB-rounding fix
# (CAST(dec AS VARCHAR) AS DOUBLE hop, 52 oracle strings + the
# o_dec_sum/o_dec_avg helpers) and the MATERIALIZED-CTE rewrite of the
# graph oracles are ORACLE-ONLY changes — zero Spark plans moved — and
# were proven value-invariant by full 226/226 batteries at BOTH
# sf0.001 and sf0.01 immediately after the rewrite, plus the 10x-scale
# sweep. Re-tiering 52 queries would spend the entire 50-row driver
# budget re-confirming measured-invariant strings and starve the
# stale-r03 rotation the round-8 verdict prioritized.

_CHECKED_GOOD = (
    (
        _GREEN_R01 | _GREEN_R03 | _GREEN_R04 | _GREEN_R05 | _GREEN_R06
        | _GREEN_R08 | _GREEN_R09 | _GREEN_R10
    )
    - _CHANGED_R11
) | _ROWS_ONLY_BY_DESIGN


def _staleness_round(name: str) -> int:
    """Most recent round with a green driver row for *name* (0 = never)."""
    if name in _GREEN_R10:
        return 10
    if name in _GREEN_R09:
        return 9
    if name in _GREEN_R08:
        return 8
    if name in _GREEN_R06:
        return 6
    if name in _GREEN_R05:
        return 5
    if name in _GREEN_R04:
        return 4
    if name in _GREEN_R03 or name in _ROWS_ONLY_BY_DESIGN:
        return 3
    if name in _GREEN_R01:
        return 1
    return 0


def _ordered_names() -> list[str]:
    """Emission order for a possibly-capped correctness pass:
    (1) queries with no green driver row yet (new/changed this round —
    tests/test_registry.py pins the count under the ~50-row cap), then
    (2) already-green queries, least-recently-checked first (r01-era
    greens are 4 rounds stale; they lead so each driver pass
    re-confirms the stalest ~50 instead of re-checking last round's
    set). Ties keep registry order — stable and deterministic."""
    names = list(REGISTRY.keys())
    tier1 = [n for n in names if n not in _CHECKED_GOOD]
    tier2 = sorted(
        (n for n in names if n in _CHECKED_GOOD),
        key=lambda n: _staleness_round(n),
    )
    return tier1 + tier2


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 pricing summary on sf0.001."""
    return REGISTRY["tpch_q1"].spark(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
