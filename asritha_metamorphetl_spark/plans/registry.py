"""Registry of driver-visible queries and their DuckDB oracle SQL.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL string the DuckDB oracle runs on the same parquet
tables. Column names/aliases must match exactly (the driver sorts columns
by name before value-hashing). Queries whose semantics aren't
SQL-expressible register with ``oracle=None`` → driver runs a rows-only
check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None


_REGISTRY: dict[str, RegisteredQuery] = {}

#: Names surfaced FIRST by all_queries(), in this order; everything else
#: follows in registration order. The correctness driver checks the
#: first 50 registry entries directly, so this front window holds the
#: newest and semantically riskiest queries — new operators, changed
#: approximation knobs (ANN, recall evals), the LLM-data-pipeline
#: surface, streaming parity — with the long-stable TPC-H tail behind
#: them. test_registry_oracle pins that every name here exists (a typo
#: must fail tests, not silently demote a query out of the window).
QUERY_PRIORITY: tuple[str, ...] = (
    # =====================================================================
    # ROUND-13 DRIVER WINDOW (first 50 = exactly what the correctness
    # driver checks). Slots 1-5: the five round-13 contract queries
    # (plans/round13_queries.py - degenerate-vector census, IEEE NaN
    # total-order, pmod-on-negatives, explode_outer preservation,
    # interpolated quartiles). Slot 6: price_mad_robust_scale (3->2
    # scans, VERDICT r12 finding #1). Slots 7-21: the fifteen
    # similarity/clustering queries that gained the FINITE-VECTOR gate
    # (operators/similarity.finite_vectors mirrored in their oracles;
    # VERDICT r12 directive #6) - changed code must re-enter the
    # window. Slots 22-28: seven _parity_suite consumers - six
    # representatives of the shared-orchestration change (private
    # build session + failure memo + guarded dedup-fold broadcast;
    # VERDICT r12 directive #5), covering each changed mechanism (the
    # dedup fold's broadcast guard, the build-heavy wmdrop family,
    # MoR interplay, the late-batch fold, sketch state, bucketed
    # CDC), plus streaming_gram_parity whose own body/oracle changed
    # (it gained the FINITE-VECTOR gate with its batch covariance
    # twin). The four displaced siblings' query bodies and oracles
    # are UNCHANGED since their green r12 driver rows and every one
    # stays in the committed full-registry selfchecks at both SFs.
    # Slots 29-45: the SEVENTEEN additional embedding consumers that
    # gained the FINITE-VECTOR gate this round
    # (PQ/IVF-PQ/residual/BQ-recall/hard-negative/histogram, the
    # int8/dim/centering/covariance/label-stats profiles, centroid
    # bands, hybrid RRF's dense side, curation_verdict's semantic
    # stage - the hostile-embedding fixture showed each crashing or
    # floor-breaking ungated) - changed code must re-enter the
    # window, and three of them (embedding_int8_profile,
    # embedding_label_stats, label_centering_profile) are themselves
    # r5-stale rows, so the slots do double duty. Slots 46-50: five
    # of the STALEST driver rows (last checked round 5). The slot
    # budget is explicit: 45 changed-code slots left five for stale
    # rotation this round; every r5-stale row NOT in the window has a
    # green driver-faithful recheck committed in
    # STALE_RECHECK_r13.json and leads the r14 rotation.
    # =====================================================================
    "embedding_degenerate_audit",
    "nan_total_order_audit",
    "pmod_negative_keys_audit",
    "explode_outer_empty_audit",
    "interpolated_quartiles_audit",
    "price_mad_robust_scale",
    "knn_cosine_topk",
    "knn_lsh_topk",
    "knn_lsh_recall_eval",
    "embedding_near_dups",
    "knn_ivf_topk",
    "knn_ivf_recall_eval",
    "semdedup_survivors",
    "semdedup_recall_eval",
    "ivf_twolevel_agreement",
    "kmeans_step_centroids",
    "embedding_cluster_sizes",
    "embedding_norm_outliers",
    "cosine_pair_histogram",
    "embedding_dim_clip_profile",
    "embedding_label_centroid_spread",
    "streaming_ingest_dedup_parity",
    "streaming_watermark_drop_parity",
    "streaming_mor_delete_parity",
    "streaming_late_batch_fold_parity",
    "streaming_hll_parity",
    "streaming_bucketed_cdc_parity",
    "streaming_gram_parity",
    "knn_pq_topk",
    "knn_pq_recall_eval",
    "knn_ivfpq_topk",
    "knn_ivfpq_recall_eval",
    "knn_ivfpq_residual_topk",
    "knn_ivfpq_residual_recall_eval",
    "knn_bq_recall_eval",
    "hard_negative_mining",
    "pq_code_histogram",
    "hybrid_search_rrf",
    "embedding_covariance_matrix",
    "embedding_label_stats",
    "embedding_int8_profile",
    "embedding_dim_profile",
    "label_centering_profile",
    "centroid_distance_bands",
    "curation_verdict",
    "approx_distinct_audit",
    "bigram_lm_scores",
    "cdc_orders_snapshot",
    "cdc_resumable_state",
    "corpus_splits",
    # ---- below the driver window (slot 51+) -------------------------
    # The four parity consumers displaced by the slot budget (bodies +
    # oracles unchanged since their r12 driver rows) and the r5-stale
    # rows displaced by the seventeen new gated queries (all covered
    # by STALE_RECHECK_r13.json; they lead the r14 rotation).
    "streaming_countmin_parity",
    "streaming_weighted_sample_parity",
    "streaming_semi_additive_parity",
    "streaming_retry_fold_parity",
    "cross_split_contamination",
    "customer_order_gaps",
    "dup_clusters",
    "incremental_revenue_state",
    "legacy_day_slice",
    "minhash_recall_eval",
    "pii_scrub_profile",
    "quantile_sketch_audit",
    "reconcile_lineitem_composite",
    "scd2_order_history",
    "two_way_anova_price",
    "weekend_event_value_qq",
    "weibull_interarrival_shape",
    "hill_tail_index",
    "below_median_streaks",
    "event_type_lift_matrix",
    "dedup_cluster_size_powerlaw",
    "simhash_hamming_of_candidates",
    "streaming_sliding_parity",
    "streaming_static_enrich_parity",
    "systematic_sample_global_rank",
    "null_safe_join_audit",
    "cube_margins_audit",
    "regex_token_profile",
    "first_last_nonnull_window_audit",
    "streaming_interval_join_parity",
    "streaming_outer_join_parity",
    "dq_violations",
    "order_price_stats",
    "order_value_tiers_scalable",
    "priority_parse",
    "reconcile_orders_cells",
    "reconcile_orders_summary",
    "token_frequencies",
    "top5_orders",
    "bpe_token_stats",
    "media_asset_features",
    "view_purchase_asof",
    "curated_corpus",
    "doc_length_histogram",
    "event_funnel",
    "lineitem_measures_long",
    "quality_deciles",
    "salted_hot_user_events",
    "user_retention_cohorts",
    "doc_chunks",
    "packed_sequence_stats",
    "packed_training_sequences",
    "frequent_triples",
    "largest_remainder_allocation",
    "brand_size_price_slopes",
    "revenue_mix_shift_decomposition",
    "user_survival_curve",
    "cold_start_supplier_share",
    "weekend_order_value_ttest",
    "streaming_new_users_parity",
    "orders_runs_test",
    "page_hinkley_daily_orders",
    "weekend_value_mannwhitney",
    "bh_adjusted_anomalies",
    "minhash_band_tuning",
    "cusum_daily_revenue",
    "lorenz_curve_points",
    "price_size_skyline",
    "open_order_concurrency",
    "kruskal_wallis_brand_price",
    "brown_forsythe_price_variance",
    "jarque_bera_order_values",
    "hot_key_skew_safe_distinct",
    "doc_bigram_entropy_scores",
    "repeat_interval_median_by_segment",
    "double_ewma_trend",
    "time_travel_version_diff",
    "doc_repetition_profile",
    "gopher_quality_flags",
    "source_mix_weights",
    "views_before_purchase",
    "customers_with_open_orders",
    "open_minus_fulfilled_customers",
    "open_and_pending_customers",
    "event_gaps",
    "events_hourly",
    "event_props_stats",
    "priority_price_profile",
    "props_kv_totals",
    "party_directory",
    "events_sliding_stats",
    "doc_text_stats",
    "doc_language_counts",
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "cume_dist_scalable",
    "weighted_median_price",
    "order_value_mad",
    "join_key_skew_audit",
    "fuzzy_part_name_pairs",
    "session_type_affinity",
    "customer_decile_transitions",
    "price_equiwidth_histogram",
    "text_number_extraction_profile",
    "seasonal_adjustment_residuals",
    "median_ci_binomial",
    "part_size_price_anova",
    "first_touch_attribution",
    "daily_new_vs_returning",
    "dwell_time_by_type",
    "hour_dow_load_heatmap",
    "interarrival_burstiness",
    "session_purchase_rate",
    "user_lifespan_histogram",
    "event_value_deciles_by_type",
    "ship_latency_percentiles_by_priority",
    "supplier_nation_herfindahl",
    "part_type_price_iqr",
    "order_line_value_concentration",
    "nation_month_revenue_anomalies",
    "customer_order_value_cv",
    "lineitem_tax_discount_grid",
    "returns_month_seasonality",
    "brand_price_dispersion",
    "embedding_sign_bias_profile",
    "daily_revenue_drawdown",
    "priority_mix_quarter_psi",
    "hourly_error_rate_wilson",
    "streaming_first_touch_parity",
    "supplier_performance",
    "product_performance",
    "customer_sales_report",
    "pricing_summary",
    "top3_parts_per_brand",
    "customers_without_orders",
    "repeat_customers",
    "lineitem_rollup",
    "orders_status_pivot",
    "running_customer_spend",
    "event_sessions",
    "user_journeys",
    "daily_revenue_spine",
    "similar_part_names",
    "minhash_near_dups",
    "incremental_agg_view",
    "bottomk_quantile_audit",
    "bottomk_merge_parity",
    "order_value_percentile_bands",
    "yoy_revenue_growth_by_region",
    "running_ytd_revenue_by_nation",
    "order_priority_escalation",
    "week_over_week_volume_change",
    "order_lines_histogram",
    "discount_band_lift",
    "returns_rate_by_brand",
    "price_precision_profile",
    "customer_tenure_histogram",
    "nation_trade_balance",
    "supplier_balance_outliers",
    "part_brand_share_entropy",
    "order_fulfillment_backlog",
    "supplier_rank_tie_semantics",
    "ks_two_sample_price",
    "spearman_price_qty",
    "kendall_tau_daily",
    "daily_count_dispersion",
    "entropy_categorical_columns",
    "cramers_v_categorical_pairs",
    "rolling_active_users_7d",
    "session_duration_deciles",
    "funnel_conversion_latency",
    "user_churn_classification",
    "bipartite_degree_histogram",
    "event_value_pareto",
    "hourly_load_imbalance",
    "transition_entropy_by_type",
    "session_gap_sensitivity",
    "hapax_legomena_rate",
    "heaps_law_fit",
    "simhash_prefix_buckets",
    "sentence_length_profile",
    "doc_prefix_dup_groups",
    "token_length_histogram",
    "char_class_profile",
    "null_completeness_profile",
    "key_cardinality_audit",
    "fd_violation_audit",
    "natural_key_dup_audit",
    "clustered_skipping_gain",
    "eval_ngram_contamination",
    "heavy_hitter_tokens",
    "leakage_free_splits",
    "near_dup_best_keeper",
    "normalized_dup_gain",
    "quality_drift_psi",
    "quality_importance_sample",
    "shard_manifest_incremental",
    "zonemap_pruned_scan",
    "lineitem_corr_matrix",
    "regr_price_on_qty",
    "zipf_token_slope",
    "benford_price_digits",
    "gini_revenue_concentration",
    "chi2_priority_segment_cells",
    "mutual_info_status_priority",
    "winsorized_price_stats",
    "fk_orphan_audit",
    "fellegi_sunter_links",
    "posting_list_stats",
    "type_token_stats_by_source",
    "tfidf_top_terms",
    "padding_waste_by_bucket",
    "dedup_threshold_sweep",
    "rolling_zscore_outliers",
    "shingle_vocab_curve",
    "ngram_novelty_profile",
    "global_decile_source_mix",
    "split_balance_psi_cells",
    "knn_jl_topk",
    "knn_jl_recall_eval",
    "equidepth_chars_histogram",
    "cube_returnflag_status",
    "loo_source_influence",
    "event_transition_matrix",
    "stratified_kfold_assignment",
    "mor_shuffled_delete_scan",
    "autocorrelation_daily_orders",
    "theil_sen_daily_trend",
    "weekday_seasonality_profile",
    "semi_additive_last_balance",
    "median_order_value_by_priority",
    "top_decile_revenue_share",
    "customer_rfm_segments",
    "rollup_region_nation_revenue",
    "copurchase_jaccard_parts",
    "orderkey_islands",
    "lang_id_confusion",
    "source_overlap_matrix",
    "lonely_late_suppliers",
    "top_revenue_supplier",
    "curated_shard_manifest",
    "bloom_prune_audit",
    "ewma_daily_orders",
    "revenue_grouping_sets",
    "market_basket_rules",
    "bpe_merge_steps",
    "mor_delete_scan",
    "mor_compaction_profile",
    "knn_bq_topk",
    "hll_set_algebra_audit",
    "order_volume_anomalies",
    "pca_power_projection",
    "part_copurchase_pagerank",
    "copurchase_triangle_rank",
    "hll_register_table",
    "hll_estimate_audit",
    "selfjoin_size_estimate",
    "incremental_join_view",
    "bootstrap_mean_ci",
    "merge_into_orders",
    "quality_weighted_sample",
    "per_source_weighted_sample",
    "skipgram_cooccurrence",
    "skipgram_pmi",
    "countmin_estimate_audit",
    "prefix_jaccard_pairs",
    "containment_dup_pairs",
    "token_entropy_scores",
    "oov_rate_profile",
    "robust_length_outliers",
    "quality_vs_dup_calibration",
    "orders_table_profile",
    "merged_event_intervals",
    "quality_score_percentiles",
    "bm25_search",
    "unimax_source_allocation",
    "token_budget_mix",
    "snapshot_time_travel",
    "zorder_layout_profile",
    "zorder3_layout_profile",
    "scd2_pointintime_totals",
    "segment_balance_quartiles",
    "winnow_fingerprint_profile",
    "winnow_candidate_pairs",
    "knn_l2_topk",
    "dup_passage_spans",
    "dup_span_removal_stats",
    "incremental_dedup_pairs",
    "near_dup_survivors",
    "quality_logit_scores",
    "training_shard_manifest",
    "cdc_bucketed_state",
    "cdc_bucketed_changefeed",
    "market_share",
    "nation_year_profit",
    "revenue_rollup",
    "shipping_priority",
    "promo_revenue_pct",
    "returned_item_customers",
    "large_volume_customers",
    "nation_pair_trade",
    "local_supplier_volume",
    "small_quantity_revenue",
    "cheapest_supplier_per_part",
    "priority_order_waiting",
    "supplier_part_concentration",
    "customer_order_distribution",
    "bracket_revenue",
    "forecast_revenue_change",
    "idle_rich_customers",
    "sql_api_revenue_by_region",
    "reconcile_orchestrated",
    "streaming_sessions_parity",
    "streaming_distinct_pairs",
    "streaming_hourly_events",
    "streaming_type_totals",
    "stratified_label_sample",
    "source_quota_sample",
    "temperature_mix_sample",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and its DuckDB oracle SQL) under ``name``.

    CONTRACT — partition-count invariance (ADVICE r12): a registered
    query's RESULT must not depend on ``spark.sql.shuffle.partitions``
    or any other parallelism knob. The driver, the bench loop, a
    ``--jobs`` sweep, and a 1000-executor deploy all run the same
    queries at different parallelism; anything order- or
    partition-sensitive (top-k, samples, ranks) must pin a total
    tiebreak or derive from data values only (the discipline
    SCALING.md's SAMPLING/TRUNCATION contracts document per query).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle)
        return fn

    return deco


def _ordered() -> list[RegisteredQuery]:
    front = [_REGISTRY[n] for n in QUERY_PRIORITY if n in _REGISTRY]
    seen = set(QUERY_PRIORITY)
    return front + [q for q in _REGISTRY.values() if q.name not in seen]


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {q.name: q.fn for q in _ordered()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from asritha_metamorphetl_spark.plans import (  # noqa: F401
        analytics2_queries,
        analytics3_queries,
        analytics4_queries,
        analytics_queries,
        ann_queries,
        behavior_queries,
        catalog_queries,
        commerce_queries,
        corpus_queries,
        curation_queries,
        er_queries,
        integrity_queries,
        lexical_queries,
        linalg_queries,
        operator_queries,
        passage_queries,
        pipeline_queries,
        profile_queries,
        quality_queries,
        retail_queries,
        round12_queries,
        round13_queries,
        sketch_queries,
        stats_queries,
        streaming_queries,
        vector_queries,
        timeseries_queries,
        text_queries,
        tpch_deep,
        tpch_queries,
    )

    _LOADED = True
