"""The declared capability inventory (SURVEY.md §2.2).

Importing this package registers every query + oracle pair into
:mod:`mapreduceframework_cpp_spark.registry`.

The external verifier walks the first ~50 registered queries per round,
so registration order is an explicit rotation schedule
(:func:`registry.reorder` below): queries still awaiting a hard driver
correctness signal go first, already-verified families rotate to the
back. Verified green in round 1 (CORRECTNESS_r01.json): aggregations
(minus q_agg_collect, which errored on array output and has since been
serialized — re-queued), analytics, flagship, joins, llm_pipeline
minus its two array-output rows-only queries (also since serialized,
queued right after the window), and the first four of relational.
"""

from mapreduceframework_cpp_spark import registry
from mapreduceframework_cpp_spark.queries import (  # noqa: F401
    relational,
    scalars,
    windows,
    streaming_windows,
    udfs,
    aggregations,
    llm_pipeline,
    analytics,
    flagship,
    joins,
    corpus_ops,
    stats,
    udtf_native,
    behavior,
    curation,
    py_sources,
    safety,
    warehouse,
    sparse_text,
    gateway,
    profiling,
    decision_support,
    tpch_complete,
    mining,
    retrieval,
    robust_stats,
    geospatial,
    evaluation,
)

#: round-5 verification window (kept for the audit trail; see
#: ROUND6_ROTATION below for the live window). All 50 slots came back
#: hash-green in CORRECTNESS_r05.json — cumulative driver signal after
#: round 5: 227 hash-green + 18 rows-only clean of 296 → exactly the
#: 51 ROUND6_ROTATION names still lack a driver row.
ROUND5_ROTATION = [
        # -- Spark-4 SQL surface + streaming state -----------------------
        "q_recursive_cte", "q_sql4_surfaces", "q_str_collation",
        "q_stream_stateful", "q_stream_attrib_coverage",
        # -- Arrow / cogroup UDF surface ---------------------------------
        "q_cogroup_reconcile", "q_arrow_map", "q_agg_approx_topk",
        # -- dedup / similarity remainder --------------------------------
        "q_knn_blocked", "q_dedup_normalized", "q_dedup_rate_curve",
        "q_bloom_prune", "q_link_sorted_neighborhood",
        # -- corpus tooling (queries/corpus_ops.py) ----------------------
        "q_doc_chunks", "q_chunk_dedup", "q_dataset_card",
        "q_sample_balanced", "q_tok_bpe_encode", "q_text_clean",
        "q_text_collapse_runs", "q_tok_vocab_coverage",
        # -- stats remainder (queries/stats.py) --------------------------
        "q_agg_ols_trend", "q_agg_mad", "q_bitmap_distinct",
        # -- event analytics (queries/behavior.py, all 17 untested) ------
        "q_events_markov", "q_events_anomaly", "q_events_conversion_lag",
        "q_sessions_stats", "q_events_funnel_windowed",
        "q_events_seasonality", "q_user_ltv_percentiles",
        "q_events_streaks", "q_events_power_users", "q_attrib_linear",
        "q_events_changepoint", "q_sessions_concurrency",
        "q_events_pattern_match", "q_events_entropy_rate",
        "q_audience_overlap", "q_funnel_by_arm", "q_events_burstiness",
        # -- feature curation (queries/curation.py) ----------------------
        "q_emb_feature_stats", "q_emb_outliers", "q_emb_quantile_norm",
        "q_feat_target_encode", "q_negative_sampling", "q_feat_hashing",
        "q_feat_churn_labels", "q_emb_zscore_outliers", "q_feat_impute",
]

#: round-6 verification window (LIVE — the verifier reads the first ~50
#: registered queries). Round 5 came back 50/50 green, so this list
#: ships verbatim as committed in round 4: exactly the 51 queries left
#: unproven — warehouse.py time-series ops, sparse_text.py lexical
#: stats, SQL gateway scripting, profiling graph ops, mining.py,
#: retrieval.py, robust_stats.py, geospatial.py. 51 > 50 slots: the
#: final name, q_geo_grid_clusters, spills to a round-7 re-confirm
#: window. tests/test_driver_contract.py pins ROUND5_ROTATION +
#: ROUND6_ROTATION == the full unproven-after-r4 backlog, no overlap,
#: and that the live window holds only queries with no green row in
#: CORRECTNESS_r0{1..5}.json.
ROUND6_ROTATION = [
        "q_mix_raking", "q_ts_holt", "q_zorder_profile",
        "q_ts_rolling_corr", "q_incr_join_view", "q_ts_acf",
        "q_ts_seasonal_index", "q_ts_growth", "q_ts_seasonal_anomaly",
        "q_incr_agg_retract", "q_alloc_largest_remainder",
        "q_dup_payments", "q_text_zipf", "q_text_hapax", "q_doc_entropy",
        "q_text_js_divergence", "q_text_logodds", "q_text_perplexity",
        "q_text_rake", "q_sql_scripting", "q_sql_recursive",
        "q_chi_square", "q_benford_audit", "q_graph_purchase_rank",
        "q_join_size_estimate", "q_graph_bfs_dist", "q_graph_labelprop",
        "q_graph_degree_dist", "q_basket_pairs", "q_equidepth_hist",
        "q_rolling_dau", "q_emb_random_projection", "q_emb_pair_distance",
        "q_emb_silhouette", "q_text_bm25", "q_dedup_prefix_filter",
        "q_text_phrase", "q_skyline", "q_agg_weighted_median",
        "q_bootstrap_ci", "q_agg_trimmed", "q_survival_km",
        "q_agg_theilsen", "q_spend_gini", "q_mad_outliers", "q_ks_drift",
        "q_mannwhitney", "q_geo_cell_density", "q_geo_nearest_hub",
        "q_geo_radius_join", "q_geo_grid_clusters",
]

#: round-7 window, committed now so round 7 is mechanical (same pattern
#: that made round 6 mechanical): slot 1 is q_geo_grid_clusters — the
#: single query the 50-slot round-6 window could not hold — and the
#: other 49 re-confirm the queries whose driver evidence is OLDEST
#: (green since round 1, in the order the round-1 driver verified them,
#: topped up with the first round-2 greens), so the re-verification
#: budget goes where green rows have had the most rounds to rot. If any
#: round-6 slot comes back red, its query is re-queued at the head of
#: this list per the standing policy. Registration keeps following
#: ROUND6_ROTATION until the round-6 CORRECTNESS artifact lands.
ROUND7_ROTATION = [
        "q_geo_grid_clusters",
        # -- oldest driver evidence first (CORRECTNESS_r01 order) --------
        "q_agg_groupby", "q_agg_global", "q_agg_distinct",
        "q_distinct_rows", "q_agg_having", "q_agg_rollup",
        "q_agg_cube", "q_agg_grouping_sets", "q_agg_approx_distinct",
        "q_agg_percentile", "q_tpch_q3_shape", "q_tpch_q5_shape",
        "q_scalar_subquery", "q_flagship_charcount", "q_join_inner",
        "q_join_broadcast", "q_join_shuffle_hash", "q_join_left",
        "q_join_right", "q_join_full", "q_join_semi",
        "q_join_anti", "q_join_cross", "q_join_theta_range",
        "q_join_asof", "q_join_interval", "q_join_salted",
        "q_dedup_exact", "q_dedup_near", "q_dedup_ngram_jaccard",
        "q_dedup_simhash", "q_dedup_embedding", "q_sim_topk",
        "q_sim_lsh_topk", "q_text_stats", "q_text_tokens",
        "q_text_quality", "q_text_langid", "q_mm_decode",
        "q_sim_ivf_topk", "q_dedup_clusters", "q_pipeline_e2e",
        "q_sample_stratified", "q_scan_parquet", "q_scan_select_cols",
        "q_project_expr", "q_filter_pred",
        # -- top-up from the first round-2 greens ------------------------
        "q_case_expr", "q_sort_multi",
]

#: Alias kept so callers/tests address "the live window" uniformly
#: across rounds.
VERIFY_ROTATION = ROUND6_ROTATION

registry.reorder(ROUND6_ROTATION)
