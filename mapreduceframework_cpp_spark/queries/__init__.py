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

#: round-5 verification window (50 slots). Cumulative driver signal
#: after round 4: 177 hash-green + 18 rows-only clean of 296 → 101
#: queries still lack any driver row (`python tools/next_rotation.py`
#: recomputes this from CORRECTNESS_r0{1..4}.json). Round 5 continues
#: the pure-verification schedule: registration is frozen at 296, all
#: 50 slots go to previously-untested queries, in backlog order
#: (VERDICT r4 §Next-round item 1): the Spark-4 SQL-surface queries
#: first (recursive CTE, collation, stateful streaming), then the
#: Arrow/cogroup UDF surface, the remaining dedup/similarity paths
#: (q_dedup_normalized reshaped this round so its sf0.01 slot is
#: non-vacuous — per-language dedup counters instead of dup groups
#: only), corpus tooling, and the behavior.py + curation.py families.
#: (tests/test_driver_contract.py asserts registration follows this.)
VERIFY_ROTATION = [
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

#: round-6 window, committed now so round 6 is mechanical (VERDICT r4
#: item 4): exactly the 51 queries left unproven after the round-5
#: window above — warehouse.py time-series ops, sparse_text.py lexical
#: stats, SQL gateway scripting, profiling graph ops, mining.py,
#: retrieval.py, robust_stats.py, geospatial.py. If any round-5 slot
#: comes back red, its query is re-queued at the head of this list;
#: otherwise it ships verbatim (51 > 50 slots: the final name,
#: q_geo_grid_clusters, spills to a round-7 re-confirm window).
#: tests/test_driver_contract.py pins VERIFY_ROTATION + ROUND6_ROTATION
#: == the full unproven backlog, no overlap.
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

registry.reorder(VERIFY_ROTATION)
