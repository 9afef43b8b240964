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

#: round-4 verification window (50 slots). Cumulative driver signal
#: after round 2: 89 hash-green + 7 rows-only clean of 117. This window
#: leads with every query that still lacks a hard driver row:
#: 18 never-verified + 2 round-1 errs fixed at rotation positions 51-52
#: + q_map_funcs (round-2 hash-fail, oracle cast fixed) = 21, then any
#: queries added this round, then rows-only and round-1 hash-green
#: re-confirmations to fill the window.
#: (tests/test_driver_contract.py asserts registration follows this.)
VERIFY_ROTATION = [
        # -- 21 queries with no green driver row yet ---------------------
        # data-safety family (registered after the round-2 window)
        "q_text_pii_scrub", "q_text_quality_gates", "q_dataset_split",
        "q_source_blocklist",
        # Spark-4-native surfaces
        "q_source_python", "q_json_variant", "q_udaf_arrow",
        # as-of variants + binned interval join
        "q_join_asof_tol", "q_join_asof_fwd", "q_join_interval_binned",
        # skew / rollup / approx / mode / sketch aggregates
        "q_skew_keys", "q_ts_rollup_multi", "q_agg_hll_rollup",
        "q_agg_approx_quantile", "q_agg_mode", "q_sketch_countmin",
        # window additions
        "q_win_first_last", "q_win_distinct_count",
        # round-1 err rows, fixed by serialization, parked at 51-52 in r2
        "q_text_fingerprint", "q_mm_features",
        # round-2 hash-fail: oracle HUGEINT now CAST to BIGINT
        "q_map_funcs",
        # -- round-3 additions (driver rows needed this round) -----------
        "q_merge_upsert", "q_scd2_intervals", "q_ts_interpolate",
        "q_text_bigram_lm", "q_tfidf_cosine", "q_dedup_cluster_sizes",
        "q_sql_gateway", "q_stream_enrich",
        "q_events_p99_outliers", "q_orders_rfm", "q_sample_weighted",
        "q_dup_rate_by_source", "q_stream_stream_join",
        "q_emb_quantize_int8", "q_graph_pagerank", "q_dq_audit",
        "q_dedup_containment", "q_table_profile",
        "q_events_paths", "q_events_cooccurrence", "q_events_value_hist",
        "q_tpch_q7_shape", "q_tpch_q10_shape", "q_ts_ewma",
        "q_graph_triangles", "q_dedup_editdist", "q_dedup_bow",
        "q_text_ngram_topk",
        # -- backfill: round-1 hash-green re-confirmation (regression
        #    guard on the highest-value path) -----------------------------
        "q_pipeline_e2e",
]
# Round-4 rotation TODO: run `python tools/next_rotation.py` once
# CORRECTNESS_r03.json lands — it folds every round's driver rows and
# prints the next 50-slot window (unproven first, oldest registration
# first, then green re-confirmations).

registry.reorder(VERIFY_ROTATION)
