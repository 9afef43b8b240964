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
#: after round 3: 132 hash-green + 13 rows-only clean of 296 → 151
#: queries still lack any driver row (`python tools/next_rotation.py`
#: recomputes this from CORRECTNESS_r0{1,2,3}.json). Round 4 is a pure
#: verification round: capability registration is frozen, and all 50
#: slots go to previously-untested queries, ordered by user value
#: (VERDICT r3 §Next-round item 1): the TPC-H completions first — a
#: user's first benchmark run — then decision support, core SQL-surface
#: torture queries, the warehouse/CDC siblings, the five rows-only
#: queries that have never had a driver row, model evaluation, and
#: privacy gates. Remaining backlog after this window: 101, queued for
#: rounds 5-6.
#: (tests/test_driver_contract.py asserts registration follows this.)
VERIFY_ROTATION = [
        # -- TPC-H completions (queries/tpch_complete.py) ----------------
        "q_tpch_q1_shape", "q_tpch_q8_shape", "q_tpch_q9_shape",
        "q_tpch_q13_shape", "q_tpch_q16_shape", "q_tpch_q19_shape",
        "q_tpch_q20_shape",
        # -- decision support (queries/decision_support.py, all 20) ------
        "q_tpch_q11_shape", "q_tpch_q12_shape", "q_tpch_q14_shape",
        "q_tpch_q18_shape", "q_tpch_q22_shape", "q_tpch_q21_shape",
        "q_tpch_q2_shape", "q_tpch_q4_shape", "q_tpch_q6_shape",
        "q_tpch_q15_shape", "q_orders_cohort", "q_orders_abc",
        "q_brand_yoy", "q_supplier_hhi", "q_orders_reorder_gap",
        "q_order_size_dist", "q_cohort_ltv", "q_ols_discount_slope",
        "q_revenue_bridge", "q_mix_shift",
        # -- core SQL-surface torture queries ----------------------------
        "q_null_semantics", "q_win_median", "q_release_pipeline",
        # -- warehouse/CDC siblings (merge/SCD-2 passed r3; these next) --
        "q_date_spine", "q_incr_agg", "q_scd2_pit_lookup",
        "q_dataset_diff",
        # -- rows-only queries with no driver row in any round -----------
        "q_emb_kmeans", "q_tok_bpe_merges", "q_emb_pca_top",
        "q_sketch_theta", "q_sketch_kll",
        # -- model evaluation (queries/evaluation.py, all 7) -------------
        "q_score_auc", "q_score_decile_lift", "q_score_confusion",
        "q_ab_ztest", "q_rank_fusion", "q_annotator_kappa",
        "q_score_calibration",
        # -- privacy gates + behavior lead-off ---------------------------
        # (q_dedup_normalized deferred to round 5: it matches its oracle
        # on 0 rows at sf=0.01 — no normalized dupes in that sample — so
        # a driver slot spent on it would prove nothing)
        "q_k_anonymity", "q_dp_counts", "q_split_leakage",
        "q_events_dau_wau",
]
# Round-5 rotation: run `python tools/next_rotation.py` once
# CORRECTNESS_r04.json lands — it folds every round's driver rows
# (rows-only clean runs count as green) and prints the next 50-slot
# window over the remaining ~101-query backlog (behavior.py,
# warehouse.py series ops, robust_stats.py, sparse_text.py, mining.py,
# geospatial.py, retrieval.py, profiling graph ops, corpus_ops.py).

registry.reorder(VERIFY_ROTATION)
