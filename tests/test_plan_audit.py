"""plans/audit.py: the plan-report extractor must read real Catalyst
output correctly — checked against queries whose plan shape is already
pinned by tests/test_plans.py."""

from __future__ import annotations

from mapreduceframework_cpp_spark.plans.audit import plan_report
from mapreduceframework_cpp_spark.registry import all_queries

_Q = all_queries()


def test_report_on_broadcast_join(spark, sf_dir):
    r = plan_report(_Q["q_join_broadcast"](spark, sf_dir))
    assert r["joins"].get("BroadcastHashJoin", 0) >= 1
    assert "SortMergeJoin" not in r["joins"]
    # AQE plan pre-execution: codegen undecided (None) or present — a
    # hard False would mean interpreted row processing
    assert r["whole_stage_codegen"] is not False


def test_report_on_pruned_scan(spark, sf_dir):
    r = plan_report(_Q["q_scan_select_cols"](spark, sf_dir))
    assert r["scan_columns"] == 3  # the projection, not lineitem's 11
    assert r["n_exchanges"] == 0


def test_report_on_filter_pushdown(spark, sf_dir):
    r = plan_report(_Q["q_filter_pred"](spark, sf_dir))
    assert r["has_pushed_filters"]


def test_report_on_groupby(spark, sf_dir):
    r = plan_report(_Q["q_agg_groupby"](spark, sf_dir))
    assert r["n_aggregates"] >= 2  # partial + final
    assert r["n_exchanges"] >= 1


def test_report_on_rollup(spark, sf_dir):
    r = plan_report(_Q["q_ts_rollup_multi"](spark, sf_dir))
    assert r["has_expand"]
