"""Plan-hygiene introspection (SURVEY.md §4): extract the scale-relevant
properties of a query's physical plan as data, so hygiene can be
asserted, tracked and reported instead of eyeballed from `.explain()`.

The reference has no plans to audit — its execution shape is fixed
(`MapReduceFramework.cpp:151-170`); on Spark the plan IS the performance
contract, so the engine ships a way to read it programmatically.

Used by tests (tests/test_plan_audit.py) and runnable as a report:

    python -m mapreduceframework_cpp_spark.plans.audit [sf_dir]

prints one line per headline query: exchanges, join strategies, whether
pushdown/pruning reached the scan, and codegen presence.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

#: physical join operators worth distinguishing in a report
_JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _explain(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def plan_report(df: DataFrame) -> dict:
    """Scale-relevant facts about ``df``'s physical plan.

    Keys:
      n_exchanges     shuffle count (each is a full write+read of the data)
      joins           {join operator name: count} for join ops present
      has_pushed_filters   any parquet scan received pushed predicates
      scan_columns    columns materialized by the widest parquet scan
                      (ReadSchema — pruning proof)
      whole_stage_codegen  row-level work compiled, not interpreted
      n_aggregates    HashAggregate count (partial+final pairs expected)
      has_expand      grouping-sets/rollup Expand present
    """
    p = _explain(df, "formatted")
    node_headers = re.findall(r"^\(\d+\)\s+(\S+)", p, flags=re.MULTILINE)
    joins: dict[str, int] = {}
    for op in _JOIN_OPS:
        n = sum(1 for h in node_headers if h.startswith(op))
        if n:
            joins[op] = n
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    scan_cols = max(
        (len([c for c in s.split(",") if c.strip()]) for s in read_schemas),
        default=0,
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    return {
        "n_exchanges": sum(1 for h in node_headers if h.startswith("Exchange")),
        "joins": joins,
        "has_pushed_filters": any(s.strip() for s in pushed),
        "scan_columns": scan_cols,
        # codegen spans only show in simple mode ("*(n)" prefixes), and
        # only once the plan is final — an AQE plan that has not executed
        # yet reports None (undecided), not False
        "whole_stage_codegen": (
            True
            if "*(" in (simple := _explain(df, "simple"))
            else (None if "isFinalPlan=false" in simple else False)
        ),
        "n_aggregates": sum(
            1 for h in node_headers if h.startswith("HashAggregate")
        ),
        "has_expand": any(h.startswith("Expand") for h in node_headers),
    }


def main() -> None:  # pragma: no cover - report entry point
    import json
    import sys

    from mapreduceframework_cpp_spark.registry import all_queries
    from mapreduceframework_cpp_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bench import HEADLINE  # repo-root bench defines the headline set

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in HEADLINE:
        print(name, json.dumps(plan_report(queries[name](spark, sf_dir))))
    spark.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
