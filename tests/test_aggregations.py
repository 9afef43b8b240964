from __future__ import annotations

from mapreduceframework_cpp_spark.registry import all_queries


def test_approx_distinct_within_5pct(spark, oracle_sf_dir, duck):
    approx = (
        all_queries()["q_agg_approx_distinct"](spark, oracle_sf_dir)
        .collect()[0]["approx_parts"]
    )
    exact = duck.execute("SELECT count(DISTINCT l_partkey) FROM lineitem").fetchone()[0]
    assert abs(approx - exact) / exact <= 0.05, (approx, exact)
