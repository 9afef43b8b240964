from __future__ import annotations

from mapreduceframework_cpp_spark.registry import all_queries


def test_approx_distinct_within_5pct(spark, oracle_sf_dir, duck):
    approx = (
        all_queries()["q_agg_approx_distinct"](spark, oracle_sf_dir)
        .collect()[0]["approx_parts"]
    )
    exact = duck.execute("SELECT count(DISTINCT l_partkey) FROM lineitem").fetchone()[0]
    assert abs(approx - exact) / exact <= 0.05, (approx, exact)


def test_approx_quantile_within_1pct(spark, oracle_sf_dir, duck):
    """GK-sketch quantiles at accuracy 10k must land within 1% of the
    exact interpolated percentile (rank error n/10000 « 1% of the value
    range on this data)."""
    from mapreduceframework_cpp_spark.registry import all_queries

    row = all_queries()["q_agg_approx_quantile"](spark, oracle_sf_dir).collect()[0]
    exact = duck.execute(
        "SELECT quantile_cont(o_totalprice, 0.5), "
        "quantile_cont(o_totalprice, 0.95) FROM orders"
    ).fetchone()
    assert abs(row.p50 - exact[0]) / exact[0] <= 0.01, (row.p50, exact[0])
    assert abs(row.p95 - exact[1]) / exact[1] <= 0.01, (row.p95, exact[1])
