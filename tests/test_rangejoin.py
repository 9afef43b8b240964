"""Binned interval join (operators/rangejoin.py): boundary semantics,
bin-spanning pairs meet exactly once, and the plan stays an equi-join
(no nested-loop fallback)."""

from __future__ import annotations

import contextlib
import io
from datetime import datetime

import pyspark.sql.functions as F

from mapreduceframework_cpp_spark.operators.rangejoin import binned_interval_join
from mapreduceframework_cpp_spark.registry import all_queries


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 0, minute, second)


def test_boundaries_and_bin_spanning(spark):
    """[start, end) semantics: the start instant matches, the end
    instant does not; an interval spanning a bin edge matches points in
    both bins and each pair appears exactly once."""
    intervals = spark.createDataFrame(
        [(1, _ts(5))], "iid long, s timestamp"
    )  # interval [00:05, 00:15) with 600s bins → spans bins 0 and 1
    points = spark.createDataFrame(
        [
            (10, _ts(5)),        # == start → in
            (11, _ts(9, 59)),    # bin 0 → in
            (12, _ts(12)),       # bin 1 → in
            (13, _ts(15)),       # == end → OUT (exclusive)
            (14, _ts(4, 59)),    # before start, same bin → out
        ],
        "pid long, p timestamp",
    )
    got = binned_interval_join(
        intervals,
        points,
        start=F.col("s"),
        end=F.col("s") + F.expr("INTERVAL 10 MINUTES"),
        point=F.col("p"),
        bin_seconds=600,
    ).select("iid", "pid")
    rows = sorted((r.iid, r.pid) for r in got.collect())
    assert rows == [(1, 10), (1, 11), (1, 12)]


def test_binned_join_plans_as_equi_join(spark, sf_dir):
    """The whole point: the keyless interval join must NOT plan as
    BroadcastNestedLoopJoin/CartesianProduct once binned."""
    df = all_queries()["q_join_interval_binned"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_partition_count_invariance(spark):
    """Same result at 1, 4 and 16 input partitions — binning must not
    depend on physical layout."""
    import pyspark.sql.functions as F
    from datetime import datetime

    intervals = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, i)) for i in range(0, 50, 5)],
        "iid long, s timestamp",
    )
    points = spark.createDataFrame(
        [(100 + i, datetime(2024, 1, 1, 0, i, 30)) for i in range(50)],
        "pid long, p timestamp",
    )
    results = []
    for parts in (1, 4, 16):
        got = binned_interval_join(
            intervals.repartition(parts),
            points.repartition(parts),
            start=F.col("s"),
            end=F.col("s") + F.expr("INTERVAL 5 MINUTES"),
            point=F.col("p"),
            bin_seconds=300,
        ).select("iid", "pid")
        results.append(sorted((r.iid, r.pid) for r in got.collect()))
    assert results[0] == results[1] == results[2]
    assert results[0], "empty join result would vacuously pass"


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ivals=st.lists(
        st.integers(min_value=0, max_value=3600), min_size=1, max_size=8
    ),
    pts=st.lists(
        st.integers(min_value=-300, max_value=4200), min_size=1, max_size=12
    ),
    length=st.sampled_from([60, 450, 600]),
    bin_seconds=st.sampled_from([120, 600]),
)
def test_matches_bruteforce_on_random_intervals(
    spark, ivals, pts, length, bin_seconds
):
    """Property: binned join ≡ brute-force [s, s+len) containment for
    arbitrary interval/point layouts, including intervals longer than a
    bin and points outside every interval."""
    import pyspark.sql.functions as F
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    intervals = spark.createDataFrame(
        [(i, base + timedelta(seconds=s)) for i, s in enumerate(ivals)],
        "iid long, s timestamp",
    )
    points = spark.createDataFrame(
        [(i, base + timedelta(seconds=p)) for i, p in enumerate(pts)],
        "pid long, p timestamp",
    )
    got = sorted(
        (r.iid, r.pid)
        for r in binned_interval_join(
            intervals,
            points,
            start=F.col("s"),
            end=F.col("s") + F.expr(f"INTERVAL {length} SECONDS"),
            point=F.col("p"),
            bin_seconds=bin_seconds,
        )
        .select("iid", "pid")
        .collect()
    )
    want = sorted(
        (i, j)
        for i, s in enumerate(ivals)
        for j, p in enumerate(pts)
        if s <= p < s + length
    )
    assert got == want
