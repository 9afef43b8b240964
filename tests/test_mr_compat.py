"""MR-compat wrapper property tests (SURVEY.md §5.2 item 4).

The contract of ``MapReduceClient.h:57-64``: every emitted (k2,v2)
reaches exactly one reduce group; group contents are the exact multiset
of emits for that key; output is invariant under partition count and
input permutation — precisely the invariants the reference's
pointer-identity shuffle violates (SURVEY.md §2.1 R6).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduceframework_cpp_spark.operators.mr_compat import map_reduce_job
from mapreduceframework_cpp_spark.plans import JobStateTracker, Stage


def _charcount_mr(spark, strings, nparts):
    df = spark.createDataFrame(
        [(None, s) for s in strings], "k1 string, v1 string"
    ).repartition(nparts)
    return map_reduce_job(
        df,
        map_fn=lambda _k, text: Counter(text).items(),
        reduce_fn=lambda ch, counts: [(ch, sum(counts))],
        intermediate_schema="k2 string, v2 long",
        output_schema="k3 string, v3 long",
    )


SAMPLE = ["This string is full of characters", "Multithreading is awesome",
          "race conditions are bad"]


@pytest.mark.parametrize("nparts", [1, 4, 16])
def test_charcount_via_mr_compat(spark, nparts):
    got = {r["k3"]: r["v3"] for r in _charcount_mr(spark, SAMPLE, nparts).collect()}
    assert got == dict(Counter("".join(SAMPLE)))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    strings=st.lists(st.text(alphabet="abcXYZ 01", max_size=12), max_size=6),
    nparts=st.sampled_from([1, 3]),
)
def test_mr_contract_properties(spark, strings, nparts):
    """Output = exact per-key multiset fold, under any partitioning and
    any input permutation."""
    expected = dict(Counter("".join(strings)))
    got = {r["k3"]: r["v3"] for r in _charcount_mr(spark, strings, nparts).collect()}
    assert got == expected
    perm = list(reversed(strings))
    got_perm = {r["k3"]: r["v3"] for r in _charcount_mr(spark, perm, nparts).collect()}
    assert got_perm == expected


def test_reduce_sees_sorted_values(spark):
    """≙ R5 per-group sort (deterministic version of
    MapReduceFramework.cpp:92)."""
    df = spark.createDataFrame(
        [(None, "x"), (None, "x"), (None, "x")], "k1 string, v1 string"
    ).repartition(3)
    out = map_reduce_job(
        df,
        map_fn=lambda _k, v: [("k", ord(v[0]))],
        reduce_fn=lambda k, vals: [(k, 1 if vals == sorted(vals) else 0)],
    )
    assert [r["v3"] for r in out.collect()] == [1]


def test_multi_emit_and_empty_emit(spark):
    """map may emit 0..n pairs; reduce may emit several."""
    df = spark.createDataFrame(
        [(None, "ab"), (None, ""), (None, "b")], "k1 string, v1 string"
    )
    out = map_reduce_job(
        df,
        map_fn=lambda _k, v: [(c, 1) for c in v],  # empty string emits nothing
        reduce_fn=lambda k, vals: [(k, sum(vals)), (k + "!", len(vals))],
    )
    got = {r["k3"]: r["v3"] for r in out.collect()}
    assert got == {"a": 1, "a!": 1, "b": 2, "b!": 2}


def test_job_state_tracker(spark, oracle_sf_dir):
    """R12 parity: track a real job; final state is REDUCE/100% and
    sampled percentages are within [0,100]."""
    from mapreduceframework_cpp_spark.sources.tables import tbl

    tracker = JobStateTracker(spark, poll_interval_s=0.02)
    with tracker:
        tbl(spark, oracle_sf_dir, "lineitem").groupBy("l_partkey").count().collect()
    final = tracker.state()
    assert final.stage is Stage.REDUCE and final.percentage == 100.0
    assert all(0.0 <= s.percentage <= 100.0 for s in tracker.history)
    assert tracker.history  # at least the final sample
