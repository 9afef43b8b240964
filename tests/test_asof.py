"""Unit tests for the asof_join operator (hand-computed golden, both
inclusive and strict modes, no-match rows, partition invariance)."""

from __future__ import annotations

import datetime as dt

import pytest

from mapreduceframework_cpp_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),  # matches r@09:30
            (2, "u1", _ts("2024-01-01T11:00:00")),  # matches r@11:00 (exact)
            (3, "u2", _ts("2024-01-01T08:00:00")),  # no prior right row
            (4, "u3", _ts("2024-01-01T09:00:00")),  # key absent on right
        ],
        "id long, k string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:30:00"), 1.0),
            ("u1", _ts("2024-01-01T11:00:00"), 2.0),
            ("u2", _ts("2024-01-01T09:00:00"), 3.0),
        ],
        "k string, ts timestamp_ntz, v double",
    )
    return left, right


def test_asof_inclusive(frames):
    left, right = frames
    out = asof_join(left, right, ["k"], "ts", "ts", ["ts", "v"], suffix="_r")
    got = {r["id"]: (r["ts_r"], r["v_r"]) for r in out.collect()}
    assert got == {
        1: (_ts("2024-01-01T09:30:00"), 1.0),
        2: (_ts("2024-01-01T11:00:00"), 2.0),  # exact match included
        3: (None, None),
        4: (None, None),
    }


def test_asof_strict(frames):
    left, right = frames
    out = asof_join(
        left, right, ["k"], "ts", "ts", ["v"], suffix="_r", allow_exact_matches=False
    )
    got = {r["id"]: r["v_r"] for r in out.collect()}
    assert got == {1: 1.0, 2: 1.0, 3: None, 4: None}  # exact match excluded for id=2


@pytest.mark.parametrize("nparts", [1, 7])
def test_asof_partition_invariant(frames, nparts):
    left, right = frames
    out = asof_join(
        left.repartition(nparts), right.repartition(nparts), ["k"], "ts", "ts", ["v"]
    )
    got = sorted((r["id"], r["v_asof"]) for r in out.collect())
    assert got == [(1, 1.0), (2, 2.0), (3, None), (4, None)]


def test_tolerance_bounds_staleness(spark):
    """merge_asof-style tolerance: a match exactly at the bound stays, one
    second past it becomes null (row preserved, left-join semantics)."""
    from datetime import datetime

    from mapreduceframework_cpp_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 1, 0, 0)), (2, datetime(2024, 1, 1, 3, 0, 0))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 0), 10.0),
         (2, datetime(2024, 1, 1, 1, 59, 59), 20.0)],
        "k long, ts timestamp, v double",
    )
    out = {
        r.k: r.v_r
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], suffix="_r",
            tolerance_seconds=3600,
        ).collect()
    }
    assert out[1] == 10.0          # exactly 3600s old → kept
    assert out[2] is None          # 3601s old → nulled, row kept


def test_forward_direction(spark):
    """direction='forward': earliest right row at-or-after each left
    row; exact-match inclusion and strict mode mirror backward."""
    from datetime import datetime

    from mapreduceframework_cpp_spark.operators.asof import asof_join

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10)), (2, t(30)), (3, t(50))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(10), 1.0), (1, t(20), 2.0), (2, t(25), 3.0), (2, t(40), 4.0)],
        "k long, ts timestamp, v double",
    )
    fwd = {
        r.k: r.v_r
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], suffix="_r",
            direction="forward",
        ).collect()
    }
    assert fwd == {1: 1.0, 2: 4.0, 3: None}  # 1: exact match; 3: nothing after

    strict = {
        r.k: r.v_r
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], suffix="_r",
            direction="forward", allow_exact_matches=False,
        ).collect()
    }
    assert strict[1] == 2.0  # equal-ts right excluded → next one

    tol = {
        r.k: r.v_r
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], suffix="_r",
            direction="forward", tolerance_seconds=300,
        ).collect()
    }
    assert tol == {1: 1.0, 2: None, 3: None}  # 2's match is 600s ahead
