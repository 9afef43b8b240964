"""Randomized brute-force references for the operators whose
correctness arguments are the most intricate (SURVEY §7 "what's hard"):

- asof_join (operators/asof.py): the side-tag + window construction has
  a 2x2x2 truth table (direction x exact-match x tolerance) where every
  fixed golden so far was hand-picked; random timestamps WITH ties and
  duplicate keys exercise corners no golden enumerates. Reference: the
  O(n·m) literal definition evaluated in Python.
- dedup_clusters (operators/dedup.py): min-label propagation to
  fixpoint; random edge sets (self-loops, duplicate and reversed pairs,
  chains) against a Python union-find. A chain longer than the
  iteration budget would silently mis-cluster — the probe must converge,
  not just stop.
- binned_interval_join (operators/rangejoin.py): random [start, end)
  windows and points vs the quadratic definition; bin-edge alignment is
  the classic off-by-one.

Each hypothesis example runs Spark jobs, so examples are few and inputs
small; the value is the corner coverage, not the volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduceframework_cpp_spark.operators.asof import asof_join
from mapreduceframework_cpp_spark.operators.dedup import dedup_clusters

_BASE = dt.datetime(2024, 1, 1)


def _ref_asof(left, right, allow_exact, direction, tol):
    """Literal definition: per left row, best right row on the same key."""
    out = {}
    for lid, lk, lts in left:
        best = None
        for rk, rts, rv in right:
            if rk != lk:
                continue
            if direction == "backward":
                ok = rts <= lts if allow_exact else rts < lts
            else:
                ok = rts >= lts if allow_exact else rts > lts
            if tol is not None and ok:
                ok = abs((lts - rts).total_seconds()) <= tol
            if not ok:
                continue
            # best = closest ts; ties on ts are impossible per strategy
            # (right timestamps deduped per key)
            if best is None or (
                abs((lts - rts).total_seconds())
                < abs((lts - best[0]).total_seconds())
            ):
                best = (rts, rv)
        out[lid] = best[1] if best else None
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 30)), min_size=1, max_size=8
    ),
    right=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 30)), min_size=1, max_size=8
    ),
    allow_exact=st.booleans(),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.sampled_from([None, 300.0]),
)
def test_asof_matches_bruteforce(spark, left, right, allow_exact, direction, tol):
    lrows = [
        (i, f"k{k}", _BASE + dt.timedelta(minutes=m))
        for i, (k, m) in enumerate(left)
    ]
    # dedupe right (key, ts): value = minute, deterministic per slot
    rseen = {}
    for k, m in right:
        rseen[(f"k{k}", _BASE + dt.timedelta(minutes=m))] = float(m)
    rrows = [(k, ts, v) for (k, ts), v in rseen.items()]

    ldf = spark.createDataFrame(lrows, "id long, k string, ts timestamp_ntz")
    rdf = spark.createDataFrame(rrows, "k string, ts timestamp_ntz, v double")
    got = {
        r.id: r.v_asof
        for r in asof_join(
            ldf,
            rdf,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["v"],
            allow_exact_matches=allow_exact,
            tolerance_seconds=tol,
            direction=direction,
        ).collect()
    }
    want = _ref_asof(lrows, rrows, allow_exact, direction, tol)
    assert got == want


def _ref_components(pairs):
    """Union-find over the pair list; cluster id = min member."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=20,
    )
)
def test_dedup_clusters_matches_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_id_a long, doc_id_b long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(df).collect()}
    assert got == _ref_components(pairs)


def test_dedup_clusters_long_chain_converges(spark):
    """A 40-node path graph needs more label-prop rounds than a casual
    iteration cap — the convergence probe must keep going (min-label
    propagation halves distance-to-minimum per round only along
    shortcuts it has already made; a path is the worst case)."""
    pairs = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(pairs, "doc_id_a long, doc_id_b long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(df, max_iter=64).collect()}
    assert got == {i: 0 for i in range(41)}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    intervals=st.lists(
        # (start_second, length_seconds): lengths 0..900 straddle the
        # 600 s bin both ways; zero-length intervals must match nothing
        st.tuples(st.integers(0, 1800), st.integers(0, 900)),
        min_size=1,
        max_size=6,
    ),
    points=st.lists(st.integers(0, 2700), min_size=1, max_size=10),
)
def test_binned_interval_join_matches_bruteforce(spark, intervals, points):
    """[start, end) over random second offsets vs the quadratic
    definition — bin-edge alignment (point or boundary exactly on a
    multiple of bin_seconds) is the classic off-by-one."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.operators.rangejoin import (
        binned_interval_join,
    )

    irows = [
        (i, _BASE + dt.timedelta(seconds=s), _BASE + dt.timedelta(seconds=s + ln))
        for i, (s, ln) in enumerate(intervals)
    ]
    prows = [
        (j, _BASE + dt.timedelta(seconds=p)) for j, p in enumerate(points)
    ]
    idf = spark.createDataFrame(irows, "iid long, s timestamp, e timestamp")
    pdf = spark.createDataFrame(prows, "pid long, p timestamp")
    got = sorted(
        (r.iid, r.pid)
        for r in binned_interval_join(
            idf,
            pdf,
            start=F.col("s"),
            end=F.col("e"),
            point=F.col("p"),
            bin_seconds=600,
        )
        .select("iid", "pid")
        .collect()
    )
    want = sorted(
        (i, j)
        for i, (s, ln) in enumerate(intervals)
        for j, p in enumerate(points)
        if s <= p < s + ln
    )
    assert got == want
