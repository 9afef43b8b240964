"""PageRank (operators/graph.py): hand-checked fixture, exact
determinism across partitionings, and mass conservation."""

from __future__ import annotations

from mapreduceframework_cpp_spark.operators.graph import _UNIT, pagerank


def _expected_ranks(edges, nodes, damping=0.85, iters=10):
    """Reference implementation of the SAME integer arithmetic."""
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {n: _UNIT for n in nodes}
    base = int((1.0 - damping) * _UNIT)
    for _ in range(iters):
        inbox = {n: 0 for n in nodes}
        for s, d in edges:
            inbox[d] += ranks[s] // out[s]
        ranks = {n: base + int(damping * inbox[n]) for n in nodes}
    return {n: round(r / _UNIT, 9) for n, r in ranks.items()}


EDGES = [(1, 2), (2, 1), (3, 2), (3, 4), (4, 2)]
NODES = [1, 2, 3, 4]


def test_pagerank_matches_reference_arithmetic(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(edges, max_iter=10).collect()}
    assert got == _expected_ranks(EDGES, NODES)
    # the 1<->2 cycle holds nearly all mass; node 3 (no in-links) gets
    # exactly the base teleport share
    assert got[3] == 0.15
    assert min(got[1], got[2]) > max(got[3], got[4])


def test_pagerank_partition_invariant(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    ref = sorted(map(tuple, pagerank(edges, max_iter=6).collect()))
    for n in (1, 7):
        got = sorted(map(tuple, pagerank(edges.repartition(n), max_iter=6).collect()))
        assert got == ref, f"{n} partitions changed ranks"


def test_pagerank_mass_bounded(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    ranks = [r.rank for r in pagerank(edges, max_iter=10).collect()]
    # total mass never exceeds n_nodes; rounding/dangling only loses mass
    assert 0 < sum(ranks) <= len(NODES)
