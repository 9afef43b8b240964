"""Iterative graph algorithms beyond connected components
(operators/dedup.dedup_clusters): PageRank by power iteration, used to
rank documents inside near-dup neighborhoods (a high-rank doc is the
"hub" copy others derive from — a useful canonical-selection signal
besides min-id).

Determinism discipline: ranks are EXACT integers ("nano-rank" units,
1e9 per node). Per-edge contributions use integer division, the
per-node aggregation sums exact longs (order-independent), and the only
float op per iteration is one double multiply + floor on an exact
integer — so results are bit-identical on any partitioning, any
cluster. Same ``localCheckpoint`` lineage-truncation pattern as
``dedup_clusters``: executor-side materialization per round, scalars
never hit the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: one rank unit = 1e9 nano-ranks
_UNIT = 1_000_000_000


def pagerank(
    edges: DataFrame, damping: float = 0.85, max_iter: int = 10,
    raw_units: bool = False, broadcast_ranks: bool | None = None,
) -> DataFrame:
    """PageRank over directed (src, dst) edges; returns (node, rank)
    with rank in units of 1.0-per-node (sum ≈ n_nodes minus the mass
    dangling/rounding drops — the standard simplification).

    ``raw_units=True`` returns the exact integer nano-rank ``rank_q``
    instead of the rounded double — the cross-engine-hashable form
    (no float ever leaves the plan).

    Each iteration is one join + one partial-aggregated group-by over
    (dst, contribution) pairs — R6/R8 kernel shapes; cost per round is
    O(|edges|) shuffled on node keys."""
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # degree-annotated edge list is loop-invariant: materialize once,
    # and derive EVERYTHING the loop touches from the checkpoint —
    # a node frame built on the raw edges would re-run the upstream
    # pipeline (e.g. MinHash-LSH) once per iteration
    edges_deg = edges.join(out_deg, "src").localCheckpoint()
    # size the LOOP frames to the materialized graph, not the session
    # default: every iteration inherits this partitioning, and a small
    # graph paying 32 tasks × rounds of scheduling costs more than the
    # work (measured ~20% of wall at test SF). The count is a scalar
    # probe on the already-materialized checkpoint (no recompute); the
    # re-checkpoint exchanges only the small edge frame, once.
    n_edges = edges_deg.count()
    sc = edges_deg.sparkSession.sparkContext
    loop_parts = max(1, min(sc.defaultParallelism, (n_edges // 50_000) + 1))
    if loop_parts != edges_deg.rdd.getNumPartitions():
        edges_deg = edges_deg.repartition(loop_parts, "src").localCheckpoint()
    nodes = (
        edges_deg.select("src")
        .union(edges_deg.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("node"))
        .repartition(loop_parts, "node")
        .localCheckpoint()
    )

    # Rank-frame broadcast: the per-round join's big side is the
    # checkpointed edge list; the rank frame is |nodes| rows of
    # (key, long). Below ~1M nodes (~tens of MB) shipping ranks to every
    # executor removes the ONLY per-round exchange of the edge frame —
    # each iteration is then: local scan of checkpointed edges →
    # map-side partial sum → exchange of already-aggregated (dst, in_q)
    # pairs (≤ |nodes| rows per partition). Billion-node graphs fall
    # back to the co-partitioned shuffle join automatically. The auto
    # mode is ALSO driver-heap-gated: an explicit broadcast hint
    # bypasses autoBroadcastJoinThreshold, and on a starved driver the
    # build cannot reserve memory while loop tasks hold the unified
    # pool — Spark aborts rather than spills (spill-probe receipt).
    # Undersized JVMs take the shuffle join, which degrades by
    # spilling instead of dying.
    if broadcast_ranks is None:
        from mapreduceframework_cpp_spark.operators.common import (
            driver_max_heap_bytes,
        )

        broadcast_ranks = (
            nodes.count() <= 1_000_000
            and driver_max_heap_bytes(edges.sparkSession) >= (4 << 30)
        )
    bcast = broadcast_ranks

    base = int((1.0 - damping) * _UNIT)
    ranks = nodes.withColumn("rank_q", F.lit(_UNIT).cast("long")).localCheckpoint()
    for it in range(max_iter):
        contribs = (
            edges_deg.join(
                F.broadcast(ranks) if bcast else ranks,
                edges_deg.src == ranks.node,
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_q div deg").alias("c"),  # exact integer division
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_q"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.floor(damping * F.coalesce("in_q", F.lit(0)))
            ).cast("long").alias("rank_q"),
        )
        # truncate lineage every OTHER round (and on the last): a
        # 2-round join+agg chain is trivially plannable, and halving
        # the eager materializations halves the per-round job-
        # scheduling overhead that dominates small-graph wall time.
        if it % 2 == 1 or it == max_iter - 1:
            ranks = ranks.localCheckpoint()
    if raw_units:
        return ranks.select("node", "rank_q")
    return ranks.select("node", F.round(F.col("rank_q") / _UNIT, 9).alias("rank"))
