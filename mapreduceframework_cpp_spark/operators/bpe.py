"""Distributed BPE merge learning (tokenizer vocabulary induction).

The byte-pair-encoding loop every tokenizer-training pipeline runs:
count adjacent symbol pairs across the corpus, merge the most frequent
pair everywhere, repeat. Kernel-wise each round is one R6/R8
shuffle+reduce (pair counts) plus a map (the merge) — the same
iterative shape as :func:`operators.graph.pagerank`, with the corpus
``localCheckpoint``ed per round so no round replays its predecessors.

Determinism: the winning pair orders by (count DESC, left, right) — a
total order, so every round's choice is unique on any partitioning;
the merge itself is a per-document sequential fold (JVM higher-order
``aggregate``), deterministic by construction. At 100 TB the pair
count shuffle carries (pair, partial count) — vocabulary-sized, not
corpus-sized — and the merge is embarrassingly parallel; the one
intentionally tiny piece is the 1-row winning pair broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _pair_counts(docs: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol arrays. Single-symbol
    documents contribute no pairs and are filtered first — without the
    guard ``sequence(0, size - 2)`` on size=1 becomes sequence(0, -1),
    which Spark materializes DESCENDING as [0, -1] and the ANSI
    ``syms[i + 1]`` lookup throws INVALID_ARRAY_INDEX (r6
    degenerate-corpus sweep: one empty document killed the whole merge
    round)."""
    pairs = docs.filter(F.size("syms") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(syms) - 2), "
                "i -> struct(syms[i] AS a, syms[i + 1] AS b))"
            )
        ).alias("p")
    )
    return pairs.groupBy("p.a", "p.b").agg(F.count(F.lit(1)).alias("cnt"))


def _merge_pair(docs: DataFrame) -> DataFrame:
    """Replace every non-overlapping (a, b) occurrence (leftmost-first,
    classic BPE scan order) with the fused symbol a||' '||b. The fold
    carries (output-so-far, pending-symbol): a pending `a` fuses when
    `b` arrives, else flushes."""
    step = (
        "aggregate(syms, "
        "  struct(CAST(array() AS ARRAY<STRING>) AS out, "
        "         CAST(NULL AS STRING) AS pend), "
        "  (st, t) -> CASE "
        "    WHEN st.pend IS NOT NULL AND st.pend = a AND t = b "
        "      THEN struct(array_append(st.out, concat(a, ' ', b)) AS out, "
        "                  CAST(NULL AS STRING) AS pend) "
        "    WHEN t = a "
        "      THEN struct(CASE WHEN st.pend IS NULL THEN st.out "
        "                       ELSE array_append(st.out, st.pend) END AS out, "
        "                  t AS pend) "
        "    ELSE struct(array_append("
        "                  CASE WHEN st.pend IS NULL THEN st.out "
        "                       ELSE array_append(st.out, st.pend) END, "
        "                  t) AS out, "
        "                CAST(NULL AS STRING) AS pend) END, "
        "  st -> CASE WHEN st.pend IS NULL THEN st.out "
        "             ELSE array_append(st.out, st.pend) END)"
    )
    return docs.select(
        "doc_id", F.expr(step).alias("syms"), "a", "b"
    ).select("doc_id", "syms")


def encode_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a pretrained, ordered BPE merge table to the corpus — the
    *inference* side of :func:`learn_bpe_merges` (train once on a
    sample, encode 100 TB with the frozen table). Returns
    (doc_id, syms) where ``syms`` is the encoded symbol array.

    Each merge round is the same leftmost-first non-overlapping
    sequential fold as training (JVM ``aggregate``, no Python), with
    the pair attached as literals — a pure map pass per merge, zero
    shuffles, embarrassingly parallel. Later merges may reference
    symbols fused by earlier ones (cascades), exactly like a real
    tokenizer's ordered merge list."""
    from mapreduceframework_cpp_spark.operators.common import spread

    # the merge folds are compute-bound per doc: fan the narrow scan to
    # full parallelism first (a small file otherwise arrives as one
    # byte-provisioned task and serializes every merge round)
    state = spread(
        docs.select("doc_id", F.split(F.lower(text_col), " ").alias("syms"))
    )
    for a, b in merges:
        state = _merge_pair(
            state.withColumn("a", F.lit(a)).withColumn("b", F.lit(b))
        )
    return state


def learn_bpe_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 5
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over whitespace-pretokenized text;
    returns (merge_round, left, right, pair_count) — the ordered merge
    table a tokenizer would persist. Symbols start as words; each round
    fuses the globally most frequent adjacent pair."""
    from functools import reduce

    from mapreduceframework_cpp_spark.operators.common import spread

    # every round's pair explosion + merge fold inherits this frame's
    # partitioning: spread once so all rounds run full-width instead of
    # on the single byte-provisioned scan task
    state = spread(
        docs.select("doc_id", F.split(F.lower(text_col), " ").alias("syms"))
    ).localCheckpoint()

    tops = []
    for rnd in range(1, n_merges + 1):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint()  # pin the round's winner; breaks lineage
        )
        tops.append(
            top.select(
                F.lit(rnd).cast("long").alias("merge_round"),
                F.col("a").alias("left"),
                F.col("b").alias("right"),
                F.col("cnt").alias("pair_count"),
            )
        )
        # the final round's merged state has no consumer — the output
        # is only the merge table — so skip its fold + materialization
        # (one full corpus pass saved per call)
        if rnd < n_merges:
            state = _merge_pair(
                state.crossJoin(F.broadcast(top))
            ).localCheckpoint()
    # the merge table assembles as a union of the per-round 1-row
    # frames — nothing is ever materialized on the driver
    return reduce(lambda a, b: a.unionAll(b), tops)
