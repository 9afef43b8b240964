"""Binned interval join (SURVEY.md §2.2-C): interval-overlap joins with
NO equi key — the case where Catalyst has nothing to hash on and falls
back to BroadcastNestedLoopJoin (one side must fit in memory, probe cost
|L|·|R|): unusable when both sides are large.

The standard scale fix is to MANUFACTURE the equi key: quantize time
into fixed-width bins, emit each interval once per bin it overlaps,
emit each point into its single bin, then equi-join on the bin and
re-check the exact predicate. Shuffle cost becomes O(|L|·bins_per_interval
+ |R|), and the join is an ordinary shuffled hash/sort-merge join that
AQE can skew-split — the same trick as LSH banding (operators/dedup):
trade a bounded fan-out for hashability.

No dedup pass is needed for point probes: a point lands in exactly one
bin, so each (interval, point) pair meets at most once.

Kernel lowering: R4 multi-emit (interval → bins) + R6 shuffle on bin +
R8 filter — expressible on the reference's kernel too; what Spark adds
is choosing hash-join physical plans and AQE on top
(``MapReduceFramework.cpp:79-149``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def binned_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start: Column,
    end: Column,
    point: Column,
    bin_seconds: int,
) -> DataFrame:
    """Rows of ``intervals`` × ``points`` where ``start <= point < end``
    (timestamp columns), joined via time bins of ``bin_seconds``.

    ``bin_seconds`` should be ≥ the typical interval length: fan-out per
    interval is ``len/bin + 1`` bins. Column args are expressions over
    the respective inputs, so callers can bin on any timestamp shape.
    """
    s_sec = start.cast("timestamp").cast("double")
    e_sec = end.cast("timestamp").cast("double")
    p_sec = point.cast("timestamp").cast("double")
    li = intervals.withColumn("_s", s_sec).withColumn("_e", e_sec)
    li = li.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col("_s") / bin_seconds),
                F.floor(F.col("_e") / bin_seconds),
            )
        ),
    )
    pt = points.withColumn("_p", p_sec).withColumn(
        "_bin", F.floor(F.col("_p") / bin_seconds)
    )
    return (
        li.join(pt, "_bin")
        .filter((F.col("_p") >= F.col("_s")) & (F.col("_p") < F.col("_e")))
        .drop("_bin", "_s", "_e", "_p")
    )
