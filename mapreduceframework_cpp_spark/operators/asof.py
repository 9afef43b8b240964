"""As-of join — the one §2.2-C operator Spark lacks natively.

Kernel lowering: shuffle on the join key (R6, ``MapReduceFramework.cpp:
100-133``) + per-group time-ordered fold (R8, ``:135-149`` — reduce
receives the whole group ordered, exactly what the window scan does).

Implementation: union-tag + window ``last(ignorenulls)`` — fully
declarative, one shuffle, no UDF:

1. Tag left rows side=1, right rows side=0; union on (keys, ts, side,
   right-payload-struct).
2. Window per key ordered by (ts, side): ``last(payload, ignorenulls)``
   over ``rowsBetween(unboundedPreceding, currentRow)`` carries the most
   recent right payload forward onto each left row.
3. Keep side=1 rows; unpack the payload.

At equal timestamps the right row sorts first (side 0 < 1), giving
inclusive ("backward", ``ts_left >= ts_right``) semantics — matching
DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` and pandas ``merge_asof``.
``allow_exact_matches=False`` flips the tag order for strict inequality.

Scale: one hash exchange on the key columns + one in-task sorted window
scan — the same cost profile as a distributed merge-asof. Skewed keys are
the usual window-function caveat (one task per hot key); salt by time
bucket if a single key's history exceeds a task.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (or ``<`` if not ``allow_exact_matches``)
    within the same ``on`` key group. Left rows with no prior right row
    get nulls (left-join semantics).

    ``right_cols`` are the right columns to carry over, emitted as
    ``f"{col}{suffix}"``.

    ``tolerance_seconds`` bounds staleness like pandas ``merge_asof``'s
    ``tolerance``: a prior right row older than the bound is treated as
    no match (nulls). Implemented as a post-window null-out on the
    carried right timestamp — same single-shuffle plan.
    """
    left_side, right_side = (1, 0) if allow_exact_matches else (0, 1)
    lcols = left.columns

    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(left_side)
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
        ).alias("_rpay"),
    ).withColumn("_side", F.lit(right_side))

    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))

    if tolerance_seconds is not None:
        stale = (
            F.col("_ts").cast("timestamp").cast("double")
            - F.col("_match._rts").cast("timestamp").cast("double")
        ) > float(tolerance_seconds)
        matched = matched.withColumn(
            "_match", F.when(stale, F.lit(None)).otherwise(F.col("_match"))
        )

    return matched.filter(F.col("_side") == left_side).select(
        *lcols,
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
