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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (``direction="backward"``, the default) or
    the earliest right row with ``right.ts >= left.ts``
    (``direction="forward"``) within the same ``on`` key group —
    strict inequalities if not ``allow_exact_matches``. Left rows with
    no matching right row get nulls (left-join semantics).

    ``right_cols`` are the right columns to carry over, emitted as
    ``f"{col}{suffix}"``.

    ``tolerance_seconds`` bounds staleness like pandas ``merge_asof``'s
    ``tolerance``: a match farther than the bound (in the match
    direction) is treated as no match (nulls). Implemented as a
    post-window null-out on the carried right timestamp — same
    single-shuffle plan.

    Side-tag truth table (ties sort by ``_side`` ascending): the right
    row at an equal timestamp must fall INSIDE the window frame exactly
    when ``allow_exact_matches`` — backward frames end at the current
    row, so the right row must sort first (side 0) to be included;
    forward frames start at the current row, so it must sort last.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    backward = direction == "backward"
    if backward:
        left_side, right_side = (1, 0) if allow_exact_matches else (0, 1)
    else:
        left_side, right_side = (0, 1) if allow_exact_matches else (1, 0)
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

    wbase = Window.partitionBy(*on).orderBy(
        F.col("_ts").asc(), F.col("_side").asc()
    )
    if backward:
        w = wbase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = u.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    else:
        w = wbase.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = u.withColumn("_match", F.first("_rpay", ignorenulls=True).over(w))

    if tolerance_seconds is not None:
        l_sec = F.col("_ts").cast("timestamp").cast("double")
        r_sec = F.col("_match._rts").cast("timestamp").cast("double")
        gap = (l_sec - r_sec) if backward else (r_sec - l_sec)
        matched = matched.withColumn(
            "_match",
            F.when(gap > float(tolerance_seconds), F.lit(None)).otherwise(
                F.col("_match")
            ),
        )

    return matched.filter(F.col("_side") == left_side).select(
        *lcols,
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
