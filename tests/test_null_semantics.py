"""Null / tie-break edge semantics flagged in round-2 review: cases the
sf-data oracle diff can't exercise because the generated tables contain
no NULLs and no prefix-tied mode values."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_windowed_count_distinct_ignores_nulls(spark):
    from mapreduceframework_cpp_spark.queries.windows import (
        with_windowed_count_distinct,
    )

    df = spark.createDataFrame(
        [
            (1, 10, "a"), (2, 10, None), (3, 10, "b"), (4, 10, "a"),
            (5, 11, None),          # all-null partition → 0
            (6, 12, "x"),           # no-null partition → 1
        ],
        "event_id long, user_id long, event_type string",
    )
    out = {
        r.user_id: r.n
        for r in with_windowed_count_distinct(df, "user_id", "event_type", "n")
        .select("user_id", "n")
        .distinct()
        .collect()
    }
    assert out == {10: 2, 11: 0, 12: 1}


def test_mode_tiebreak_prefers_shorter_prefix_on_tie(spark):
    """(cnt DESC, value ASC) with tied counts where one value is a strict
    prefix of the other: 'A' < 'AB' lexicographically, so 'A' must win —
    the min_by-over-struct(-cnt, value) form q_agg_mode relies on."""
    counts = spark.createDataFrame(
        [("s", "AB", 5), ("s", "A", 5), ("s", "Z", 3)],
        "g string, v string, cnt long",
    )
    key = F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("v"))
    row = counts.groupBy("g").agg(
        F.min_by("v", key).alias("mode_v"), F.min_by("cnt", key).alias("n")
    ).collect()[0]
    assert (row.mode_v, row.n) == ("A", 5)
