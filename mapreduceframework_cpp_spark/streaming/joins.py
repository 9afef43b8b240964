"""Stream-stream joins (SURVEY.md §2.2-I): two live streams joined on a
key plus an event-time range, with watermarks bounding the join state —
the attribution/sessionless-correlation shape (click → purchase within
an hour) that batch range joins (queries/joins.py q_join_interval) do
offline.

Written batch-first like every streaming transformation here: the same
function runs on the batch events table (where the DuckDB oracle
applies) and on ``events_stream`` (where watermarks activate and Spark
keeps only one hour of per-key state per side — bounded memory on an
unbounded stream, which is what makes this viable continuously at
ingest scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def click_purchase_attribution(events: DataFrame) -> DataFrame:
    """Purchases attributed to a same-user click within the preceding
    hour. Streaming mode: both sides watermarked 1h (state eviction
    bound = watermark + join range); batch mode: the identical plan
    minus state. The equi key (user_id) carries the shuffle; the time
    range is a post-join filter, so no cross product ever forms."""
    if events.isStreaming:
        # watermarks require TIMESTAMP (not NTZ); session tz is pinned
        # UTC so the cast is value-preserving
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    # the purchase side renames its key: both branches descend from the
    # same scan, so an unrenamed self-join reference would be ambiguous
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "1 hour")
        purchases = purchases.withWatermark("purchase_ts", "1 hour")
    return purchases.join(
        clicks,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 1 hour")),
    ).select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "value",
    )


def attribution_with_misses(events: DataFrame) -> DataFrame:
    """LEFT-OUTER stream-stream join: every purchase, with its
    preceding-hour same-user clicks or NULLs when none exist — the
    conversion-coverage shape (an inner join silently hides the
    unattributed purchases a marketing team most wants to see).

    Streaming mode: both sides watermarked 1h; Spark emits the NULL
    (unmatched) side of an outer stream-stream join only once the
    watermark passes the row's join window, so a finite availableNow
    run withholds unmatched purchases younger than max(ts) − 1h — the
    documented tail semantics tests/test_streaming.py asserts. Batch
    mode: the identical plan, no state, no withheld tail."""
    if events.isStreaming:
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "1 hour")
        purchases = purchases.withWatermark("purchase_ts", "1 hour")
    return purchases.join(
        clicks,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("interval 1 hour")),
        "left_outer",
    ).select(
        "p_user_id", "purchase_id", "purchase_ts", "value",
        "click_id", "click_ts",
    )
