"""Streaming-mode smoke + batch/stream parity (SURVEY.md §5.2 item 5).

Each §2.2-I window query run as a real Structured Streaming job
(readStream + availableNow) must produce exactly the batch rows. Plus
watermark, foreachBatch, and dropDuplicatesWithinWatermark smoke.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduceframework_cpp_spark.queries.streaming_windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from mapreduceframework_cpp_spark.sources.tables import tbl
from mapreduceframework_cpp_spark.streaming import events_stream, run_to_memory


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


@pytest.mark.parametrize(
    "fn", [tumbling_counts, sliding_counts, session_counts], ids=lambda f: f.__name__
)
def test_batch_stream_parity(spark, sf_dir, fn):
    batch = fn(tbl(spark, sf_dir, "events"))
    stream = fn(events_stream(spark, sf_dir))
    got = run_to_memory(stream, f"parity_{fn.__name__}", output_mode="complete")
    assert _rows(got) == _rows(batch)


def test_stream_stream_join_parity(spark, sf_dir):
    """Watermarked stream-stream range join over a real stream must
    reproduce the batch range join (availableNow processes the backlog
    in one batch, so no rows are watermark-dropped)."""
    from mapreduceframework_cpp_spark.streaming.joins import (
        click_purchase_attribution,
    )

    batch = click_purchase_attribution(tbl(spark, sf_dir, "events"))
    stream = click_purchase_attribution(events_stream(spark, sf_dir))
    got = run_to_memory(stream, "parity_ss_join", output_mode="append")
    assert got.count() > 0
    assert _rows(got) == _rows(batch)


def test_stream_static_join_parity(spark, sf_dir):
    """q_stream_enrich's transformation over a real stream (static dim
    joined per micro-batch) must equal its batch form."""
    from mapreduceframework_cpp_spark.queries.streaming_windows import (
        enriched_counts,
    )

    customer = tbl(spark, sf_dir, "customer")
    batch = enriched_counts(tbl(spark, sf_dir, "events"), customer)
    stream = enriched_counts(events_stream(spark, sf_dir), customer)
    got = run_to_memory(stream, "parity_enrich", output_mode="complete")
    assert _rows(got) == _rows(batch)


def test_watermark_append_finalized_windows_match_batch(spark, sf_dir):
    """Watermarked tumbling agg in append mode: every FINALIZED window
    it emits must carry exactly the batch-computed count (append may
    withhold the tail windows still inside the watermark, but it must
    never emit a partial count — the correctness property late-data
    handling rests on; upgraded from a count()>0 smoke in r6)."""
    # watermarks require TIMESTAMP (not NTZ); session tz is pinned UTC so
    # the cast is value-preserving
    sdf = (
        events_stream(spark, sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("win_start"), "event_type", "n")
    )
    out = run_to_memory(sdf, "wm_smoke", output_mode="append")
    emitted = {(r.win_start, r.event_type): r.n for r in out.collect()}
    assert emitted

    batch = {
        (r.win_start, r.event_type): r.n
        for r in (
            tbl(spark, sf_dir, "events")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("window.start").alias("win_start"), "event_type", "n"
            )
            .collect()
        )
    }
    for key, n in emitted.items():
        assert batch.get(key) == n, (key, n, batch.get(key))
    # the withheld tail is bounded: everything except the windows still
    # inside the 10-minute watermark at end-of-stream must have emitted
    assert len(emitted) >= len(batch) - 2 * out.select(
        "event_type"
    ).distinct().count()


def test_foreach_batch_sink(spark, sf_dir):
    seen: list[int] = []
    q = (
        events_stream(spark, sf_dir)
        .writeStream.foreachBatch(lambda bdf, _id: seen.append(bdf.count()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(seen) == tbl(spark, sf_dir, "events").count()


def test_drop_duplicates_within_watermark(spark, sf_dir):
    sdf = (
        events_stream(spark, sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    out = run_to_memory(sdf, "dedup_smoke", output_mode="append")
    exact = (
        tbl(spark, sf_dir, "events").select("user_id", "event_type").distinct().count()
    )
    # stateful dedup within watermark can only over-retain across state
    # expiry, never under-count distinct pairs present in one batch
    assert out.count() >= exact
    assert out.select("user_id", "event_type").distinct().count() == exact


def test_stream_stream_interval_join(spark, sf_dir):
    """Stream-stream inner join with watermarks on both sides must match
    the batch interval join (q_join_interval) row-for-row-count when run
    availableNow."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.queries.joins import q_join_interval
    from mapreduceframework_cpp_spark.streaming.stream import (
        events_stream,
        run_to_memory,
    )

    s = events_stream(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    p = (
        s.filter("event_type = 'purchase'")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    e = (
        s.filter("event_type = 'error'")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "2 hours")
    )
    joined = p.join(
        e,
        F.expr(
            "p_user = e_user AND e_ts > p_ts AND e_ts <= p_ts + INTERVAL 1 HOUR"
        ),
    )
    got = run_to_memory(joined, "ss_interval_join").count()
    want = q_join_interval(spark, sf_dir).count()
    assert got == want > 0


def test_stream_stream_outer_join_withheld_tail(spark, sf_dir):
    """LEFT-OUTER stream-stream join semantics over a real stream:
    matched rows reproduce the batch outer join exactly; NULL-side
    (unmatched) rows are a SUBSET of the batch's — Spark only emits a
    miss once the watermark passes its window, so unmatched purchases
    younger than max(ts) − 1h are withheld in a finite availableNow
    run. Asserting subset + exact-match parity pins both halves of the
    contract."""
    from mapreduceframework_cpp_spark.streaming.joins import (
        attribution_with_misses,
    )
    from mapreduceframework_cpp_spark.streaming.stream import (
        events_stream,
        run_to_memory,
    )

    batch = attribution_with_misses(tbl(spark, sf_dir, "events"))
    stream = attribution_with_misses(events_stream(spark, sf_dir))
    got = run_to_memory(stream, "parity_ss_outer", output_mode="append")

    def split(df):
        rows = _rows(df)
        matched = [r for r in rows if r[-2] is not None]
        missed = [r for r in rows if r[-2] is None]
        return matched, missed

    b_matched, b_missed = split(batch)
    s_matched, s_missed = split(got)
    assert s_matched == b_matched
    assert set(s_missed) <= set(b_missed)
    assert len(b_missed) > 0  # the dataset genuinely has unattributed buys
