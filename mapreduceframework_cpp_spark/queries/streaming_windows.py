"""Stream-window queries (SURVEY.md §2.2-I), batch-first.

Each transformation is a plain function of an events DataFrame — applied
to ``tbl()`` for the oracle-checked batch queries below, and to
``events_stream()`` for streaming-mode parity tests (Spark's unified
semantics make the two identical; tests assert it).

Kernel lowering: a time window is a group-by on a derived key (R6+R8);
sessionization is the ordered per-key fold (R8) the reference hands to
``reduce`` as a whole group.

Float discipline: sums through DECIMAL (see aggregations module).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl
from mapreduceframework_cpp_spark.streaming.tws import (
    SESSION_DELAY_MS,
    SESSION_GAP_MS,
)


def tumbling_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows: count + sum(value) per event_type."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event in 4 windows)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


def session_counts(events: DataFrame) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap.
    Session end = last event + gap (Spark's session_window contract)."""
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def enriched_counts(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static enrichment: each event joined to the static
    customer dimension (broadcast — the canonical stream-static join:
    the dim never shuffles and the stream side needs no state), then
    per-(segment, type) counts + decimal-exact value sums."""
    dim = F.broadcast(
        customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return (
        events.join(dim, "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@query(
    "q_stream_enrich",
    oracle="""
    SELECT c_mktsegment, event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY 1, 2
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (batch form; parity with the readStream form
    asserted in tests/test_streaming.py): enrich the event stream with
    the customer dimension, aggregate per (segment, event type). In
    Structured Streaming the static side is re-broadcast per
    micro-batch, so dimension updates are picked up without restarting
    the query — the standard streaming-enrichment shape."""
    return enriched_counts(
        tbl(spark, sf_dir, "events"), tbl(spark, sf_dir, "customer")
    )


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts, p.value
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join, batch form (click → purchase attribution
    within 1h; streaming parity asserted in tests/test_streaming.py —
    watermarks bound both sides' state to the hour of relevance, so
    the continuous job holds O(rate × window) state, not the stream)."""
    from mapreduceframework_cpp_spark.streaming.joins import (
        click_purchase_attribution,
    )

    return click_purchase_attribution(tbl(spark, sf_dir, "events"))


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS win_end,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(tbl(spark, sf_dir, "events"))


@query(
    "q_stream_sliding",
    oracle="""
    SELECT win_start,
           win_start + INTERVAL 1 HOUR AS win_end,
           event_type,
           count(*) AS n_events
    FROM (
      SELECT time_bucket(INTERVAL '15 minutes', ts)
               - (k * INTERVAL '15 minutes') AS win_start,
             event_type
      FROM events, unnest([0, 1, 2, 3]) AS t(k)
    )
    GROUP BY 1, 2, 3
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle expands the 4 overlapping windows per event explicitly
    (slide 15m into a 1h window ⇒ every event belongs to exactly 4)."""
    return sliding_counts(tbl(spark, sf_dir, "events"))


@query(
    "q_stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM flagged
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows vs a gaps-and-islands oracle ((user_id, ts) is
    unique in the data, so the island ordering is deterministic)."""
    return session_counts(tbl(spark, sf_dir, "events"))


@query(
    "q_ts_gapfill",
    oracle="""
    WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS t0,
                      date_trunc('hour', max(ts)) AS t1
               FROM events GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour
             FROM b),
    h AS (SELECT user_id, date_trunc('hour', ts) AS hour,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1, 2)
    SELECT g.user_id, g.hour, COALESCE(h.n_events, 0) AS n_events
    FROM grid g LEFT JOIN h USING (user_id, hour)
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per user (the hypertable/resample
    pattern): a dense hour grid from each user's min to max event hour —
    generated executor-side via sequence+explode, never on the driver —
    left-joined with actual hourly counts, empty hours as zeros.

    Scale: the grid is O(users x hours), generated where it is consumed;
    the join keys on (user_id, hour), and AQE handles users with short
    spans. Counts only — a float sum over sub-handful groups would hash
    on partial-order-dependent double addition."""
    ev = tbl(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("hour"),
    )
    hourly = (
        ev.select("user_id", hour.alias("hour"))
        .groupBy("user_id", "hour")
        .agg(F.count("*").alias("n_events"))
    )
    return grid.join(hourly, ["user_id", "hour"], "left").na.fill({"n_events": 0})


@query(
    "q_stream_stateful",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful streaming (applyInPandasWithState, the
    streaming analog of the reference's reduce-with-context,
    ``MapReduceClient.h:61-64``): per-user running totals maintained in
    keyed executor state across micro-batches. Each batch emits the
    updated row (update mode), so the FINAL state per user is the max
    of its emissions — which must equal a plain batch groupBy count,
    and that is the oracle. Counts only: the float running total is
    emitted but not oracle-checked (micro-batch addition order is not
    part of the contract)."""
    from mapreduceframework_cpp_spark.streaming.stateful import (
        running_user_totals,
    )
    from mapreduceframework_cpp_spark.streaming.stream import (
        events_stream,
        run_to_memory,
    )

    emissions = run_to_memory(
        running_user_totals(events_stream(spark, sf_dir)),
        name="q_stream_stateful_sink",
        output_mode="update",
    )
    return emissions.groupBy("user_id").agg(
        F.max("n_events").alias("n_events")
    )


@query(
    "q_stream_tws",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY 1
    """,
)
def q_stream_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithState (Spark 4's TYPED stateful streaming — the
    successor surface to q_stream_stateful's applyInPandasWithState):
    per-user event count in a ValueState plus a per-event-type count
    MapState, maintained across micro-batches by the engine's state
    store. Update-mode emissions are monotone counters, so the final
    value per key is the max over emissions, which must equal the
    batch groupBy — the oracle.

    Registered in r9 once streaming/pb_bridge.py made the state-server
    protocol's google.protobuf import work in this container (see
    streaming/tws.py). TWS requires a column-family-capable state
    store; the RocksDB provider conf is scoped to this query and
    restored after."""
    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )
    from mapreduceframework_cpp_spark.streaming.stream import (
        events_stream,
        run_to_memory,
    )
    from mapreduceframework_cpp_spark.streaming.tws import (
        user_activity_profile,
    )

    install_protobuf_bridge(spark)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        emissions = run_to_memory(
            user_activity_profile(events_stream(spark, sf_dir)),
            name="q_stream_tws_sink",
            output_mode="update",
        )
    finally:
        spark.conf.set(key, prev)
    return emissions.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("n_types").alias("n_types"),
    )


@query(
    "q_stream_tws_sessions",
    # gap/delay literals interpolated from streaming/tws.py so the
    # engine constants and the oracle can never desynchronize
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // 1000 AS ms FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    fired AS (
      SELECT user_id FROM e
      GROUP BY user_id
      HAVING max(ms) + {SESSION_GAP_MS}
             <= (SELECT max(ms) FROM e) - {SESSION_DELAY_MS}
    ),
    o AS (
      SELECT e.user_id, ms,
             CASE WHEN ms - lag(ms) OVER w > {SESSION_GAP_MS}
                    OR lag(ms) OVER w IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM e JOIN fired USING (user_id)
      WINDOW w AS (PARTITION BY e.user_id ORDER BY ms)
    ),
    s AS (
      -- RANGE (peers-inclusive) frame, not ROWS: under duplicate
      -- (user_id, ms) rows the two ORDER BY ms sorts here and in o
      -- are free to order ties differently, and a ROWS frame could
      -- then place a tied-minimum row before its brk=1 peer,
      -- splitting one session in two (ADVICE r9). RANGE gives every
      -- tied row the same running sum, matching the engine, which
      -- gap-splits on the ms VALUES and so always keeps ties together.
      SELECT user_id, ms,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                            RANGE UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, CAST(min(ms) AS BIGINT) AS s_start,
           CAST(max(ms) AS BIGINT) AS s_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q_stream_tws_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization with EVENT-TIME TIMERS + ListState
    (transformWithState's remaining state primitives after
    q_stream_tws's ValueState/MapState): per-user event times buffer in
    a ListState; one timer per user re-registers at last_event + 30 min;
    when the watermark (max event time − 10 min, floor-ms — semantics
    probed and pinned in streaming/tws.SessionAssembler) passes the
    expiry, the buffer is gap-split and every closed session emits.

    Deterministic by construction under availableNow: the single-file
    source runs as one data batch (watermark 0, nothing fires early,
    nothing is late), then the trailing batch fires exactly the users
    whose last event is ≥ gap+delay before the stream max — so the
    result equals batch gap-sessionization restricted to those users,
    which is the oracle (same integer floor-ms arithmetic on both
    sides; fire condition expiry <= watermark is INCLUSIVE, probed).
    Multi-batch incremental behavior is pinned separately in
    tests/test_tws.py on a hand-built two-file stream."""
    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )
    from mapreduceframework_cpp_spark.streaming.stream import (
        events_stream,
        run_to_memory,
    )
    from mapreduceframework_cpp_spark.streaming.tws import (
        session_assembler,
    )

    install_protobuf_bridge(spark)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        return run_to_memory(
            session_assembler(events_stream(spark, sf_dir)),
            name="q_stream_tws_sessions_sink",
            output_mode="append",
        )
    finally:
        spark.conf.set(key, prev)


@query(
    "q_stream_attrib_coverage",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           CAST(p.value AS DOUBLE) AS value,
           CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h,
           min(c.ts) AS first_click_ts
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    GROUP BY 1, 2, 3
    """,
)
def q_stream_attrib_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution coverage, batch form of the LEFT-OUTER stream-stream
    join (streaming/joins.attribution_with_misses; watermark-bounded
    outer semantics smoke-tested in tests/test_streaming.py): EVERY
    purchase with its preceding-hour click count and earliest click —
    NULLs for the unattributed ones an inner join would hide. One
    user-keyed shuffle for the outer range join, then a purchase-keyed
    re-aggregate; at ingest scale the streaming twin holds only the
    hour of per-user state the watermark allows."""
    from mapreduceframework_cpp_spark.streaming.joins import (
        attribution_with_misses,
    )

    rows = attribution_with_misses(tbl(spark, sf_dir, "events"))
    return rows.groupBy(
        F.col("purchase_id"),
        F.col("purchase_ts"),
        F.col("value").cast("double").alias("value"),
    ).agg(
        F.count("click_id").alias("n_clicks_1h"),
        F.min("click_ts").alias("first_click_ts"),
    )
