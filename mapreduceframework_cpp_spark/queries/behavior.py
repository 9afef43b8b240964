"""Event-behavior analytics queries (SURVEY.md §2.2-C/E extensions,
round-2 additions): the session/funnel/retention shapes every
product-event warehouse runs over an append-only event stream, plus the
latest-record-per-key dedup that CDC ingestion needs.

Kernel lowering: all four are R6 shuffle on a user key + R8 ordered
per-group fold (the reduce callback receives the whole sorted group,
``MapReduceClient.h:61-64``) — in Spark they are windows/joins, with the
shuffle key chosen so each query is ONE exchange on `user_id`:

- latest-record dedup   → row_number over (key, ts desc) — one shuffle;
- sessionization        → lag + running sum over the same user window —
  Catalyst reuses a single sort+exchange for both window functions;
- funnel                → successive semi-joins whose right sides only
  shrink (at 100 TB the step outputs are small → AQE broadcasts them);
- retention             → distinct (user, week) then a self-join on the
  per-user cohort week, both partitioned by user_id.

Registered AFTER the round-1 families (see queries/__init__.py): these
must not displace queries queued for driver verification.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


@query(
    "q_win_dedup",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type, event_id, value, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id, value, ts AS latest_ts
    FROM r WHERE rn = 1
    """,
)
def q_win_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key dedup (the CDC/upsert compaction pattern):
    keep each user's most recent event per type, tie-broken by event_id
    so the survivor is deterministic. One shuffle on the composite key;
    at 100 TB this is the standard row_number compaction that AQE
    handles with skew-split if one user dominates."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            "value",
            F.col("ts").alias("latest_ts"),
        )
    )


def _with_session_ids(ev: DataFrame, gap_sec: float = 1800.0) -> DataFrame:
    """Append ``session_idx`` via gaps-and-islands: a silence longer
    than ``gap_sec`` starts a new session. The lag and the running sum
    share ONE sort+exchange on user_id ((ts, event_id) tie-broken so
    assignment is deterministic under duplicate timestamps). Shared by
    q_events_sessionize and q_sessions_stats — one definition of
    'session' for the whole engine."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # TIMESTAMP_NTZ has no direct double cast in Spark 4; route through
    # TIMESTAMP (session tz is pinned UTC, so the instant is unchanged)
    sec = F.col("ts").cast("timestamp").cast("double")
    brk = F.when(
        (sec - F.lag(sec).over(w) > gap_sec) | F.lag(sec).over(w).isNull(), 1
    ).otherwise(0)
    return ev.withColumn("brk", brk).withColumn(
        "session_idx", F.sum("brk").over(w_run).cast("long")
    )



@query(
    "q_events_sessionize",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_idx
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit session IDs via gaps-and-islands: a >30-min silence
    starts a new session; the running sum of boundary flags numbers the
    sessions (shared helper ``_with_session_ids``). Unlike
    ``q_stream_session`` (which aggregates inside Spark's
    session_window), this exposes the session id itself, which
    downstream joins need. Timestamps compare in epoch seconds (micro
    precision on both engines, identical doubles)."""
    ev = tbl(spark, sf_dir, "events")
    return (
        _with_session_ids(ev)
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


@query(
    "q_events_funnel",
    oracle="""
    WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    v AS (SELECT e.user_id, min(e.ts) AS t1
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'view' AND e.ts > s.t0 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'purchase' AND e.ts > v.t1 GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM v) AS n_signup_view,
           (SELECT count(*) FROM p) AS n_signup_view_purchase
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then viewed AFTER the
    signup, then purchased AFTER that view — strict event-order
    semantics, not mere co-occurrence. Each step joins the full stream
    against the (shrinking) survivor set of the previous step; survivor
    sets are tiny relative to a 100 TB stream, so AQE turns the later
    probes into broadcast joins and the stream is scanned per step with
    no stream-side shuffle."""
    ev = tbl(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(v.agg(F.count("*").alias("n_signup_view")))
        .crossJoin(p.agg(F.count("*").alias("n_signup_view_purchase")))
    )


@query(
    "q_events_retention",
    oracle="""
    WITH uw AS (SELECT DISTINCT user_id,
                       CAST(date_trunc('week', ts) AS DATE) AS wk
                FROM events),
    c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id)
    SELECT c.cohort_wk,
           CAST((wk - cohort_wk) / 7 AS BIGINT) AS weeks_since,
           CAST(count(*) AS BIGINT) AS n_users
    FROM uw JOIN c ON uw.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen ISO week; for each
    (cohort, weeks-since) cell, how many cohort members were active.
    Distinct (user, week) first — that collapses the 100 TB stream to
    |users|×|weeks| before any join — then a per-user min and a
    re-join, all partitioned on user_id (one exchange, reused)."""
    ev = tbl(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    c = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        uw.join(c, "user_id")
        .groupBy(
            "cohort_wk",
            (F.datediff("wk", "cohort_wk") / 7).cast("long").alias("weeks_since"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


@query(
    "q_events_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM flagged
    ), r AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rn
      FROM sess
    ), p AS (
      SELECT user_id, sid,
             concat_ws('>',
               max(CASE WHEN rn = 1 THEN event_type END),
               max(CASE WHEN rn = 2 THEN event_type END),
               max(CASE WHEN rn = 3 THEN event_type END)) AS path
      FROM r GROUP BY user_id, sid
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path
    """,
)
def q_events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis: the first three event types of every
    session (30-min gaps-and-islands, same contract as
    q_events_sessionize) folded into a '>'-joined path string, counted
    across sessions — the entry-journey report. The rank-1..3 pivot is
    three conditional MAXes (deterministic: (ts, event_id) orders
    uniquely; concat_ws skips NULLs identically in both engines for
    short sessions). Shuffles: one on user_id for the windows, one on
    the tiny (user, sid) aggregate, one on path counts."""
    ev = tbl(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts")
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # TIMESTAMP_NTZ → epoch seconds via TIMESTAMP (session tz pinned UTC)
    sec = F.col("ts").cast("timestamp").cast("double")
    sess = (
        ev.withColumn(
            "new_sess",
            F.when(sec - F.lag(sec).over(w_lag) <= 1800.0, 0).otherwise(1),
        )
        .withColumn("sid", F.sum("new_sess").over(w_run))
    )
    w_rn = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    r = sess.withColumn("rn", F.row_number().over(w_rn)).filter(F.col("rn") <= 3)
    p = r.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
            F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
        ).alias("path")
    )
    return p.groupBy("path").agg(F.count("*").alias("n_sessions"))


@query(
    "q_events_cooccurrence",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users
    FROM d a JOIN d b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def q_events_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence mining (market-basket shape): for every
    unordered type pair, how many users exhibit both. The DISTINCT
    projection shrinks the input to (user, type) pairs BEFORE the
    self-join, so join fan-out is bounded by types-per-user (small by
    domain), not events-per-user — the aggregate-first discipline that
    keeps basket mining viable on 100 TB of raw events."""
    ev = tbl(spark, sf_dir, "events")
    d = ev.select("user_id", "event_type").distinct()
    a = d.select("user_id", F.col("event_type").alias("type_a"))
    b = d.select(F.col("user_id").alias("uid_b"), F.col("event_type").alias("type_b"))
    return (
        a.join(b, (a.user_id == b.uid_b) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "q_events_markov",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    c AS (SELECT event_type, next_type, count(*) AS n
          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
    SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
           / sum(n) OVER (PARTITION BY event_type) AS p
    FROM c
    """,
)
def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    count and row-normalized probability for every (type → next type)
    edge. One window pass builds the successor pairs (ordered by ts with
    event_id tie-break so duplicate timestamps stay deterministic), then
    the transition counts aggregate to ~|types|² rows — the normalizing
    window runs over that tiny aggregate, never the raw events."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n")
    )
    wt = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt)).alias("p"),
    )


@query(
    "q_events_anomaly",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS n
      FROM events GROUP BY 1),
    s AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mu,
                 sqrt((CAST(sum(n * n) AS DOUBLE)
                       - CAST(sum(n) AS DOUBLE) * sum(n) / count(*))
                      / (count(*) - 1)) AS sd
          FROM daily)
    SELECT day, CAST(n AS BIGINT) AS n_events,
           CAST((n - mu) / sd AS DOUBLE) AS zscore
    FROM daily, s
    """,
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly score: z-score of each day's event count
    against the corpus of days. Counts are exact integers, so the
    mean/stddev come from integer power sums (the queries/stats.py
    float discipline — order-independent, partition-invariant); the
    1-row stats aggregate broadcasts back onto the daily counts, so
    nothing touches the driver."""
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day")
    ).agg(F.count("*").alias("n"))
    s = daily.agg(
        F.sum("n").alias("_sn"),
        F.sum(F.col("n") * F.col("n")).alias("_snn"),
        F.count("*").alias("_cnt"),
    ).select(
        (F.col("_sn").cast("double") / F.col("_cnt")).alias("_mu"),
        F.sqrt(
            (
                F.col("_snn").cast("double")
                - F.col("_sn").cast("double") * F.col("_sn") / F.col("_cnt")
            )
            / (F.col("_cnt") - 1)
        ).alias("_sd"),
    )
    return daily.crossJoin(F.broadcast(s)).select(
        "day",
        F.col("n").alias("n_events"),
        ((F.col("n") - F.col("_mu")) / F.col("_sd"))
        .cast("double")
        .alias("zscore"),
    )


@query(
    "q_events_dau_wau",
    oracle="""
    WITH d AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP)
                        AS day, user_id
               FROM events),
    days AS (SELECT DISTINCT day FROM d),
    wau AS (SELECT a.day, count(DISTINCT b.user_id) AS wau
            FROM days a JOIN d b
              ON b.day > a.day - INTERVAL 7 DAY AND b.day <= a.day
            GROUP BY 1),
    dau AS (SELECT day, count(*) AS dau FROM d GROUP BY 1)
    SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def q_events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the product-
    analytics headline metric. The raw stream first collapses to
    DISTINCT (day, user) pairs (the only heavy shuffle, keyed on the
    pair); WAU then joins the tiny day spine against those pairs with a
    7-day band, so the fan-out is bounded at 7 rows per active
    (day, user) regardless of event volume. A windowed COUNT(DISTINCT)
    can't express this (users repeat across days); the band join is the
    scalable form."""
    ev = tbl(spark, sf_dir, "events")
    d = (
        ev.select(
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
            "user_id",
        )
        .distinct()
    )
    days = d.select("day").distinct()
    b = d.select(F.col("day").alias("bday"), "user_id")
    wau = (
        days.join(
            b,
            (F.col("bday") > F.col("day") - F.expr("INTERVAL 7 DAYS"))
            & (F.col("bday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = d.groupBy("day").agg(F.count("*").alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
    )


@query(
    "q_events_conversion_lag",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY 1),
    p AS (SELECT user_id, min(ts) AS t_buy FROM events
          WHERE event_type = 'purchase' GROUP BY 1),
    j AS (SELECT round(epoch(t_buy) - epoch(t_view), 6) AS lag_sec
          FROM v JOIN p USING (user_id)
          WHERE t_buy >= t_view)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(quantile_cont(lag_sec, 0.5) AS DOUBLE) AS p50_sec,
           CAST(quantile_cont(lag_sec, 0.9) AS DOUBLE) AS p90_sec,
           CAST(max(lag_sec) AS DOUBLE) AS max_sec
    FROM j
    """,
)
def q_events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view → first-purchase conversion latency percentiles: both
    firsts are per-user MIN aggregates over one filtered scan (no
    window, no ordering shuffle), joined on user_id; the latency
    distribution then reduces to exact p50/p90 (linear interpolation —
    the q_agg_percentile cross-engine discipline). Lag seconds compare
    as round(epoch diff, 6) doubles, the established timestamp-delta
    idiom (queries/joins.py interval join)."""
    ev = tbl(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    sec = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
    j = (
        v.join(p, "user_id")
        .filter(F.col("t_buy") >= F.col("t_view"))
        .select(F.round(sec("t_buy") - sec("t_view"), 6).alias("lag_sec"))
    )
    return j.agg(
        F.count("*").alias("n_converted"),
        F.expr("percentile(lag_sec, 0.5)").cast("double").alias("p50_sec"),
        F.expr("percentile(lag_sec, 0.9)").cast("double").alias("p90_sec"),
        F.max("lag_sec").cast("double").alias("max_sec"),
    )


@query(
    "q_sessions_stats",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o
    ),
    sess AS (
      SELECT user_id, session_idx, count(*) AS n_events,
             CAST(round((epoch(max(ts)) - epoch(min(ts))) * 1000000)
                  AS BIGINT) AS dur_us
      FROM s GROUP BY 1, 2
    )
    SELECT least(CAST(n_events AS BIGINT), 10) AS size_bucket,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(dur_us) AS DOUBLE) / 1000000 / count(*) AS avg_dur_sec,
           CAST(max(dur_us) AS DOUBLE) / 1000000 AS max_dur_sec
    FROM sess GROUP BY 1
    """,
)
def q_sessions_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shape report over the gaps-and-islands sessionization:
    sessions bucketed by event count (clamped at 10+), with count and
    average/max duration per bucket — the engagement histogram product
    teams read daily. Composes the q_events_sessionize machinery (same
    ONE user_id exchange) with a per-session rollup and a tiny bucket
    aggregate. Durations quantize to integer microseconds per session
    BEFORE the cross-session sum, so the averages are exact-integer
    ratios (order-independent)."""
    ev = tbl(spark, sf_dir, "events")
    s = _with_session_ids(ev)
    sess = s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.round(
            (
                F.max("ts").cast("timestamp").cast("double")
                - F.min("ts").cast("timestamp").cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("dur_us"),
    )
    return sess.groupBy(
        F.least(F.col("n_events"), F.lit(10)).cast("long").alias("size_bucket")
    ).agg(
        F.count("*").alias("n_sessions"),
        (F.sum("dur_us").cast("double") / 1000000 / F.count("*")).alias(
            "avg_dur_sec"
        ),
        (F.max("dur_us").cast("double") / 1000000).alias("max_dur_sec"),
    )


@query(
    "q_events_funnel_windowed",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type = 'view' THEN ts END
                        IGNORE NULLS) OVER w AS last_view
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    c AS (
      SELECT user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'click'
                              AND last_view IS NOT NULL
                              AND epoch(ts) - epoch(last_view) <= 3600.0
                             THEN ts END IGNORE NULLS) OVER w AS last_qclick
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN last_qclick IS NOT NULL
                          AND epoch(ts) - epoch(last_qclick) <= 3600.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel_complete
    FROM c
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED funnel (the windowFunnel/CEP pattern): purchases
    completing view→click→purchase with each hop ≤1 h. Cascaded
    carry-forward windows — last view, then last click that was itself
    within 1 h of a view — replace per-event subqueries or self-joins;
    two window passes share ONE user_id exchange (vs q_events_funnel,
    which has no time constraint). Hop gaps compare in epoch seconds
    (identical doubles both engines); (ts, event_id) ordering makes the
    carried state deterministic."""
    ev = tbl(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sec = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
    ts_sec = F.col("ts").cast("timestamp").cast("double")
    o = ev.withColumn(
        "last_view",
        F.last(F.when(F.col("event_type") == "view", F.col("ts")), True).over(w),
    )
    c = o.withColumn(
        "last_qclick",
        F.last(
            F.when(
                (F.col("event_type") == "click")
                & F.col("last_view").isNotNull()
                & (ts_sec - sec("last_view") <= 3600.0),
                F.col("ts"),
            ),
            True,
        ).over(w),
    )
    return (
        c.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(
                F.when(
                    F.col("last_qclick").isNotNull()
                    & (ts_sec - sec("last_qclick") <= 3600.0),
                    1,
                ).otherwise(0)
            ).alias("n_funnel_complete"),
        )
    )


@query(
    "q_events_seasonality",
    oracle="""
    WITH h AS (
      SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT hour_of_day, event_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY hour_of_day)
             AS share_of_hour
    FROM h
    """,
)
def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile: event mix per hour with each
    type's share of that hour — the diurnal-pattern report (and the
    input a rate-limiter or capacity planner reads). One aggregate to
    24×|types| rows; the share window runs over that tiny grid. Hour
    extraction is on TIMESTAMP_NTZ, so session timezone cannot shift
    the profile."""
    ev = tbl(spark, sf_dir, "events")
    h = ev.groupBy(
        F.hour("ts").cast("long").alias("hour_of_day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("hour_of_day")
    return h.select(
        "hour_of_day",
        "event_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("share_of_hour"),
    )


@query(
    "q_user_ltv_percentiles",
    oracle="""
    WITH u AS (
      SELECT user_id,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents,
             count(*) AS n_events
      FROM events GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(quantile_cont(CAST(cents AS DOUBLE) / 100, 0.5) AS DOUBLE)
             AS p50_ltv,
           CAST(quantile_cont(CAST(cents AS DOUBLE) / 100, 0.9) AS DOUBLE)
             AS p90_ltv,
           CAST(quantile_cont(CAST(cents AS DOUBLE) / 100, 0.99) AS DOUBLE)
             AS p99_ltv,
           CAST(max(CAST(cents AS DOUBLE) / 100) AS DOUBLE) AS max_ltv
    FROM u
    """,
)
def q_user_ltv_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-of-aggregates: per-user lifetime value first (the
    heavy groupBy), then exact percentiles OVER THE USERS — the
    two-level shape (aggregate, then describe the aggregate) behind
    every LTV/engagement report. Per-user sums quantize value to cents
    BEFORE summing (exact, order-independent); the percentile pass runs
    over one row per user."""
    ev = tbl(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    u = ev.groupBy("user_id").agg(F.sum(cents).alias("cents"))
    ltv = (F.col("cents").cast("double") / 100).alias("ltv")
    return u.select(ltv).agg(
        F.count("*").alias("n_users"),
        F.expr("percentile(ltv, 0.5)").cast("double").alias("p50_ltv"),
        F.expr("percentile(ltv, 0.9)").cast("double").alias("p90_ltv"),
        F.expr("percentile(ltv, 0.99)").cast("double").alias("p99_ltv"),
        F.max("ltv").cast("double").alias("max_ltv"),
    )


@query(
    "q_events_streaks",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
               FROM events),
    r AS (SELECT user_id, day,
                 row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
          FROM d),
    g AS (SELECT user_id, day,
                 day - CAST(rn || ' days' AS INTERVAL) AS grp
          FROM r),
    s AS (SELECT user_id, grp, count(*) AS streak_len
          FROM g GROUP BY 1, 2)
    SELECT user_id,
           CAST(max(streak_len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM s GROUP BY 1
    """,
)
def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the islands
    trick at DAY granularity (day − row_number is constant within a
    consecutive run), distinct from time-gap sessionization. One
    distinct-pairs collapse, one user-partitioned window, two tiny
    aggregates; date arithmetic stays in timestamp-interval space
    (timezone-proof on NTZ)."""
    ev = tbl(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "grp", F.expr("day - make_interval(0, 0, 0, rn)")
    )
    s = g.groupBy("user_id", "grp").agg(F.count("*").alias("streak_len"))
    return s.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )


@query(
    "q_events_power_users",
    oracle="""
    WITH u AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
    t AS (SELECT quantile_cont(CAST(n AS DOUBLE), 0.99) AS thr,
                 sum(n) AS total FROM u)
    SELECT CAST(count(*) AS BIGINT) AS n_power_users,
           CAST(sum(u.n) AS BIGINT) AS power_events,
           CAST(sum(u.n) AS DOUBLE) / CAST(any_value(t.total) AS DOUBLE)
             AS share_of_events
    FROM u, t WHERE CAST(u.n AS DOUBLE) >= t.thr
    """,
)
def q_events_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration: users at or above the p99 event count and
    their share of ALL events — the power-user/abuse-screening report.
    Per-user counts are exact ints; the p99 threshold and the global
    total ride one broadcast 1-row aggregate; the share is a single
    double division of exact integers."""
    ev = tbl(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    t = u.agg(
        F.expr("percentile(CAST(n AS DOUBLE), 0.99)").alias("thr"),
        F.sum("n").alias("total"),
    )
    return (
        u.crossJoin(F.broadcast(t))
        .filter(F.col("n").cast("double") >= F.col("thr"))
        .agg(
            F.count("*").alias("n_power_users"),
            F.sum("n").alias("power_events"),
            (
                F.sum("n").cast("double")
                / F.first("total").cast("double")
            ).alias("share_of_events"),
        )
    )


@query(
    "q_attrib_linear",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    touched AS (
      SELECT p.event_id AS purchase_id, p.value,
             c.event_id AS click_id, c.user_id,
             count(*) OVER (PARTITION BY p.event_id) AS n_touch
      FROM p JOIN c
        ON c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR),
    shares AS (
      SELECT user_id, click_id,
             CAST(round(value * 1000000) AS BIGINT) // n_touch
               AS share_micro
      FROM touched)
    SELECT user_id,
           CAST(count(DISTINCT click_id) AS BIGINT) AS n_credited_clicks,
           CAST(sum(share_micro) AS DOUBLE) / 1000000
             AS attributed_revenue
    FROM shares GROUP BY 1
    """,
)
def q_attrib_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase's value split
    EQUALLY across the user's clicks in the preceding hour, credited
    back to those clicks and rolled up per user — the click-side
    complement of q_stream_attrib_coverage (which reports per purchase
    and keeps the misses). Float discipline: each share is the exact
    int64 micro-cent quotient round(value·1e6) div n_touch (identical
    truncation both engines); shares SUM as integers and divide back
    once, so the per-user totals are bit-identical on any partitioning.
    One user-keyed range join + a purchase-window count + one
    re-aggregate — the same single-shuffle family as the other
    behavior queries."""
    e = tbl(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    touched = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    w_p = Window.partitionBy("purchase_id")
    shares = touched.select(
        "user_id",
        "click_id",
        (
            F.round(F.col("value") * 1000000).cast("long")
            / F.count(F.lit(1)).over(w_p)
        )
        .cast("long")
        .alias("share_micro"),
    )
    return shares.groupBy("user_id").agg(
        F.countDistinct("click_id").alias("n_credited_clicks"),
        (F.sum("share_micro").cast("double") / 1000000).alias(
            "attributed_revenue"
        ),
    )


@query(
    "q_events_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    base AS (
      SELECT day, n,
             CAST(sum(n) OVER () AS BIGINT) AS tot,
             CAST(count(*) OVER () AS BIGINT) AS days
      FROM daily),
    dev AS (
      SELECT day, n, days,
             n * days - tot AS dev_scaled
      FROM base),
    cus AS (
      SELECT day, n, days,
             sum(dev_scaled) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS cusum_scaled
      FROM dev)
    SELECT day, n,
           CAST(cusum_scaled AS DOUBLE) / days AS cusum,
           abs(cusum_scaled) = max(abs(cusum_scaled)) OVER ()
             AS is_changepoint
    FROM cus
    """,
)
def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily event-volume series:
    the running sum of deviations from the global mean peaks (in
    absolute value) at the most likely level-shift day — the classic
    single-changepoint estimator behind pipeline-breakage forensics
    ("which day did volume step?"). Exactness: deviations are scaled
    by the day count so every accumulated term is an exact int64
    (n·days − total), the cusum is an integer window sum, and the one
    division to report scale happens per row on identical operands.
    Aggregate-first: the fact collapses to ~N days before any window;
    the argmax is a window max over the same tiny frame, flagged by
    exact integer comparison."""
    daily = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = Window.partitionBy()
    base = daily.select(
        "day",
        "n",
        F.sum("n").over(w_all).alias("tot"),
        F.count(F.lit(1)).over(w_all).alias("days"),
    )
    dev = base.select(
        "day",
        "n",
        "days",
        (F.col("n") * F.col("days") - F.col("tot")).alias("dev_scaled"),
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cus = dev.select(
        "day",
        "n",
        "days",
        F.sum("dev_scaled").over(w_cum).alias("cusum_scaled"),
    )
    return cus.select(
        "day",
        "n",
        (F.col("cusum_scaled").cast("double") / F.col("days")).alias("cusum"),
        (
            F.abs("cusum_scaled")
            == F.max(F.abs("cusum_scaled")).over(w_all)
        ).alias("is_changepoint"),
    )


@query(
    "q_sessions_concurrency",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS start_ts,
             max(ts) + INTERVAL 30 MINUTE AS end_ts
      FROM events
      GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)),
    pts AS (
      SELECT start_ts AS t, 1 AS delta FROM s
      UNION ALL
      SELECT end_ts AS t, -1 AS delta FROM s),
    sweep AS (
      SELECT t, sum(delta) AS d
      FROM pts GROUP BY t),
    run AS (
      SELECT t, sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
               AS concurrent
      FROM sweep)
    SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day,
           CAST(max(concurrent) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY 1
    """,
)
def q_sessions_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day by sweep line: each (user, day)
    session contributes +1 at its start and −1 at its end (+30 min
    linger), deltas collapse per distinct timestamp, and one running
    sum over the time order IS the concurrency curve — the interval-
    stabbing counter that a naive per-minute × per-session range join
    would compute at thousands of times the cost. Exact integers end
    to end; identical-timestamp starts and ends net BEFORE the running
    sum (grouped sweep), so the curve is deterministic with no
    within-tick ordering assumption. The sweep's global window runs
    over the collapsed timestamp frame (two rows per session) — at
    cluster scale it would range-partition on time."""
    s = (
        tbl(spark, sf_dir, "events")
        .groupBy(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("_d")
        )
        .agg(
            F.min("ts").alias("start_ts"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        )
    )
    pts = s.select(F.col("start_ts").alias("t"), F.lit(1).alias("delta")).unionAll(
        s.select(F.col("end_ts").alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = pts.groupBy("t").agg(F.sum("delta").alias("d"))
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = sweep.select("t", F.sum("d").over(w_run).alias("concurrent"))
    return (
        run.groupBy(
            F.date_trunc("day", "t").cast("timestamp_ntz").alias("day")
        )
        .agg(F.max("concurrent").alias("peak_concurrent"))
    )


@query(
    "q_events_pattern_match",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts, substr(event_type, 1, 1) AS ini,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id, ts, ini,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o
    ),
    sig AS (
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             string_agg(ini, '' ORDER BY ts, event_id) AS sig
      FROM s GROUP BY 1, 2)
    SELECT user_id, session_idx, sig,
           CAST(CASE WHEN regexp_matches(sig, 'cv*p') THEN 1 ELSE 0 END
                AS BIGINT) AS matched
    FROM sig
    """,
)
def q_events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection: each session's
    ordered event stream is collapsed to a signature string (one char
    per event) and the behavioral pattern — a click, any browsing, a
    purchase (``cv*p``) — is a plain REGEX over that string. This is
    the row-pattern-matching capability SQL:2016 added, lowered to
    Spark's existing primitives: the gaps-and-islands session pass
    (shared ``_with_session_ids`` definition), ONE per-session ordered
    fold (array_sort over (ts, event_id) makes the signature
    deterministic under timestamp ties), and a JVM regex per session —
    no per-event state machine, no UDF, linear in events. Arbitrary
    patterns (negation, bounded repetition) are regex features for
    free."""
    ev = tbl(spark, sf_dir, "events").withColumn(
        "ini", F.substring("event_type", 1, 1)
    )
    sig = (
        _with_session_ids(ev)
        .groupBy("user_id", "session_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "ini"))
                    ),
                    lambda s: s["ini"],
                ),
                "",
            ).alias("sig")
        )
    )
    return sig.select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        "sig",
        F.col("sig").rlike("cv*p").cast("long").alias("matched"),
    )


@query(
    "q_events_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    tr AS (
      SELECT event_type AS cur, nxt, count(*) AS n_ij
      FROM seq WHERE nxt IS NOT NULL
      GROUP BY 1, 2),
    marg AS (
      SELECT cur, sum(n_ij) AS n_i FROM tr GROUP BY 1),
    terms AS (
      SELECT tr.cur, tr.nxt, tr.n_ij, marg.n_i,
             CAST(floor(CAST(tr.n_ij AS DOUBLE)
                        * ln(CAST(tr.n_ij AS DOUBLE)
                             / CAST(marg.n_i AS DOUBLE)) * 1e9 + 0.5)
                  AS BIGINT) AS q_term
      FROM tr JOIN marg USING (cur)),
    tot AS (SELECT sum(n_ij) AS n FROM tr)
    SELECT CAST(tot.n AS BIGINT) AS n_transitions,
           round(-CAST(sum(terms.q_term) AS DOUBLE)
                 / (CAST(tot.n AS DOUBLE) * 1e9), 6) AS entropy_rate_nats
    FROM terms CROSS JOIN tot
    GROUP BY tot.n
    """,
)
def q_events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy of the behavioral Markov chain — H(next |
    current) = −Σ_ij (n_ij/N)·ln(n_ij/n_i) — the single-number
    predictability score of a clickstream (a rate collapsing toward 0
    means sessions became deterministic: bot traffic or a broken UI
    loop; rising means navigation chaos). Transition counts come from
    ONE user-ordered window pass (the q_events_markov exchange); the
    entropy terms are the float trap (sum of ln products is
    order-dependent), so each term quantizes to an exact 1e-9 integer
    grid FIRST (the q_text_perplexity discipline) and the sum is
    int64; one double division at the end."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    tr = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n_ij"))
    marg = tr.groupBy("cur").agg(F.sum("n_ij").alias("n_i"))
    terms = tr.join(F.broadcast(marg), "cur").select(
        "n_ij",
        F.floor(
            F.col("n_ij").cast("double")
            * F.log(F.col("n_ij").cast("double") / F.col("n_i").cast("double"))
            * 1e9
            + 0.5
        )
        .cast("long")
        .alias("q_term"),
    )
    return terms.agg(
        F.sum("n_ij").cast("long").alias("n_transitions"),
        F.round(
            -F.sum("q_term").cast("double")
            / (F.sum("n_ij").cast("double") * 1e9),
            6,
        ).alias("entropy_rate_nats"),
    )


@query(
    "q_audience_overlap",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
    co AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(n_both AS DOUBLE) / CAST(sa.n + sb.n - n_both AS DOUBLE)
             AS jaccard
    FROM co
    JOIN sz sa ON sa.event_type = type_a
    JOIN sz sb ON sb.event_type = type_b
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: exact Jaccard between every pair of
    event types' user sets — the activation/cannibalization readout
    (high click∩purchase overlap = converting audience; two channels
    at Jaccard ≈ 1 are the same audience twice). The raw fact
    collapses to DISTINCT (type, user) in one shuffle; pair
    co-occurrence generates from the per-user type set (the self-join
    in the oracle; array pair expansion would serve at higher type
    cardinality), so the quadratic side is |types|² = 25, never users.
    Set sizes broadcast; Jaccard divides exact int64 once per pair."""
    ev = tbl(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sz = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    co = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    j = co.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
    return j.select(
        "type_a",
        "type_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_both").cast("long").alias("n_both"),
        (
            F.col("n_both").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
        ).alias("jaccard"),
    )


@query(
    "q_funnel_by_arm",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts, substr(event_type, 1, 1) AS ini,
             CAST(instr('0123456789abcdef',
                        substr(md5(CAST(user_id AS VARCHAR) || '#ab'), 1, 1))
                  - 1 AS BIGINT) % 2 AS grp,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, grp, event_id, ts, ini,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o),
    sig AS (
      SELECT grp, user_id, session_idx,
             CAST(CASE WHEN regexp_matches(
                    string_agg(ini, '' ORDER BY ts, event_id), 'cv*p')
                  THEN 1 ELSE 0 END AS BIGINT) AS conv
      FROM s GROUP BY 1, 2, 3)
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(conv) AS BIGINT) AS n_converted,
           CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS conv_rate
    FROM sig GROUP BY grp
    """,
)
def q_funnel_by_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experiment readout analysts actually ship: per A/B arm
    (md5-parity bucketing, q_ab_ztest's assignment), the share of
    sessions completing the click→browse→purchase pattern
    (q_events_pattern_match's regex funnel) — three verified
    primitives composed end-to-end, so the composed oracle checks
    their INTERACTION (arm assignment must not perturb
    sessionization; the funnel regex must see arm-partitioned
    sessions identically). One user-ordered exchange feeds both the
    session pass and the signature fold; arms are a projection; the
    final table is 2 rows of exact counters + one division each."""
    ev = tbl(spark, sf_dir, "events").withColumn(
        "ini", F.substring("event_type", 1, 1)
    ).withColumn(
        "grp",
        (
            (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(
                        F.md5(
                            F.concat(F.col("user_id").cast("string"), F.lit("#ab"))
                        ),
                        1,
                        1,
                    ),
                )
                - 1
            ).cast("long")
            % 2
        ),
    )
    sig = (
        _with_session_ids(ev)
        .groupBy("grp", "user_id", "session_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "ini"))
                    ),
                    lambda s: s["ini"],
                ),
                "",
            )
            .rlike("cv*p")
            .cast("long")
            .alias("conv")
        )
    )
    return sig.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("conv").cast("long").alias("n_converted"),
        (F.sum("conv").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "conv_rate"
        ),
    )


@query(
    "q_events_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS s1, sum(x * x) AS s2
      FROM hourly GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           CAST(s1 AS BIGINT) AS n_events,
           CASE WHEN s1 = 0 THEN NULL
                ELSE (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE))
           END AS fano_factor
    FROM s
    """,
)
def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness by the Fano factor (variance-to-mean ratio of
    hourly counts): ≈1 is Poisson (organic), ≫1 is bursty (incidents,
    batch jobs, scripted traffic), ≪1 is suspiciously regular (rate-
    limited bots) — the dispersion diagnostic that catches what mean
    volume hides. Two aggregate-first passes (fact → hourly cells →
    per-type power sums, both map-side combinable); the factor is the
    cleared-denominator form (n·Σx² − (Σx)²)/(n·Σx) — exact int64
    operands, one double expression, NULL on empty."""
    ev = tbl(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("x"))
    s = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("s1").cast("long").alias("n_events"),
        F.when(F.col("s1") == 0, F.lit(None).cast("double"))
        .otherwise((n * s2 - s1 * s1) / (n * s1))
        .alias("fano_factor"),
    )
