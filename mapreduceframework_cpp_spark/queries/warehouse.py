"""Warehouse-maintenance queries (SURVEY.md §2.2-M, round 3): the
incremental-update shapes a corpus/feature store needs between full
rebuilds — CDC merge (upsert), SCD-2 validity-interval history, and
time-series linear interpolation over gaps.

Kernel lowering: merge is R6 shuffle on the key + R8 latest-wins fold;
SCD-2 and interpolation are the ordered per-key fold (R8 — the reference
hands ``reduce`` the whole group as a vector, ``MapReduceClient.h:61-64``).

Cross-engine determinism: every derived value is built from exact
integers or single double operations on identical inputs (int ratios,
``double + literal``), so DuckDB and Spark agree bit-for-bit; interval
endpoints come from the data's own timestamps, never from epoch
arithmetic (session-timezone-proof — positions use row_number over the
dense grid instead of unix epochs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


@query(
    "q_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 100 AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM updates
    UNION ALL
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
    FROM orders o
    WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (SCD-1 latest-wins upsert) without a
    transactional table: a CDC batch of modified rows (keys % 7, price
    bumped) and brand-new rows (keys % 13, remapped id) merges into the
    base — updates win, untouched base rows pass through. Spark shape:
    broadcast left-anti join (base minus touched keys) + union; the CDC
    batch is small by nature, so the 100 TB base is scanned exactly once
    with no shuffle. Pair with partition-overwrite for the write side.
    Kernel: R6 key shuffle + R8 latest-wins fold."""
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + 100).alias("o_totalprice"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_custkey",
                F.lit("N").alias("o_orderstatus"),
                "o_totalprice",
            )
        )
    )
    kept = o.join(F.broadcast(updates.select("o_orderkey")), "o_orderkey", "left_anti")
    return updates.unionByName(kept)


@query(
    "q_scd2_intervals",
    oracle="""
    WITH x AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    s AS (
      SELECT user_id, event_type, ts FROM x
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
    FROM s
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history build: compress each user's event stream into
    state-change rows (consecutive identical ``event_type`` collapsed)
    with [valid_from, valid_to) validity intervals; the open current
    state has NULL valid_to. Two window passes over ONE exchange (both
    windows partition on user_id); (user_id, ts) is unique in the data
    and event_id tie-breaks the change detection, so the islands are
    deterministic. Kernel: R8 ordered per-key fold."""
    ev = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )


@query(
    "q_ts_interpolate",
    oracle="""
    WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS t0,
                      date_trunc('hour', max(ts)) AS t1
               FROM events GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour
             FROM b),
    h AS (SELECT user_id, date_trunc('hour', ts) AS hour,
                 count(*) AS n FROM events GROUP BY 1, 2),
    j AS (
      SELECT g.user_id, g.hour, h.n,
             CAST(row_number() OVER (PARTITION BY g.user_id ORDER BY g.hour)
                  AS BIGINT) AS pos
      FROM grid g LEFT JOIN h USING (user_id, hour)
    ),
    n4 AS (
      SELECT user_id, hour, n, pos,
             last_value(n IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN n IS NOT NULL THEN pos END IGNORE NULLS)
               OVER wp AS prev_p,
             first_value(n IGNORE NULLS) OVER wn AS next_v,
             first_value(CASE WHEN n IS NOT NULL THEN pos END IGNORE NULLS)
               OVER wn AS next_p
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, hour,
           CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
                WHEN prev_v IS NULL THEN CAST(next_v AS DOUBLE)
                WHEN next_v IS NULL THEN CAST(prev_v AS DOUBLE)
                ELSE prev_v + (next_v - prev_v)
                     * (CAST(pos - prev_p AS DOUBLE)
                        / CAST(next_p - prev_p AS DOUBLE))
           END AS n_interp
    FROM n4
    """,
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over time-series gaps (the resample+interp
    pattern): the dense hourly grid from q_ts_gapfill, with missing
    hours filled by linear interpolation between the nearest observed
    neighbors instead of zeros. Gap positions use row_number over the
    dense grid — pure ordinals, so no epoch arithmetic and no session-
    timezone sensitivity — and every interpolated value is exact-int
    arithmetic followed by the same two double ops in both engines
    (hash-identical). last/first IGNORE NULLS over mirrored frames finds
    neighbors in two window passes over ONE exchange."""
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
        .agg(F.count("*").alias("n"))
    )
    w_pos = Window.partitionBy("user_id").orderBy("hour")
    j = grid.join(hourly, ["user_id", "hour"], "left").withColumn(
        "pos", F.row_number().over(w_pos).cast("long")
    )
    # both neighbor scans are GROWING frames ([unbounded preceding,
    # current]) — Spark evaluates those incrementally in O(n); the
    # symmetric [current, unbounded following] frame is re-scanned per
    # row (O(n²) on long partitions — measured 27 s at sf0.1), so the
    # forward neighbor uses last-over-DESC-order instead: same exchange,
    # one extra in-partition sort, linear time
    # neighbor windows order by HOUR, not pos: pos is row_number over
    # hour, so the orders are identical — but ordering by the column
    # the first window already sorted by lets Catalyst reuse that sort
    # (r13 plan audit: the orderBy("pos") form inserted a second
    # in-partition Sort of the full grid between the window passes).
    wp = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos_if_obs = F.when(F.col("n").isNotNull(), F.col("pos"))
    n4 = (
        j.withColumn("prev_v", F.last("n", ignorenulls=True).over(wp))
        .withColumn("prev_p", F.last(pos_if_obs, ignorenulls=True).over(wp))
        .withColumn("next_v", F.last("n", ignorenulls=True).over(wn))
        .withColumn("next_p", F.last(pos_if_obs, ignorenulls=True).over(wn))
    )
    frac = (F.col("pos") - F.col("prev_p")).cast("double") / (
        F.col("next_p") - F.col("prev_p")
    ).cast("double")
    interp = (
        F.when(F.col("n").isNotNull(), F.col("n").cast("double"))
        .when(F.col("prev_v").isNull(), F.col("next_v").cast("double"))
        .when(F.col("next_v").isNull(), F.col("prev_v").cast("double"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return n4.select("user_id", "hour", interp.alias("n_interp"))


@query(
    "q_ts_ewma",
    oracle="""
    SELECT event_id, user_id, ts, value,
           (value
            + coalesce(lag(value, 1) OVER w, 0) * 0.5
            + coalesce(lag(value, 2) OVER w, 0) * 0.25
            + coalesce(lag(value, 3) OVER w, 0) * 0.125
            + coalesce(lag(value, 4) OVER w, 0) * 0.0625
            + coalesce(lag(value, 5) OVER w, 0) * 0.03125
            + coalesce(lag(value, 6) OVER w, 0) * 0.015625
            + coalesce(lag(value, 7) OVER w, 0) * 0.0078125)
           /
           (1.0
            + CASE WHEN lag(value, 1) OVER w IS NULL THEN 0 ELSE 0.5 END
            + CASE WHEN lag(value, 2) OVER w IS NULL THEN 0 ELSE 0.25 END
            + CASE WHEN lag(value, 3) OVER w IS NULL THEN 0 ELSE 0.125 END
            + CASE WHEN lag(value, 4) OVER w IS NULL THEN 0 ELSE 0.0625 END
            + CASE WHEN lag(value, 5) OVER w IS NULL THEN 0 ELSE 0.03125 END
            + CASE WHEN lag(value, 6) OVER w IS NULL THEN 0 ELSE 0.015625 END
            + CASE WHEN lag(value, 7) OVER w IS NULL THEN 0 ELSE 0.0078125 END)
           AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-horizon EWMA smoothing per user (alpha = 0.5, 8 taps):
    the streaming-feature shape (smoothed engagement value) expressed as
    a FIXED-tap FIR filter so it is order-independent-safe — an exact
    recursive EWMA needs an unbounded ordered fold, but 8 taps of a
    halving kernel bound the truncation error at 2^-8 while keeping the
    whole computation one window pass (ONE sort+exchange on user_id,
    all 8 lags share it).

    Cross-engine determinism: every weight is a power of two, so each
    product is an exact mantissa shift; numerator and denominator are
    the same left-to-right double chains in both engines, then one
    division. Normalizing by the present-tap weight sum keeps series
    heads unbiased (a plain recursive EWMA over-weights the first
    sample the same way)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.col("value")
    den = F.lit(1.0)
    for j in range(1, 8):
        wt = 2.0 ** -j
        lagged = F.lag("value", j).over(w)
        num = num + F.coalesce(lagged, F.lit(0.0)) * wt
        den = den + F.when(lagged.isNull(), 0.0).otherwise(wt)
    return (
        tbl(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("ewma", num / den)
    )


@query(
    "q_date_spine",
    oracle="""
    WITH b AS (SELECT min(date_trunc('day', o_orderdate)) AS lo,
                      max(date_trunc('day', o_orderdate)) AS hi
               FROM orders),
    spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                          AS TIMESTAMP) AS day
              FROM b),
    daily AS (SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n
              FROM orders GROUP BY 1)
    SELECT CAST(EXTRACT(year FROM spine.day) AS BIGINT) AS yr,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS empty_days,
           CAST(coalesce(sum(daily.n), 0) AS BIGINT) AS n_orders
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    GROUP BY 1
    """,
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine completeness report: manufacture a dense daily
    spine between the data's own min/max order dates (no magic
    literals), left-join the real daily counts onto it, and report
    per-year coverage including days with zero orders — the gap a
    plain GROUP BY can never see. The spine explodes from the 1-row
    min/max aggregate and the daily counts (one row per day however
    big the fact table is) broadcast as the build side of the outer
    join - the raw fact table is touched only by its own aggregate,
    never reshuffled for the spine."""
    o = tbl(spark, sf_dir, "orders")
    day = F.date_trunc("day", "o_orderdate").cast("timestamp_ntz")
    bounds = o.agg(F.min(day).alias("_lo"), F.max(day).alias("_hi"))
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = o.groupBy(day.alias("day")).agg(F.count("*").alias("n"))
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .groupBy(F.year("day").cast("long").alias("yr"))
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.when(F.col("n").isNull(), 1).otherwise(0)).alias(
                "empty_days"
            ),
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )


@query(
    "q_incr_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def q_incr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the base period's per-priority
    state (decimal sum + count — an ALGEBRAIC aggregate, so partials
    merge exactly) is unioned with the new period's state and re-reduced
    instead of rescanning history. The oracle is the full recompute over
    all orders — hash-equality proves merge(state_old, state_delta) ==
    recompute, the property an incremental 100 TB rollup pipeline rests
    on. Derived averages come off the merged state only (never averaged
    averages)."""
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    cutoff = F.lit("1999-01-01").cast("timestamp_ntz")
    price = F.col("o_totalprice").cast("decimal(18,2)")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"), F.sum(price).alias("s")
        )

    base = state(o.filter(F.col("o_orderdate") < cutoff))
    delta = state(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n_orders"), F.sum("s").alias("s"))
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("s").cast("double").alias("total_price"),
        (F.col("s").cast("double") / F.col("n_orders")).alias("avg_price"),
    )


@query(
    "q_scd2_pit_lookup",
    oracle="""
    WITH x AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE event_type <> 'purchase'
    ),
    chg AS (SELECT user_id, event_type, ts FROM x
            WHERE prev_type IS NULL OR prev_type <> event_type),
    iv AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
      FROM chg),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT iv.state,
           CAST(count(*) AS BIGINT) AS n_purchases
    FROM p JOIN iv
      ON p.user_id = iv.user_id
     AND iv.valid_from <= p.ts
     AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
    GROUP BY 1
    """,
)
def q_scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against SCD-2 validity intervals — the
    feature-store join that must never leak the future: each purchase
    reads the browsing state (last non-purchase event type) that was
    valid AT its timestamp, via [valid_from, valid_to) with a NULL open
    end. Intervals build exactly like q_scd2_intervals (two windows,
    one user_id exchange); the lookup joins on user_id with the
    validity range as residual — per-user interval counts are small,
    so the equi join carries the work and AQE handles skew. Purchases
    before any state row are dropped (inner join), matching the
    oracle."""
    ev = tbl(spark, sf_dir, "events")
    nonp = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        nonp.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    iv = chg.select(
        F.col("user_id").alias("iv_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    return (
        p.join(
            iv,
            (p.user_id == iv.iv_user)
            & (iv.valid_from <= p.ts)
            & (iv.valid_to.isNull() | (p.ts < iv.valid_to)),
        )
        .groupBy("state")
        .agg(F.count("*").alias("n_purchases"))
    )


@query(
    "q_dataset_diff",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_orderkey % 5 <> 0),
    b AS (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 3 <> 0),
    d AS (
      SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
    SELECT status, CAST(count(*) AS BIGINT) AS n_rows
    FROM d GROUP BY 1
    """,
)
def q_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (the data-versioning reconciliation report): two
    dataset versions full-outer-joined on the key and every row
    classified added / removed / changed / unchanged — what a Delta/
    Iceberg time-travel DIFF computes, expressed on plain tables. One
    co-partitioned join on the key; the classification is a pure
    projection and only four counter rows leave the executors."""
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    a = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("ka"), F.col("o_totalprice").alias("pa")
    )
    b = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("kb"),
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 100
        ).otherwise(F.col("o_totalprice")).alias("pb"),
    )
    d = a.join(b, a.ka == b.kb, "full_outer").select(
        F.when(F.col("ka").isNull(), "added")
        .when(F.col("kb").isNull(), "removed")
        .when(F.col("pa") != F.col("pb"), "changed")
        .otherwise("unchanged")
        .alias("status")
    )
    return d.groupBy("status").agg(F.count("*").alias("n_rows"))


@query(
    "q_ts_holt",
    oracle="""
    WITH RECURSIVE
    daily AS (SELECT event_type,
                     CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                     count(*) AS x
              FROM events GROUP BY 1, 2),
    ord AS (SELECT event_type, x,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily),
    n AS (SELECT event_type, max(rn) AS n_days FROM ord GROUP BY 1),
    holt AS (
      SELECT event_type, 1 AS rn,
             CAST(x * 1000000 AS BIGINT) AS l,
             CAST(0 AS BIGINT) AS t
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT h.event_type, h.rn + 1,
             CAST(round(0.5 * (o.x * 1000000)
                        + 0.5 * (h.l + h.t)) AS BIGINT),
             CAST(round(0.25 * (CAST(round(0.5 * (o.x * 1000000)
                                           + 0.5 * (h.l + h.t)) AS BIGINT)
                                - h.l)
                        + 0.75 * h.t) AS BIGINT)
      FROM holt h JOIN ord o ON o.event_type = h.event_type
                            AND o.rn = h.rn + 1)
    SELECT h.event_type,
           CAST(n.n_days AS BIGINT) AS n_days,
           CAST(h.l AS DOUBLE) / 1000000 AS level,
           CAST(h.t AS DOUBLE) / 1000000 AS trend,
           CAST(h.l + 7 * h.t AS DOUBLE) / 1000000 AS forecast_7d
    FROM holt h JOIN n ON n.event_type = h.event_type
    WHERE h.rn = n.n_days
    """,
)
def q_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT recursive Holt linear smoothing (α=0.5, γ=0.25) of daily
    event volume per type — the unbounded ordered fold q_ts_ewma's
    fixed-tap FIR deliberately truncates. The recurrence runs as ONE
    JVM `aggregate` over each key's array_sort-collected series (no
    Python, no iteration driver-side; state per key is two longs), and
    the oracle states the same recurrence as a DuckDB recursive CTE.

    Cross-engine exactness: level/trend live on a 1e-6 integer grid;
    each step's products (0.5·int, 0.25·int, 0.75·int with ints far
    below 2^52) are exact doubles, so the only rounding is the explicit
    round() — ties land on .5 and both engines round half away from
    zero. Scale: per-key series must fit one executor's array (days ×
    key — thousands of elements, not fact rows); keys distribute, the
    fold never shuffles mid-series."""
    e = tbl(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s")
    )

    def step(st, el):
        x = el["x"].cast("long") * F.lit(1000000).cast("long")
        l_new = F.round(
            0.5 * x.cast("double") + 0.5 * (st["l"] + st["t"]).cast("double")
        ).cast("long")
        t_new = F.round(
            0.25 * (l_new - st["l"]).cast("double")
            + 0.75 * st["t"].cast("double")
        ).cast("long")
        return F.struct(l_new.alias("l"), t_new.alias("t"))

    init = F.struct(
        (F.element_at("s", 1)["x"].cast("long") * 1000000).alias("l"),
        F.lit(0).cast("long").alias("t"),
    )
    rest = F.slice(F.col("s"), 2, F.greatest(F.size("s") - 1, F.lit(0)))
    final = F.aggregate(rest, init, step)
    return series.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        (final["l"].cast("double") / 1000000).alias("level"),
        (final["t"].cast("double") / 1000000).alias("trend"),
        ((final["l"] + 7 * final["t"]).cast("double") / 1000000).alias(
            "forecast_7d"
        ),
    )


@query(
    "q_zorder_profile",
    oracle="""
    WITH b AS (
      SELECT min(CAST(o_custkey AS DOUBLE)) AS mn_c,
             max(CAST(o_custkey AS DOUBLE)) AS mx_c,
             min(CAST(o_totalprice AS DOUBLE)) AS mn_p,
             max(CAST(o_totalprice AS DOUBLE)) AS mx_p
      FROM orders),
    s AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             least(255, floor((CAST(o_custkey AS DOUBLE) - mn_c)
                              / (CASE WHEN mx_c - mn_c = 0 THEN 1.0
                                      ELSE mx_c - mn_c END) * 255)) AS sc,
             least(255, floor((CAST(o_totalprice AS DOUBLE) - mn_p)
                              / (CASE WHEN mx_p - mn_p = 0 THEN 1.0
                                      ELSE mx_p - mn_p END) * 255)) AS sp
      FROM orders CROSS JOIN b),
    z AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             list_sum(list_transform(range(0, 8),
               b -> (((CAST(sc AS BIGINT) >> b) & 1) << (2 * b))
                    + (((CAST(sp AS BIGINT) >> b) & 1) << (2 * b + 1))))
               AS zcode
      FROM s)
    SELECT CAST(zcode >> 10 AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(o_custkey) AS BIGINT) AS min_cust,
           CAST(max(o_custkey) AS BIGINT) AS max_cust,
           CAST(min(o_totalprice) AS DOUBLE) AS min_price,
           CAST(max(o_totalprice) AS DOUBLE) AS max_price
    FROM z GROUP BY 1
    """,
)
def q_zorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering-key profile: Morton-interleave (o_custkey,
    o_totalprice) with sources/layout.zorder_key — the same expression
    write_zordered compacts files by — then report per z-range bucket
    the row count and BOTH dimensions' min/max envelopes. The tight
    per-bucket envelopes on two dimensions at once are exactly the
    footer statistics that make multi-dimensional data skipping work
    at 100 TB (a single-column sort tightens only one dimension). Pure
    JVM bit arithmetic after a 4-scalar bounds probe; one map-side-
    combinable aggregate on 64 buckets. The oracle restates the
    min-max scaling and bit interleave in identical IEEE order, so
    zcodes match bit-for-bit."""
    from mapreduceframework_cpp_spark.sources.layout import zorder_key

    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    z = o.withColumn("zcode", zorder_key(o, ["o_custkey", "o_totalprice"]))
    return (
        z.groupBy(F.shiftright("zcode", 10).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


@query(
    "q_ts_rolling_corr",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(coalesce(sum(CASE WHEN event_type = 'click'
                                    THEN 1 END), 0) AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                    THEN 1 END), 0) AS BIGINT) AS y
      FROM events GROUP BY 1),
    w AS (
      SELECT day, x, y,
             count(*) OVER f AS n,
             sum(x) OVER f AS sx, sum(y) OVER f AS sy,
             sum(x * x) OVER f AS sxx, sum(y * y) OVER f AS syy,
             sum(x * y) OVER f AS sxy
      FROM daily
      WINDOW f AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT day, CAST(n AS BIGINT) AS n_days,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))
           END AS corr_7d
    FROM w
    """,
)
def q_ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling Pearson correlation between the daily
    click and purchase series — the co-movement monitor that flags
    tracking breakage (a correlated pair decoupling) ahead of absolute
    alarms. Same float discipline as q_agg_stats taken into a moving
    frame: the six frame sums (n, Σx, Σy, Σx², Σy², Σxy) accumulate
    EXACT int64 counts inside one ROWS window, so every engine sees
    identical operands and the one double formula per row is
    bit-identical; zero-variance frames yield NULL rather than a 0/0.
    One day-grain aggregate (map-side combinable) collapses the fact
    table before the window, which then runs over ~365 rows/year —
    aggregate-first, window-over-tiny, the 100 TB shape."""
    daily = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "click", 1)), F.lit(0)
            )
            .cast("long")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", 1)), F.lit(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    f = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum("x").over(f).alias("sx"),
        F.sum("y").over(f).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(f).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(f).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(f).alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return w.select(
        "day",
        F.col("n").cast("long").alias("n_days"),
        F.when((vx == 0) | (vy == 0), F.lit(None).cast("double"))
        .otherwise(
            cov.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double"))
        )
        .alias("corr_7d"),
    )


@query(
    "q_incr_join_view",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_nationkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS price_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_incr_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance: with insert-only deltas ΔA
    (new orders) and ΔB (new customers), the maintained view is
    V_old ∪ (ΔA ⋈ B) ∪ (A_old ⋈ ΔB) — the classic delta rule
    ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB with the last two terms folded
    (ΔA joins the FULL B; A_old joins only ΔB). The oracle is the full
    recompute over orders⋈customer: hash-equality proves the delta
    algebra. At 100 TB the payoff is the A_old ⋈ ΔB term — the huge
    fact side is only re-joined against the (broadcastable) dimension
    delta, never rescanned against all of B; ΔA⋈B is delta-sized. Both
    delta joins here broadcast their small side.

    Money rides as exact BIGINT cents, never as a DECIMAL output
    column: the driver hashes results through pandas, where a Spark
    DECIMAL lands as object-of-Decimal but the DuckDB oracle's DECIMAL
    lands as float64 — guaranteed hash-fail on equal values (round-6
    red; the same pandas-dtype lens as round-2's HUGEINT sums)."""
    a = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    b = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    a_old = a.filter(F.col("o_orderkey") % 9 != 0)
    a_new = a.filter(F.col("o_orderkey") % 9 == 0)
    b_old = b.filter(F.col("c_custkey") % 11 != 0)
    b_new = b.filter(F.col("c_custkey") % 11 == 0)

    def view(fact: DataFrame, dim: DataFrame) -> DataFrame:
        return fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey).select(
            "o_orderkey", "c_custkey", "c_nationkey", "price_cents"
        )

    v_old = view(a_old, b_old)
    delta = view(a_new, b).unionByName(view(a_old, b_new))
    return v_old.unionByName(delta)


@query(
    "q_ts_acf",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS x
      FROM orders GROUP BY 1),
    idx AS (SELECT x, row_number() OVER (ORDER BY day) AS rn FROM daily),
    ks AS (SELECT unnest(generate_series(1, 7)) AS k),
    pairs AS (
      SELECT ks.k AS lag_k, a.x AS x, b.x AS y
      FROM ks CROSS JOIN idx a JOIN idx b ON b.rn = a.rn - ks.k),
    s AS (
      SELECT lag_k, count(*) AS n,
             sum(CAST(x AS DECIMAL(19,0))) AS sx,
             sum(CAST(y AS DECIMAL(19,0))) AS sy,
             sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
             sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
             sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
      FROM pairs GROUP BY lag_k)
    SELECT CAST(lag_k AS BIGINT) AS lag_k, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                  OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0
                THEN NULL
                ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS acf_corr
    FROM s
    """,
)
def q_ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at lags 1..7 (the
    seasonality probe behind every forecast model): Pearson correlation
    between the series and its k-shifted self over the observed day
    sequence. Aggregate-first: the fact table collapses to one exact
    int64-cents row per day (map-side combinable), and everything after
    runs on that ~2.4k-row aggregate. The lagged pairing is a
    manufactured EQUI-join — the shifted side expands 7× with
    ``rn + k`` as the join key (same lowering as the binned interval
    join) instead of a theta self-join, so even a 100-year hourly
    series stays hash-joinable. Cross-engine float discipline as
    q_ts_rolling_corr: all six per-lag sums accumulate exact DECIMALs,
    then ONE double formula per lag; zero-variance lags yield NULL."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("x")
        )
    )
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("rn")
    )
    ks = spark.range(1, 8).select(F.col("id").alias("lag_k"))
    shifted = idx.crossJoin(F.broadcast(ks)).select(
        "lag_k",
        (F.col("rn") + F.col("lag_k")).alias("rn_join"),
        F.col("x").alias("y"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    s = (
        idx.join(shifted, idx.rn == shifted.rn_join)
        .groupBy("lag_k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("sx"),
            F.sum(yd).alias("sy"),
            F.sum(xd * xd).alias("sxx"),
            F.sum(yd * yd).alias("syy"),
            F.sum(xd * yd).alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") - sx * sx
    vy = n * F.col("syy").cast("double") - sy * sy
    cov = n * F.col("sxy").cast("double") - sx * sy
    return s.select(
        F.col("lag_k").cast("long").alias("lag_k"),
        F.col("n").cast("long").alias("n_pairs"),
        F.when((vx == 0) | (vy == 0), F.lit(None).cast("double"))
        .otherwise(cov / F.sqrt(vx * vy))
        .alias("acf_corr"),
    )


@query(
    "q_ts_seasonal_index",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS x
      FROM orders GROUP BY 1),
    dow AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) % 7
                  AS BIGINT) AS dow_idx,
             count(*) AS n_days, sum(x) AS sum_x
      FROM daily GROUP BY 1)
    SELECT dow_idx, CAST(n_days AS BIGINT) AS n_days,
           CAST(sum_x AS BIGINT) AS revenue_cents,
           (CAST(sum_x AS DOUBLE) * CAST(sum(n_days) OVER () AS DOUBLE))
           / (CAST(n_days AS DOUBLE) * CAST(sum(sum_x) OVER () AS DOUBLE))
             AS seasonal_index
    FROM dow
    """,
)
def q_ts_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonal index: mean daily revenue per weekday divided by
    the overall mean daily revenue (index > 1 = above-trend weekday).
    The weekday key is the portable epoch-anchored formula
    ``days_since_1970 % 7`` (0 = Thursday) — engine ``dayofweek``
    builtins disagree on numbering, integer arithmetic doesn't.
    Aggregate-first twice: fact → exact cents per day → 7 weekday rows;
    the normalizing totals come from an unpartitioned window over those
    7 rows, not a second scan. The index is one double expression over
    exact int64 sums, identical in both engines."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("x")
        )
    )
    dow = (
        daily.groupBy(
            (
                F.datediff(F.col("day").cast("date"), F.lit("1970-01-01").cast("date"))
                % 7
            )
            .cast("long")
            .alias("dow_idx")
        )
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("x").alias("sum_x"),
        )
    )
    w = Window.partitionBy()
    return dow.select(
        "dow_idx",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("sum_x").cast("long").alias("revenue_cents"),
        (
            (
                F.col("sum_x").cast("double")
                * F.sum("n_days").over(w).cast("double")
            )
            / (
                F.col("n_days").cast("double")
                * F.sum("sum_x").over(w).cast("double")
            )
        ).alias("seasonal_index"),
    )


@query(
    "q_ts_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1)
    SELECT month, rev,
           CASE WHEN lag(rev, 1) OVER w IS NULL THEN NULL
                ELSE CAST(rev - lag(rev, 1) OVER w AS DOUBLE)
                     / CAST(lag(rev, 1) OVER w AS DOUBLE) END AS mom_pct,
           CASE WHEN lag(rev, 12) OVER w IS NULL THEN NULL
                ELSE CAST(rev - lag(rev, 12) OVER w AS DOUBLE)
                     / CAST(lag(rev, 12) OVER w AS DOUBLE) END AS yoy_pct
    FROM m
    WINDOW w AS (ORDER BY month)
    """,
)
def q_ts_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month / year-over-year growth report — the standard
    finance trend table. Aggregate-first: the fact collapses to exact
    int64 cents per month (map-side combinable), then BOTH lags share
    one ordered window over the ~85-row monthly aggregate. Growth is
    sequence-lag based (row 12 back, not calendar-month arithmetic) —
    exact on this data's dense month spine and identical by
    construction in both engines; leading rows NULL rather than
    partial-year fabrications."""
    m = (
        tbl(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", "o_orderdate")
            .cast("timestamp_ntz")
            .alias("month")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("rev")
        )
    )
    w = Window.orderBy("month")
    l1, l12 = F.lag("rev", 1).over(w), F.lag("rev", 12).over(w)
    return m.select(
        "month",
        "rev",
        F.when(l1.isNull(), F.lit(None).cast("double"))
        .otherwise((F.col("rev") - l1).cast("double") / l1.cast("double"))
        .alias("mom_pct"),
        F.when(l12.isNull(), F.lit(None).cast("double"))
        .otherwise((F.col("rev") - l12).cast("double") / l12.cast("double"))
        .alias("yoy_pct"),
    )


@query(
    "q_ts_seasonal_anomaly",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS x
      FROM orders GROUP BY 1),
    keyed AS (
      SELECT day, x,
             CAST(date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) % 7
                  AS BIGINT) AS dow
      FROM daily),
    stats AS (
      SELECT dow, count(*) AS n,
             sum(CAST(x AS DECIMAL(19,0))) AS s1,
             sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS s2
      FROM keyed GROUP BY 1)
    SELECT k.day, k.x, k.dow,
           CASE WHEN st.n * st.s2 - st.s1 * st.s1 = 0 THEN NULL
                ELSE (CAST(k.x AS DOUBLE) * CAST(st.n AS DOUBLE)
                      - CAST(st.s1 AS DOUBLE))
                     / sqrt(CAST(st.n AS DOUBLE)
                            * (CAST(st.n AS DOUBLE) * CAST(st.s2 AS DOUBLE)
                               - CAST(st.s1 AS DOUBLE)
                                 * CAST(st.s1 AS DOUBLE)))
           END AS z_seasonal
    FROM keyed k JOIN stats st USING (dow)
    """,
)
def q_ts_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly score: each day's revenue is
    z-scored against ITS OWN WEEKDAY's distribution (raw daily z-scores
    flag every Saturday in a weekday-seasonal business; deviation from
    the weekday mean flags real anomalies). The z is computed in a
    cleared-denominator form — z = (x·n − Σx) / sqrt(n·(n·Σx² − (Σx)²))
    — so the operands are exact DECIMAL sums (Σx² overflows int64 at
    cents scale, hence the DECIMAL(38,0) accumulators, as q_ts_acf) and
    the only float ops are the final products/sqrt/division, identical
    in both engines. Shape: fact → daily aggregate → 7-row weekday
    stats broadcast back onto ~2.4k daily rows."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("day", "o_orderdate")
            .cast("timestamp_ntz")
            .alias("day")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("x")
        )
    )
    keyed = daily.select(
        "day",
        "x",
        (
            F.datediff(F.col("day").cast("date"), F.lit("1970-01-01").cast("date"))
            % 7
        )
        .cast("long")
        .alias("dow"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    stats = keyed.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("s1"),
        F.sum(xd * xd).alias("s2"),
    )
    j = keyed.join(F.broadcast(stats), "dow")
    nn = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    disc = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return j.select(
        "day",
        "x",
        "dow",
        F.when(disc == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("x").cast("double") * nn - s1)
            / F.sqrt(nn * (nn * s2 - s1 * s1))
        )
        .alias("z_seasonal"),
    )


@query(
    "q_incr_agg_retract",
    oracle="""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey % 5 <> 0),
    inserts AS (SELECT * FROM orders WHERE o_orderkey % 5 = 0),
    deletes AS (SELECT * FROM base WHERE o_orderkey % 7 = 3)
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM (SELECT o_custkey, o_totalprice FROM base
          WHERE o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
          UNION ALL
          SELECT o_custkey, o_totalprice FROM inserts)
    GROUP BY 1
    """,
)
def q_incr_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retractable incremental aggregate maintenance — the step past
    q_incr_agg's insert-only world: a CDC batch carries BOTH inserts
    and deletes, and the maintained (count, sum) state absorbs them as
    SIGNED partial aggregates — state ⊕ agg(inserts) ⊖ agg(deletes) —
    because count/sum form an abelian group (retractions are just
    negated rows; the trick every streaming upsert engine's
    update-mode aggregation runs on). The base's full aggregate is
    computed ONCE; each delta leg aggregates only its own rows, the
    three partial states union (3 tiny frames) and re-reduce. Empty
    groups (all rows retracted) drop via the HAVING-style count
    filter. The oracle is the full recompute over the surviving rows —
    hash-equality proves the retraction algebra. Money is exact BIGINT
    cents end-to-end: signed-integer state is the textbook retraction
    form, and a DECIMAL output column would hash-fail under the
    driver's pandas lens (round-6 red — Spark Decimal objects vs the
    oracle's float64)."""
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    base = o.filter(F.col("o_orderkey") % 5 != 0)
    inserts = o.filter(F.col("o_orderkey") % 5 == 0)
    deletes = base.filter(F.col("o_orderkey") % 7 == 3)

    def state(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            (F.count(F.lit(1)) * sign).alias("cnt"),
            (F.sum("price_cents") * sign).alias("tot"),
        )

    merged = (
        state(base, 1)
        .unionByName(state(inserts, 1))
        .unionByName(state(deletes, -1))
        .groupBy("o_custkey")
        .agg(F.sum("cnt").alias("n"), F.sum("tot").alias("total"))
        .filter(F.col("n") > 0)
    )
    return merged.select(
        "o_custkey",
        F.col("n").cast("long").alias("n_orders"),
        F.col("total").cast("long").alias("total_cents"),
    )


@query(
    "q_alloc_largest_remainder",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
      FROM lineitem),
    o AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS t
      FROM orders),
    j AS (
      SELECT li.l_orderkey, li.l_linenumber, li.w, o.t,
             sum(li.w) OVER (PARTITION BY li.l_orderkey) AS tw
      FROM li JOIN o ON o.o_orderkey = li.l_orderkey),
    b AS (
      SELECT l_orderkey, l_linenumber, w, t, tw,
             (t * w) // tw AS base,
             (t * w) % tw AS rem
      FROM j),
    r AS (
      SELECT l_orderkey, l_linenumber, base,
             t - sum(base) OVER (PARTITION BY l_orderkey) AS leftover,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY rem DESC, l_linenumber) AS rk
      FROM b)
    SELECT l_orderkey, l_linenumber,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_cents
    FROM r
    """,
)
def q_alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Penny-exact proration by the largest-remainder (Hamilton)
    method: each order's total is allocated across its line items
    proportional to extended price such that the allocated cents SUM
    EXACTLY to the order total — the conservation law naive
    round(T·w/W) violates (penny drift that fails reconciliation).
    Base share = exact integer floor division, the leftover R cents
    (0 <= R < n) go to the R largest fractional remainders
    (linenumber tie-break). Everything is int64 (T·w <= ~5e14), the
    two windows share the ONE orderkey exchange, and conservation is
    provable from the construction: Σalloc = Σbase + R = T."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("w"),
    )
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("t"),
    )
    w_ord = Window.partitionBy("l_orderkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "tw", F.sum("w").over(w_ord)
    )
    b = j.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("(t * w) div tw").alias("base"),
        F.expr("(t * w) % tw").alias("rem"),
        "t",
    )
    w_rk = Window.partitionBy("l_orderkey").orderBy(
        F.desc("rem"), "l_linenumber"
    )
    r = b.select(
        "l_orderkey",
        "l_linenumber",
        "base",
        (F.col("t") - F.sum("base").over(w_ord)).alias("leftover"),
        F.row_number().over(w_rk).alias("rk"),
    )
    return r.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .cast("long")
        .alias("alloc_cents"),
    )


@query(
    "q_dup_payments",
    oracle="""
    WITH feed AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
      UNION ALL
      SELECT o_orderkey + 200000000, o_custkey, o_totalprice,
             o_orderdate + INTERVAL 14 DAY
      FROM orders WHERE o_orderkey % 37 = 0),
    o AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             o_orderdate,
             lag(o_orderdate) OVER (PARTITION BY o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 ORDER BY o_orderdate, o_orderkey) AS prev_date,
             lag(o_orderkey) OVER (PARTITION BY o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 ORDER BY o_orderdate, o_orderkey) AS prev_key
      FROM feed)
    SELECT o_orderkey, o_custkey, cents, o_orderdate, prev_key, prev_date,
           CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT)
             AS days_apart
    FROM o
    WHERE prev_date IS NOT NULL
      AND date_diff('day', prev_date, o_orderdate) <= 30
    """,
)
def q_dup_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment / double-billing audit: same customer, same
    exact amount, within 30 days — the finance reconciliation screen.
    The naive form is a self-join on (customer, amount) with a date
    band; partitioning the WINDOW on (customer, exact-cents amount)
    instead makes each repeat adjacent to its predecessor, so ONE
    sort+exchange finds every consecutive repeat with lag() — no join,
    no band logic, and the 30-day test is exact day arithmetic. Amounts
    compare as exact int64 cents (double equality on money is the bug
    this query exists to catch). The corpus has no organic repeats, so
    a replayed-charge batch is PLANTED deterministically (every 37th
    order re-billed 14 days later — the same dirty-input contract as
    the PII and markup families) and the audit must recover exactly
    that set."""
    base = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    feed = base.unionByName(
        base.filter(F.col("o_orderkey") % 37 == 0).select(
            (F.col("o_orderkey") + 200000000).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
            (F.col("o_orderdate") + F.expr("INTERVAL 14 DAY")).alias(
                "o_orderdate"
            ),
        )
    )
    o = feed.select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        "o_orderdate",
    )
    w = Window.partitionBy("o_custkey", "cents").orderBy(
        "o_orderdate", "o_orderkey"
    )
    x = o.select(
        "o_orderkey",
        "o_custkey",
        "cents",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
    )
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.col("prev_date").cast("date")
    )
    return x.filter(
        F.col("prev_date").isNotNull() & (days <= 30)
    ).select(
        "o_orderkey",
        "o_custkey",
        "cents",
        "o_orderdate",
        "prev_key",
        "prev_date",
        days.cast("long").alias("days_apart"),
    )
