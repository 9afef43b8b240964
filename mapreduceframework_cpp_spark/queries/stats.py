"""Statistical aggregate queries (SURVEY.md §2.2-D, round-2 additions):
variance / standard deviation / correlation and argmin/argmax
aggregates.

Cross-engine float discipline (see queries/aggregations.py): native
``var_samp``/``corr`` accumulate doubles in partition order, so their
results are not reproducible across engines — or across two runs with
different partitioning. Instead the power sums Σx, Σx², Σxy accumulate
in DECIMAL (exact, order-independent; base columns are exact 2dp), then
the variance/correlation formulas run in double on bit-identical
operands, giving bit-identical results in Spark and DuckDB. This is
also the 100 TB-friendly shape: power sums partial-aggregate map-side
like any sum.

Kernel lowering: R6 shuffle + R8 reduce with an R16-style combiner —
the reference would emit (key, x, x², xy) tuples from map and add them
in reduce (``MapReduceFramework.cpp:79-149``).

Registered AFTER the round-1 families (see queries/__init__.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


@query(
    "q_agg_stats",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq2,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp2,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           (sq2 - sq * sq / n) / (n - 1) AS var_qty,
           sqrt((sq2 - sq * sq / n) / (n - 1)) AS std_qty,
           (sqp - sq * sp / n)
             / (sqrt(sq2 - sq * sq / n) * sqrt(sp2 - sp * sp / n)) AS corr_qty_price
    FROM s
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev of quantity and quantity↔price correlation
    per return flag, via exact decimal power sums + double formulas
    (bit-identical across engines — see module docstring). The final
    doubles are NOT rounded: they are already identical, and rounding
    computed doubles is the known cross-engine hash hazard."""
    li = tbl(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(q).cast("double").alias("_sq"),
        F.sum(p).cast("double").alias("_sp"),
        F.sum(q * q).cast("double").alias("_sq2"),
        F.sum(p * p).cast("double").alias("_sp2"),
        F.sum(q * p).cast("double").alias("_sqp"),
    )
    n, sq, sp = F.col("_n"), F.col("_sq"), F.col("_sp")
    sq2, sp2, sqp = F.col("_sq2"), F.col("_sp2"), F.col("_sqp")
    var_qty = (sq2 - sq * sq / n) / (n - 1)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        var_qty.alias("var_qty"),
        F.sqrt(var_qty).alias("std_qty"),
        (
            (sqp - sq * sp / n)
            / (F.sqrt(sq2 - sq * sq / n) * F.sqrt(sp2 - sp * sp / n))
        ).alias("corr_qty_price"),
    )


@query(
    "q_agg_minmax_by",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
      FROM orders
    )
    SELECT a.o_orderpriority,
           a.o_orderkey AS best_order,
           a.o_totalprice AS best_price,
           b.o_orderkey AS worst_order,
           b.o_totalprice AS worst_price
    FROM r a JOIN r b ON a.o_orderpriority = b.o_orderpriority
    WHERE a.rmax = 1 AND b.rmin = 1
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin aggregates: the order carrying the highest/lowest
    total price per priority, tie-broken deterministically by orderkey
    via struct ordering — ``max_by(x, struct(price, key))`` compares
    lexicographically, which the oracle mirrors with a two-key window
    (DuckDB's ``arg_max`` tie rules are unspecified, so the oracle
    avoids it)."""
    o = tbl(spark, sf_dir, "orders")
    ordkey = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ordkey).alias("best_order"),
        F.max(ordkey).getField("o_totalprice").alias("best_price"),
        F.min_by("o_orderkey", ordkey).alias("worst_order"),
        F.min(ordkey).getField("o_totalprice").alias("worst_price"),
    )


@query(
    "q_skew_keys",
    oracle="""
    WITH c AS (SELECT o_custkey AS key, count(*) AS cnt
               FROM orders GROUP BY o_custkey),
    t AS (SELECT sum(cnt) * 1.0 / count(*) AS avg_cnt FROM c)
    SELECT key, CAST(cnt AS BIGINT) AS cnt,
           round(cnt / avg_cnt, 6) AS x_avg
    FROM c, t WHERE cnt >= 1.5 * avg_cnt
    """,
)
def q_skew_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection: keys carrying ≥1.5x the mean rows per key
    — the planner input that decides WHERE salting (operators/skew) or
    AQE skew-split is worth applying before a big join. One partial-agg
    group-by; the per-key histogram collapses to |keys| rows before the
    (broadcast) scalar join, so the 100 TB fact table is scanned once.
    x_avg is a ratio of exact integers — identical across engines."""
    c = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count("*").alias("cnt"))
    )
    t = c.agg((F.sum("cnt") * 1.0 / F.count("*")).alias("avg_cnt"))
    return (
        c.crossJoin(F.broadcast(t))
        .filter(F.col("cnt") >= 1.5 * F.col("avg_cnt"))
        .select(
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.col("cnt") / F.col("avg_cnt"), 6).alias("x_avg"),
        )
    )


@query(
    "q_ts_rollup_multi",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(hour(ts) AS BIGINT) AS hr,
           GROUPING(CAST(date_trunc('day', ts) AS DATE),
                    CAST(hour(ts) AS BIGINT)) AS gid,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS DATE),
                     CAST(hour(ts) AS BIGINT))
    """,
)
def q_ts_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hourly cells, daily
    subtotals and the grand total in ONE pass (`ROLLUP(day, hour)` —
    Spark plans a single Expand + partial/final aggregate, no
    re-aggregation of finer levels and no union of three scans).
    Continuous-aggregate maintenance at scale = the same query over an
    incremental time slice, merged by (gid, day, hr). Decimal sums per
    queries/aggregations.py discipline (value is exact 2dp data)."""
    ev = tbl(spark, sf_dir, "events")
    grid = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.hour("ts").cast("long").alias("hr"),
        F.col("value").cast("decimal(18,2)").alias("_v"),
    )
    return (
        grid.rollup("day", "hr")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").cast("long").alias("n_events"),
            F.sum("_v").cast("double").alias("sum_value"),
        )
        .select("day", "hr", "gid", "n_events", "sum_value")
    )


@query("q_agg_hll_rollup")  # rows-only: sketch binaries are engine-specific
def q_agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Datasketches HLL, Spark 4): per-day
    sketches of active users built once, then UNIONED into the monthly
    distinct-user count — re-aggregation without rescanning, the
    pattern that makes distinct-count rollups incremental at 100 TB
    (store daily sketches, merge any date range on demand). Returns
    per-day estimates plus a month row (day null). Tests bound both
    against exact distinct counts; no SQL oracle — sketch estimates
    are engine-specific."""
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").cast("long").alias("n_events"),
    )
    per_day = daily.select(
        "day",
        F.hll_sketch_estimate("sk").cast("long").alias("approx_users"),
        "n_events",
    )
    month = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("approx_users"),
        F.sum("n_events").cast("long").alias("n_events"),
    ).select(F.lit(None).cast("date").alias("day"), "approx_users", "n_events")
    return per_day.unionByName(month)


@query("q_agg_approx_quantile")  # rows-only: sketch estimates are engine-specific
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95 of order totals via the Greenwald-Khanna
    sketch (`approx_percentile`, accuracy 10k → rank error ≤ n/10000).
    The mergeable-sketch path for quantiles at 100 TB, where the exact
    `F.percentile` sort-based form (q_agg_percentile) gets expensive.
    No SQL oracle — estimates are engine-specific; tests bound the
    error vs the exact percentile instead (±1%)."""
    return tbl(spark, sf_dir, "orders").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment, o_orderpriority, count(*) AS cnt
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT c_mktsegment, o_orderpriority, cnt,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY cnt DESC, o_orderpriority) AS rn
      FROM c
    )
    SELECT c_mktsegment, o_orderpriority AS mode_priority,
           CAST(cnt AS BIGINT) AS n
    FROM r WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE aggregate (most frequent order priority per market segment)
    with a deterministic tie-break, via sub-aggregated counts +
    ``min_by`` over a (-count, value) struct — two partial-agg shuffles
    over shrinking data, never a sort of raw rows. The oracle states the
    same thing with a window because DuckDB's ``mode()`` tie-break is
    unspecified. ``min_by`` expresses (cnt DESC, priority ASC) directly:
    struct ordering compares -cnt first (min of -cnt = max cnt), then
    the priority string ascending — sound for ANY strings, including
    prefix ties, unlike code-point-flip encodings (flipped('A') <
    flipped('AB') would pick the longer string)."""
    from pyspark.sql import functions as SF

    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    counts = (
        o.join(SF.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(SF.count("*").alias("cnt"))
    )
    key = SF.struct(
        (-SF.col("cnt")).alias("neg_cnt"), SF.col("o_orderpriority")
    )
    return counts.groupBy("c_mktsegment").agg(
        SF.min_by("o_orderpriority", key).alias("mode_priority"),
        SF.min_by("cnt", key).cast("long").alias("n"),
    )


@query(
    "q_events_value_hist",
    oracle="""
    WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
    h AS (
      SELECT least(CAST(floor((value - mn) / ((mx - mn) / 20.0)) AS BIGINT),
                   CAST(19 AS BIGINT)) AS bin,
             mn, mx
      FROM events, b
    )
    SELECT bin,
           round(mn + bin * ((mx - mn) / 20.0), 6) AS bin_lo,
           round(mn + (bin + 1) * ((mx - mn) / 20.0), 6) AS bin_hi,
           CAST(count(*) AS BIGINT) AS n
    FROM h GROUP BY bin, mn, mx
    """,
)
def q_events_value_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width numeric histogram with data-derived bounds (the
    continuous companion to q_text_length_hist's integer buckets):
    global min/max as a broadcast scalar aggregate, 20 bins, the max
    value clamped into the last bin. Two passes over the scan (bounds,
    then binning) — the unavoidable shape for data-driven bounds; bin
    edges are the identical double expression chain in both engines."""
    ev = tbl(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    width = (F.col("mx") - F.col("mn")) / 20.0
    bin_ = F.least(
        F.floor((F.col("value") - F.col("mn")) / width).cast("long"),
        F.lit(19).cast("long"),
    )
    return (
        ev.crossJoin(F.broadcast(b))
        .select(bin_.alias("bin"), "mn", "mx")
        .groupBy("bin", "mn", "mx")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.col("mn") + F.col("bin") * width, 6).alias("bin_lo"),
            F.round(F.col("mn") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
            "n",
        )
    )


@query(
    "q_agg_ols_trend",
    oracle="""
    WITH d AS (
      SELECT lang, n_chars AS x,
             len(string_split(text, ' ')) AS y
      FROM documents),
    s AS (
      SELECT lang,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sx2
      FROM d GROUP BY 1)
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           (n * sxy - sx * sy) / (n * sx2 - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx) / n
             AS intercept
    FROM s
    """,
)
def q_agg_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ordinary-least-squares fit (tokens ~ chars per language):
    slope and intercept from the closed form over INTEGER power sums
    (x, y, xy, x² are exact BIGINTs; only the final closed-form
    expression runs in double, with the identical operation tree in
    both engines — the q_agg_stats discipline applied to regression).
    One partial-aggregating shuffle of five scalars per language; the
    pattern extends to any per-segment trend fit at 100 TB."""
    docs = tbl(spark, sf_dir, "documents")
    x = F.col("n_chars")
    y = F.size(F.split("text", " "))
    s = docs.select("lang", x.alias("x"), y.alias("y")).groupBy("lang").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sx2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sx2 = F.col("sxy"), F.col("sx2")
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    return s.select(
        "lang",
        n.cast("long").alias("n_docs"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


@query(
    "q_agg_mad",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY 1),
    dev AS (
      SELECT o.o_orderpriority,
             abs(o.o_totalprice - m.med) AS adev,
             m.med
      FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority)
    SELECT o_orderpriority,
           CAST(any_value(med) AS DOUBLE) AS median_price,
           CAST(quantile_cont(adev, 0.5) AS DOUBLE) AS mad
    FROM dev GROUP BY 1
    """,
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust spread statistic
    (outlier-proof where stddev is not). Two grouped exact-percentile
    passes: the per-group median (tiny aggregate) broadcasts back onto
    the scan, absolute deviations re-aggregate with the same linear-
    interpolation percentile — each |x − med| is one double op on
    identical inputs, so both engines interpolate identical values."""
    o = tbl(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("adev"),
    )
    return dev.groupBy("o_orderpriority").agg(
        # all rows of a group carry the same med (it was joined in), so
        # the aggregate first() is deterministic
        F.first("med").cast("double").alias("median_price"),
        F.expr("percentile(adev, 0.5)").cast("double").alias("mad"),
    )


@query(
    "q_bitmap_distinct",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             user_id // 62 AS chunk,
             bit_or(1::BIGINT << CAST(user_id % 62 AS INTEGER)) AS bm
      FROM events GROUP BY 1, 2, 3, 4),
    per_day AS (
      SELECT event_type, month, day,
             CAST(sum(bit_count(bm)) AS BIGINT) AS day_users
      FROM daily GROUP BY 1, 2, 3),
    monthly_bm AS (
      SELECT event_type, month, chunk, bit_or(bm) AS bm
      FROM daily GROUP BY 1, 2, 3)
    SELECT d.event_type, d.month,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(d.day_users) AS BIGINT) AS sum_daily_users,
           CAST(min(m.month_users) AS BIGINT) AS monthly_users
    FROM per_day d
    JOIN (SELECT event_type, month,
                 CAST(sum(bit_count(bm)) AS BIGINT) AS month_users
          FROM monthly_bm GROUP BY 1, 2) m
      ON d.event_type = m.event_type AND d.month = m.month
    GROUP BY 1, 2
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via bitmap chunks — the
    roaring-bitmap OLAP accelerator, stated in pure column math: each
    62-user id range becomes one int64 word (bit i set ⟺ user seen),
    daily (type, day, chunk) words OR-aggregate map-side, and the
    monthly count re-aggregates the DAILY bitmaps with another OR —
    never rescanning raw events, with none of HLL's error bar (compare
    q_agg_hll_rollup). popcount(OR of words) is exact distinct; the
    shuffle carries one word per 62 users per group — the same
    mergeable-summary shape as a materialized-view rollup at 100 TB.
    Emits per (type, month): day count, sum of daily distincts, and
    the exact monthly distinct (≤ sum — the difference is returning
    users)."""
    e = tbl(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("month", "ts").cast("timestamp_ntz").alias("month"),
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
        (F.col("user_id") / 62).cast("long").alias("chunk"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 62 AS INT))").alias(
            "bit"
        ),
    )
    daily = e.groupBy("event_type", "month", "day", "chunk").agg(
        F.bit_or("bit").alias("bm")
    )
    per_day = daily.groupBy("event_type", "month", "day").agg(
        F.sum(F.bit_count("bm")).alias("day_users")
    )
    monthly = (
        daily.groupBy("event_type", "month", "chunk")
        .agg(F.bit_or("bm").alias("bm"))
        .groupBy("event_type", "month")
        .agg(F.sum(F.bit_count("bm")).alias("month_users"))
    )
    return (
        per_day.groupBy("event_type", "month")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("day_users").alias("sum_daily_users"),
        )
        .join(monthly, ["event_type", "month"])
        .select(
            "event_type",
            "month",
            "n_days",
            "sum_daily_users",
            F.col("month_users").alias("monthly_users"),
        )
    )


@query("q_sketch_theta")  # rows-only: sketch estimates are engine-specific
def q_sketch_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra via theta sketches (Datasketches, Spark 4):
    distinct users who click, who purchase, the INTERSECTION (both)
    and the DIFFERENCE (click-only) — the overlap questions HLL cannot
    answer (HLL unions only; theta sketches keep a sample of hashed
    keys so ∩ and \\ compose). Each side is one mergeable sketch
    aggregate (map-side combinable, bounded size); the set algebra
    runs on TWO sketch values, not on user sets. Rows-only: estimates
    are sketch-internal; pytest bounds them against exact counts
    (tests/test_aggregations.py)."""
    e = tbl(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").agg(
        F.theta_sketch_agg("user_id").alias("s")
    )
    purch = e.filter(F.col("event_type") == "purchase").agg(
        F.theta_sketch_agg("user_id").alias("s")
    )
    both = clicks.select(F.col("s").alias("sc")).crossJoin(
        purch.select(F.col("s").alias("sp"))
    )
    return both.select(
        F.theta_sketch_estimate(F.col("sc")).cast("long").alias("n_click"),
        F.theta_sketch_estimate(F.col("sp")).cast("long").alias("n_purchase"),
        F.theta_sketch_estimate(F.theta_intersection("sc", "sp"))
        .cast("long")
        .alias("n_both"),
        F.theta_sketch_estimate(F.theta_difference("sc", "sp"))
        .cast("long")
        .alias("n_click_only"),
        F.theta_sketch_estimate(F.theta_union("sc", "sp"))
        .cast("long")
        .alias("n_either"),
    )


@query("q_sketch_kll")  # rows-only: sketch estimates are engine-specific
def q_sketch_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches (KLL, Datasketches, Spark 4): per-
    priority p50/p95 of order value from one bounded-size sketch per
    group — unlike exact percentiles (full sort) or GK
    `percentile_approx` (not re-mergeable across pre-aggregated
    partials), KLL sketches UNION losslessly, so daily sketches roll
    up to monthly quantiles without rescanning — the quantile analog
    of the HLL rollup (q_agg_hll_rollup). Rows-only; pytest bounds
    the estimates against exact percentiles."""
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("v")
    )
    sk = o.groupBy("o_orderpriority").agg(
        F.kll_sketch_agg_double("v").alias("s"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return sk.select(
        "o_orderpriority",
        "n_rows",
        F.kll_sketch_get_quantile_double(F.col("s"), F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double(F.col("s"), F.lit(0.95)).alias("p95"),
    )
