"""Robust-statistics + dominance surfaces: 2-D skyline (Pareto
frontier), exact weighted median, trimmed/winsorized means, and the
deterministic Poisson bootstrap — the uncertainty-quantification pass
a 100 TB metrics job needs when a closed-form CI doesn't exist.

Each re-expresses a reference-style reduce (`MapReduceClient.h:22-39`
emit2/emit3 over the sort/shuffle kernel, `MapReduceFramework.cpp:
100-133`) as one or two declarative exchanges:

* the skyline collapses the classic O(n²) NOT-EXISTS dominance test to
  ONE global sort window (2-D skyline ≡ running-min over the
  size-descending order) — the textbook distributed-skyline lowering;
* the weighted median is a value-grouped cumulative-weight scan: group
  once on (group, value), cumsum int64 weights in a window, pick the
  first value crossing half the total — exact, no quantile sketch;
* the bootstrap replaces sampling-without-replacement (impossible in
  one distributed pass) with Poisson(1) resample weights derived from
  an md5-seeded uniform, the standard at-scale bootstrap: 32 resample
  means in ONE scan + a 32-group aggregate, fully deterministic so the
  DuckDB oracle reproduces it bit-for-bit.

Scale notes: no query here shuffles more than (group, value) pairs or
B=32 partial aggregates; the skyline's single sort is the only global
exchange and would range-partition cleanly on a cluster; the bootstrap
fan-out is map-side-combined into 32 running sums per partition before
any exchange (the 32× explode never hits the wire).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

#: resample count for the Poisson bootstrap (small enough that the
#: oracle enumerates it; each resample is one aggregation group).
_BOOT_B = 32

#: Poisson(1) CDF thresholds: weight k is assigned when the uniform
#: falls in [CDF(k-1), CDF(k)); identical double literals on both
#: engines, so the inverse-CDF draw is engine-exact.
_POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
]


@query(
    "q_skyline",
    oracle="""
    SELECT a.p_partkey, a.p_brand,
           CAST(a.p_retailprice AS DOUBLE) AS p_retailprice,
           CAST(a.p_size AS INTEGER) AS p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice
        AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: cheapest-for-their-size
    parts no other part strictly dominates (lower-or-equal price AND
    greater-or-equal size, strict in at least one). The oracle states
    the O(n²) NOT-EXISTS definition; the Spark lowering exploits the
    2-D structure with aggregate-first: dominance only depends on the
    per-size MIN price, so a map-side-combined groupBy collapses the
    fact to ≤|distinct sizes| rows, the strict-predecessor running min
    runs as a window over that TINY aggregate (single partition of ~50
    rows — never the fact table), and surviving (size, min-price) pairs
    broadcast back onto the scan. The fact side is never globally
    sorted — the shape that survives 100 TB, vs. the one-partition
    global-sort window a direct translation plans."""
    p = tbl(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    size_min = p.groupBy("p_size").agg(
        F.min("p_retailprice").alias("_min_same")
    )
    # desc range frame [unboundedPreceding, -1] = all rows with size
    # STRICTLY greater than the current row's (over the tiny aggregate)
    w_strict = Window.orderBy(F.desc("p_size")).rangeBetween(
        Window.unboundedPreceding, -1
    )
    frontier = size_min.select(
        "p_size",
        "_min_same",
        F.min("_min_same").over(w_strict).alias("_min_strict"),
    ).filter(
        F.col("_min_strict").isNull()
        | (F.col("_min_strict") > F.col("_min_same"))
    )
    return (
        p.join(F.broadcast(frontier), "p_size")
        .filter(F.col("p_retailprice") == F.col("_min_same"))
        .select("p_partkey", "p_brand", "p_retailprice", "p_size")
    )


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2),
    c AS (
      SELECT l_returnflag, price, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY price
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM g)
    SELECT l_returnflag,
           CAST(min(price) AS DOUBLE) AS weighted_median,
           CAST(max(tot) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cum >= tot
    GROUP BY 1
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag — the
    weighted quantile no built-in sketch provides. Lowering: collapse
    to (group, value) with int64 weight sums FIRST (the only full-data
    shuffle, map-side combinable and bounded by the number of distinct
    prices, not rows), then a per-group cumulative-weight window picks
    the smallest value whose cumulative weight reaches half the total
    (lower weighted median — deterministic, no interpolation). Weights
    quantize to int64 before any sum, so the crossing test is exact
    integer math on both engines."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    # partition on the group key alone: hash(flag) satisfies the
    # clustered distribution of BOTH the (flag, price) aggregate and
    # the flag-partitioned windows, so the whole query runs on ONE
    # exchange instead of two
    g = (
        li.repartition("l_returnflag")
        .groupBy("l_returnflag", "price")
        .agg(F.sum("qty").alias("w"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "price",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_all).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").cast("double").alias("weighted_median"),
            F.max("tot").alias("total_weight"),
        )
    )


def _poisson_case_sql(u_expr: str) -> str:
    """CASE chain mapping a uniform to a Poisson(1) draw (oracle side)."""
    arms = "\n".join(
        f"WHEN {u_expr} < {c!r} THEN {k}"
        for k, c in enumerate(_POISSON1_CDF)
    )
    return f"CASE {arms} ELSE {len(_POISSON1_CDF)} END"


@query(
    "q_bootstrap_ci",
    oracle=f"""
    WITH fan AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents, b
      FROM orders, range(0, {_BOOT_B}) t(b)),
    draw AS (
      SELECT b, cents,
             {_poisson_case_sql(
                 "CAST(concat('0x', substr(md5(concat(CAST(o_orderkey AS "
                 "VARCHAR), '|', CAST(b AS VARCHAR))), 1, 8)) AS BIGINT) "
                 "/ 4294967296.0")} AS w
      FROM fan)
    SELECT CAST(b AS BIGINT) AS resample,
           CAST(sum(w * cents) AS DOUBLE) / (100.0 * sum(w)) AS boot_mean,
           CAST(sum(w) AS BIGINT) AS n_eff
    FROM draw GROUP BY 1
    """,
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order value: {_BOOT_B} resample
    means in ONE scan — the distributed-safe bootstrap (per-row
    Poisson(1) weights ≈ multinomial resampling; no global
    sample-without-replacement pass exists at 100 TB). Each (order,
    resample) weight inverts the Poisson CDF at a uniform derived from
    md5(orderkey|b): deterministic, seedless, identical on any executor
    AND in the DuckDB oracle — resampling as pure column math. Prices
    quantize to int64 cents so every weighted sum is exact integer
    arithmetic; only the final mean divides in double. The {_BOOT_B}×
    explode map-side-combines into {_BOOT_B} running sums per partition
    before the (only) exchange, so the fan-out never hits the wire —
    the spread of `boot_mean` across resamples IS the standard-error
    estimate a downstream report would quote."""
    from mapreduceframework_cpp_spark.operators.common import spread

    # the 32x fan-out + md5 draw is compute-bound per row: spread the
    # narrow scan to full parallelism first (byte-based splitting would
    # run the whole hash stage as one task on a small file)
    o = spread(
        tbl(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ),
        key="o_orderkey",
    )
    fan = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("|"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(2**32))
    )
    # project the uniform ONCE, then invert the CDF against the column —
    # otherwise the CASE chain would inline (and recompute) the md5
    # digest per arm
    drawn = fan.select("b", "cents", u.alias("u"))
    w = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(F.col("u") < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return (
        drawn.select("b", "cents", w.cast("long").alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / (F.lit(100.0) * F.sum("w"))
            ).alias("boot_mean"),
            F.sum("w").alias("n_eff"),
        )
        .select(
            F.col("b").cast("long").alias("resample"), "boot_mean", "n_eff"
        )
    )


@query(
    "q_agg_trimmed",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority AS priority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders),
    kept AS (
      SELECT priority, o_totalprice, n, n // 20 AS k
      FROM r WHERE rn > n // 20 AND rn <= n - n // 20)
    SELECT priority,
           CAST(min(n) AS BIGINT) AS n_rows,
           CAST(min(k) AS BIGINT) AS n_trimmed_each_side,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / (min(n) - 2 * min(k)) AS trimmed_mean,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                + min(k) * (CAST(min(o_totalprice) AS DECIMAL(18,2))
                            + CAST(max(o_totalprice) AS DECIMAL(18,2)))
                AS DOUBLE) / min(n) AS winsorized_mean
    FROM kept GROUP BY 1
    """,
)
def q_agg_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed and winsorized means of order value per priority —
    the outlier-robust location estimates a metrics pipeline quotes
    when raw means are whale-dominated. Exactness: the trim boundary
    is rank-based in a TOTAL order (price, orderkey) so membership is
    deterministic; kept values sum as exact decimals, and the
    winsorized mean re-adds the k clipped rows per side at the kept
    min/max boundary values (decimal adds) — one double division per
    group at the end. One partition-keyed sort window + one aggregate;
    the trim never materializes per-row clips."""
    w_rank = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_n = Window.partitionBy("o_orderpriority")
    r = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    kept = r.filter(
        (F.col("rn") > F.expr("n div 20"))
        & (F.col("rn") <= F.col("n") - F.expr("n div 20"))
    ).select(
        "priority", "o_totalprice", "n", F.expr("n div 20").alias("k")
    )
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return kept.groupBy("priority").agg(
        F.min("n").cast("long").alias("n_rows"),
        F.min("k").cast("long").alias("n_trimmed_each_side"),
        (
            F.sum(dec).cast("double")
            / (F.min("n") - 2 * F.min("k"))
        ).alias("trimmed_mean"),
        (
            (
                F.sum(dec)
                + F.min("k")
                * (
                    F.min("o_totalprice").cast("decimal(18,2)")
                    + F.max("o_totalprice").cast("decimal(18,2)")
                )
            ).cast("double")
            / F.min("n")
        ).alias("winsorized_mean"),
    )


@query(
    "q_survival_km",
    oracle="""
    WITH o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             lead(CAST(o_orderdate AS DATE)) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS nxt
      FROM orders),
    study AS (SELECT max(CAST(o_orderdate AS DATE)) AS study_end FROM orders),
    obs AS (
      SELECT CASE WHEN nxt IS NULL
                  THEN date_diff('day', d, study_end)
                  ELSE date_diff('day', d, nxt) END AS t,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS e
      FROM o CROSS JOIN study),
    grp AS (
      SELECT t, CAST(count(*) AS BIGINT) AS m, CAST(sum(e) AS BIGINT) AS d
      FROM obs GROUP BY 1),
    risk AS (
      SELECT t, m, d,
             (SELECT count(*) FROM obs) -
               coalesce(sum(m) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n
      FROM grp),
    terms AS (
      SELECT t, n, d,
             CASE WHEN d = n THEN CAST(0 AS BIGINT)
                  ELSE CAST(round(ln((n - d) * 1.0 / n) * 1000000000)
                            AS BIGINT) END AS term_nano,
             max(CASE WHEN d = n THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead
      FROM risk WHERE d > 0),
    km AS (
      SELECT t, n, d, dead,
             sum(term_nano) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
               AS cum_nano
      FROM terms)
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n AS BIGINT) AS n_at_risk,
           d AS n_events,
           CASE WHEN dead = 1 THEN 0.0
                ELSE exp(CAST(cum_nano AS DOUBLE) / 1000000000.0)
           END AS survival
    FROM km
    """,
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of customer reorder latency, with
    censoring done right: each order's time-to-next-order is an event,
    each customer's LAST order is censored at the study end (dropping
    it — what a naive average does — biases retention optimistic). The
    estimator's running product Π(1 − dᵤ/nᵤ) is float-disciplined like
    everything here: per-duration ln terms quantize to an int64
    nano-grid, cumulate as exact integers in one ordered window, and
    exp() runs once per row — bit-identical across engines and
    partitionings. Aggregate-first: observations collapse to distinct
    durations (~hundreds of rows) before any window; the at-risk count
    derives from the same tiny frame. One customer-keyed window over
    the fact + one small-frame pipeline."""
    w_next = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    o = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        F.lead(F.col("o_orderdate").cast("date")).over(w_next).alias("nxt"),
    )
    study = tbl(spark, sf_dir, "orders").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("study_end")
    )
    obs = o.crossJoin(F.broadcast(study)).select(
        F.when(
            F.col("nxt").isNull(), F.datediff("study_end", "d")
        )
        .otherwise(F.datediff("nxt", "d"))
        .alias("t"),
        F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("e"),
    )
    grp = obs.groupBy("t").agg(
        F.count(F.lit(1)).alias("m"), F.sum("e").alias("d")
    )
    n_total = obs.agg(F.count(F.lit(1)).alias("n_obs"))
    w_before = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = (
        grp.crossJoin(F.broadcast(n_total))
        .select(
            "t",
            "m",
            "d",
            (
                F.col("n_obs")
                - F.coalesce(F.sum("m").over(w_before), F.lit(0))
            ).alias("n"),
        )
        .filter(F.col("d") > 0)
    )
    term_nano = F.when(F.col("d") == F.col("n"), F.lit(0).cast("long")).otherwise(
        F.round(
            F.log((F.col("n") - F.col("d")) * 1.0 / F.col("n")) * 1000000000
        ).cast("long")
    )
    terms = risk.select(
        "t",
        "n",
        "d",
        term_nano.alias("term_nano"),
        F.max(F.when(F.col("d") == F.col("n"), 1).otherwise(0))
        .over(w_cum)
        .alias("dead"),
    )
    return terms.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n").cast("long").alias("n_at_risk"),
        F.col("d").alias("n_events"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(
            F.exp(
                F.sum("term_nano").over(w_cum).cast("double") / 1000000000.0
            )
        )
        .alias("survival"),
    )


@query(
    "q_agg_theilsen",
    oracle="""
    WITH daily AS (
      SELECT lang,
             CAST(date_diff('day', DATE '2025-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events e JOIN (SELECT DISTINCT user_id % 5 AS uid_mod,
                                 CASE user_id % 5 WHEN 0 THEN 'en'
                                      WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
                                      WHEN 3 THEN 'es' ELSE 'zh' END AS lang
                          FROM events) m
        ON e.user_id % 5 = m.uid_mod
      GROUP BY 1, 2),
    slopes AS (
      SELECT a.lang,
             (b.y - a.y) * 1.0 / (b.x - a.x) AS s
      FROM daily a JOIN daily b
        ON a.lang = b.lang AND b.x > a.x),
    r AS (
      SELECT lang, s,
             row_number() OVER (PARTITION BY lang ORDER BY s) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM slopes)
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_pairs,
           CAST(min(s) AS DOUBLE) AS slope_per_day
    FROM r WHERE rn = (n + 1) // 2
    GROUP BY 1
    """,
)
def q_agg_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the MEDIAN of all pairwise day-over-day
    slopes of each cohort's daily event counts — the outlier-immune
    complement to q_agg_ols_trend (one corrupt day breaks an OLS fit;
    Theil–Sen tolerates ~29% contamination). Aggregate-first makes the
    quadratic harmless: the fact collapses to (cohort, day) counts
    (~30 points per cohort), and the pairwise-slope self-join runs
    over that TINY frame (~435 pairs/cohort), co-partitioned on the
    cohort key — never on raw events. Slopes are single divisions of
    exact int64 deltas (identical doubles cross-engine); the lower
    median picks rank ⌈n/2⌉ in a total sort, deterministic because
    equal doubles are interchangeable."""
    e = tbl(spark, sf_dir, "events")
    lang = (
        F.when(F.col("user_id") % 5 == 0, "en")
        .when(F.col("user_id") % 5 == 1, "de")
        .when(F.col("user_id") % 5 == 2, "fr")
        .when(F.col("user_id") % 5 == 3, "es")
        .otherwise("zh")
    )
    daily = (
        e.select(
            lang.alias("lang"),
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("2025-01-01").cast("date")
            )
            .cast("long")
            .alias("x"),
        )
        .groupBy("lang", "x")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    a = daily.select("lang", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(
        F.col("lang").alias("lang_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    slopes = a.join(
        b, (F.col("lang") == F.col("lang_b")) & (F.col("xb") > F.col("xa"))
    ).select(
        "lang",
        ((F.col("yb") - F.col("ya")) * 1.0 / (F.col("xb") - F.col("xa"))).alias(
            "s"
        ),
    )
    w_rank = Window.partitionBy("lang").orderBy("s")
    w_n = Window.partitionBy("lang")
    r = slopes.select(
        "lang",
        "s",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    return (
        r.filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_pairs"),
            F.min("s").cast("double").alias("slope_per_day"),
        )
    )


@query(
    "q_spend_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS x
      FROM orders GROUP BY 1),
    h AS (SELECT x, count(*) AS c FROM spend GROUP BY 1),
    r AS (
      SELECT x, c,
             coalesce(sum(c) OVER (ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM h),
    s AS (
      SELECT sum(c) AS n, sum(x * c) AS sx,
             sum(x * (c * cum_before + (c * (c + 1)) // 2)) AS six
      FROM r)
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(sx AS BIGINT) AS total_cents,
           CASE WHEN sx = 0 THEN NULL
                ELSE (2.0 * CAST(six AS DOUBLE)
                      - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
           END AS gini
    FROM s
    """,
)
def q_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the concentration audit a
    curation pipeline runs on sources/domains before mixing (a corpus
    whose token mass has Gini → 1 is one domain in a trench coat).
    Histogram-first like q_score_auc: spend collapses to (value,
    count) rows, ranks of a tie-group of size c after C cumulative
    contribute x·(c·C + c(c+1)/2) — a CLOSED FORM over the histogram,
    so Σi·x_i needs no per-row ranks and no global sort of customers.
    All rank sums exact int64 (c(c+1)/2 is integral); the Gini is one
    double formula, NULL on zero mass."""
    spend = (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("x")
        )
    )
    h = spend.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    r = h.select(
        "x", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum_before")
    )
    s = r.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("x") * F.col("c")).alias("sx"),
        F.sum(
            F.col("x")
            * (
                F.col("c") * F.col("cum_before")
                + F.expr("(c * (c + 1)) div 2")
            )
        ).alias("six"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("sx").cast("long").alias("total_cents"),
        F.when(F.col("sx") == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.lit(2.0) * F.col("six").cast("double") - (nn + 1.0) * sx)
            / (nn * sx)
        )
        .alias("gini"),
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH m1 AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_type, e.value, m1.med, abs(e.value - m1.med) AS d
      FROM events e JOIN m1 USING (event_type)),
    m2 AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad
      FROM dev GROUP BY 1)
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n,
           max(dev.med) AS med,
           max(m2.mad) AS mad,
           CAST(sum(CASE WHEN dev.d > 3 * 1.4826 * m2.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN m2 USING (event_type)
    GROUP BY 1
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation — the
    screen that survives what breaks z-scores (a single extreme value
    inflates the stddev and masks every other outlier; the MAD
    doesn't move). Two grouped exact-median aggregates (Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the
    interpolation, proven by q_agg_percentile), each broadcast back
    onto the scan — so the fact table is read twice, shuffled never,
    and the modified-z threshold 3·1.4826·MAD is one double product
    per group evaluated identically in both engines."""
    ev = tbl(spark, sf_dir, "events")
    m1 = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(m1), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    )
    m2 = dev.groupBy("event_type").agg(F.percentile("d", F.lit(0.5)).alias("mad"))
    j = dev.join(F.broadcast(m2), "event_type")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("med").alias("med"),
        F.max("mad").alias("mad"),
        F.sum(
            F.when(F.col("d") > F.lit(3) * F.lit(1.4826) * F.col("mad"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    )


@query(
    "q_ks_drift",
    oracle="""
    WITH h AS (
      SELECT n_chars AS x,
             sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS c2
      FROM documents GROUP BY 1),
    n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM h),
    c AS (
      SELECT x,
             sum(c1) OVER (ORDER BY x) AS f1,
             sum(c2) OVER (ORDER BY x) AS f2
      FROM h),
    d AS (
      SELECT c.x, abs(c.f1 * n.n2 - c.f2 * n.n1) AS dnum, n.n1, n.n2
      FROM c CROSS JOIN n),
    best AS (
      SELECT x, dnum, n1, n2,
             row_number() OVER (ORDER BY dnum DESC, x) AS rn
      FROM d)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(x AS BIGINT) AS argmax_value,
           CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             AS ks_stat
    FROM best WHERE rn = 1
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test between the corpus
    halves' length distributions — the distribution-free drift detector
    (no binning choices, no moments to fool) that monitoring runs
    between snapshots. Histogram-first like the AUC: both empirical
    CDFs come from cumulative windows over the DISTINCT-value
    histogram, and the supremum is found on the CLEARED-DENOMINATOR
    integer |F1·n2 − F2·n1| (exact int64, ≈1e8 at test scale) with a
    value tie-break, so the argmax is bit-deterministic and the single
    division happens once on the winning row."""
    docs = tbl(spark, sf_dir, "documents")
    h = docs.groupBy(F.col("n_chars").alias("x")).agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)).alias("c2"),
    )
    n = h.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = h.select(
        "x",
        F.sum("c1").over(wc).alias("f1"),
        F.sum("c2").over(wc).alias("f2"),
    )
    d = c.crossJoin(F.broadcast(n)).select(
        "x",
        F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")).alias("dnum"),
        "n1",
        "n2",
    )
    w = Window.orderBy(F.desc("dnum"), "x")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("x").cast("long").alias("argmax_value"),
            (
                F.col("dnum").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("ks_stat"),
        )
    )


@query(
    "q_mannwhitney",
    oracle="""
    WITH j AS (
      SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS v,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS a,
             CASE WHEN c.c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS b
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
    h AS (SELECT v, sum(a) AS ca, sum(b) AS cb FROM j GROUP BY 1),
    c AS (
      SELECT v, ca, cb,
             coalesce(sum(cb) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS b_below
      FROM h),
    u AS (
      SELECT sum(ca) AS n1, sum(cb) AS n2,
             sum(2 * ca * b_below + ca * cb) AS u2
      FROM c)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(u2 AS BIGINT) AS u2,
           CAST(u2 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             AS effect_size
    FROM u
    """,
)
def q_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann–Whitney rank-sum test: do BUILDING and MACHINERY
    customers spend from the same distribution? — the nonparametric
    companion to the KS drift test (KS finds ANY shape difference; U
    measures stochastic dominance, and U/(n1·n2) is the
    common-language effect size: the probability a random BUILDING
    order exceeds a random MACHINERY one). Identical machinery to
    q_score_auc — the tie-aware doubled-U over the value histogram,
    cumulative window over distinct exact-cents values, never a global
    sort of raw rows; one final division."""
    o = tbl(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    c = tbl(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "v",
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("a"),
        F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0).alias("b"),
    )
    h = j.groupBy("v").agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cc = h.select(
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(w), F.lit(0)).alias("b_below"),
    )
    u = cc.agg(
        F.sum("ca").alias("n1"),
        F.sum("cb").alias("n2"),
        F.sum(2 * F.col("ca") * F.col("b_below") + F.col("ca") * F.col("cb")).alias(
            "u2"
        ),
    )
    return u.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("u2").cast("long").alias("u2"),
        (
            F.col("u2").cast("double")
            / (F.lit(2.0) * F.col("n1").cast("double") * F.col("n2").cast("double"))
        ).alias("effect_size"),
    )
