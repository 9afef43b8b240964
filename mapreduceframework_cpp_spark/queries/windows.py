"""Window function queries (SURVEY.md §2.2-E).

Kernel lowering: shuffle on the partition key (R6) + per-group ordered
fold in reduce (R8 — ``reduce`` receives the whole group as a vector,
``MapReduceClient.h:61-64``; a window scan is exactly that fold).

Determinism rules (FIXTURES.md §3): every ORDER BY carries a unique
tie-break key; every aggregate frame is pinned explicitly (Spark's
default frame with orderBy is RANGE, DuckDB's too, but pinning removes
doubt); running sums go through DECIMAL so prefix sums are exact.

Rank-family outputs are cast to BIGINT to match DuckDB's natural window
return type.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


@query(
    "q_win_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "q_win_topk_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment. At scale this is the window-based
    top-k: one shuffle on the group key, per-group heap — never a global
    sort."""
    orders = tbl(spark, sf_dir, "orders")
    customer = tbl(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@query(
    "q_win_running",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS n_so_far
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer. Decimal prefix sums + a unique
    tie-break (32 customers have same-day orders) make every prefix value
    exact and order-identical across engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.count("*").over(w).alias("n_so_far"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h,
           count(*) OVER w AS n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1h RANGE frame. Ordered by epoch *microseconds* (bigint)
    in both engines — DuckDB's epoch() returns fractional seconds while
    Spark's unix_timestamp truncates, which would put sub-second events in
    different frames; µs integers remove the ambiguity."""
    ev = tbl(spark, sf_dir, "events").withColumn(
        "_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


@query(
    "q_win_ntile_pct",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "q_win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey)  OVER w AS priciest_order,
           nth_value(o_orderkey, 2) OVER w AS second_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over a pinned full-partition
    frame (the default orderBy frame ends at the current row, which
    makes last_value a silent identity — the classic window footgun;
    the explicit UNBOUNDED FOLLOWING frame is both correct and what the
    oracle states)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w).alias("priciest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest"),
    )


@query(
    "q_win_distinct_count",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(count(DISTINCT event_type)
                OVER (PARTITION BY user_id) AS BIGINT) AS n_types_user
    FROM events
    """,
)
def q_win_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count as a window column. Spark rejects DISTINCT
    aggregates over windows, so this uses the standard emulation:
    dense_rank over (partition, ORDER BY value) reaches its maximum at
    the number of distinct values — max(dense_rank) over the bare
    partition is the windowed COUNT(DISTINCT). Two window passes over
    ONE sort+exchange (same partition key); DuckDB supports the literal
    form, which is the oracle.

    NULL handling: see :func:`with_windowed_count_distinct`."""
    ev = tbl(spark, sf_dir, "events")
    return with_windowed_count_distinct(
        ev, "user_id", "event_type", "n_types_user"
    ).select("event_id", "user_id", "event_type", "n_types_user")


def with_windowed_count_distinct(
    df: DataFrame, part: str, col: str, out: str
) -> DataFrame:
    """Append ``out`` = COUNT(DISTINCT col) OVER (PARTITION BY part).

    dense_rank counts a NULL as a distinct value (NULLs sort first,
    taking rank 1) while COUNT(DISTINCT) ignores NULLs, so partitions
    containing a NULL subtract one — exact because NULLs occupy exactly
    one dense rank when present."""
    w_rank = Window.partitionBy(part).orderBy(col)
    w_all = Window.partitionBy(part)
    has_null = F.max(F.col(col).isNull().cast("int")).over(w_all)
    return (
        df.withColumn("_dr", F.dense_rank().over(w_rank))
        .withColumn(out, (F.max("_dr").over(w_all) - has_null).cast("long"))
        .drop("_dr")
    )


@query(
    "q_win_median",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) OVER (
                  PARTITION BY o_orderpriority
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS med5
    FROM orders
    """,
)
def q_win_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-row median of order value per priority class — the
    robust rolling statistic (median smoothing) that mean-based running
    windows can't give. ``percentile`` as a WINDOW aggregate over a
    bounded ROWS frame: Spark keeps the frame per row (5 values), so
    cost is O(rows × frame), one sort+exchange on the partition key.
    Linear-interpolation semantics match DuckDB's quantile_cont exactly
    (same bit-identical discipline as q_agg_percentile); (o_orderdate,
    o_orderkey) ordering is unique, so frames are deterministic."""
    o = tbl(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("percentile(o_totalprice, 0.5)").over(w).cast("double").alias("med5"),
    )
