"""Aggregation queries (SURVEY.md §2.2-D).

Kernel lowering: R6 shuffle group-by-key (``MapReduceFramework.cpp:100-133``)
+ R8 reduce fold (``:135-149``); Spark's partial HashAggregate before the
exchange plays the reference client's manual combiner role (R16,
``Sample Client/SampleClient.cpp:35-44``) automatically.

Float discipline (SURVEY.md §7): every SUM over doubles goes through
DECIMAL(18,2) in both engines — decimal addition is exact and therefore
independent of partition/addition order, which float addition is not.
AVG is computed as exact-decimal-sum ÷ count in both engines so the final
double division has bit-identical operands.

Scale notes: all queries are single-shuffle (partial→final aggregate);
count(DISTINCT) plans as Spark's two-phase expand+aggregate which scales
without driver involvement; collect_list groups are bounded (orders per
customer), never whole-partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


def _dsum(col, alias: str):
    """Exact, order-independent sum of a double column (see module doc)."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)


@query(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the flagship grouped aggregation."""
    li = tbl(spark, sf_dir, "lineitem")
    # Decimal arithmetic on decimal-cast BASE columns (which hold exact
    # 2dp values, so the double→decimal cast is unambiguous in any
    # engine). Casting a *computed* double product to decimal instead
    # rounds .xx5-adjacent values differently in Spark vs DuckDB.
    disc_price_dec = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity", "sum_qty"),
        _dsum("l_extendedprice", "sum_base_price"),
        F.sum(disc_price_dec).cast("double").alias("sum_disc_price"),
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@query(
    "q_agg_global",
    oracle="""
    SELECT count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregates (single group, two-stage partial/final)."""
    return tbl(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_orders"),
        _dsum("o_totalprice", "sum_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ R7 key dedup (``MapReduceFramework.cpp:109-110``), with value
    equality instead of the reference's pointer identity."""
    return tbl(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), _dsum("o_totalprice", "sum_price"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           GROUPING(c_nationkey, c_mktsegment) AS gid,
           count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY ROLLUP (c_nationkey, c_mktsegment)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "customer")
        .rollup("c_nationkey", "c_mktsegment")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_cust"),
            _dsum("c_acctbal", "sum_bal"),
        )
        .select("c_nationkey", "c_mktsegment", "gid", "n_cust", "sum_bal")
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_items"),
            _dsum("l_quantity", "sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_items", "sum_qty")
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders_gsets")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders_gsets
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query("q_agg_approx_distinct")  # rows-only: HLL estimates differ per engine
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). No SQL oracle — the estimate
    is engine-specific; tests assert ±2.5% of the exact count instead."""
    return tbl(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT o_custkey,
           array_to_string(list(o_orderpriority ORDER BY o_orderpriority), '|')
               AS priorities,
           array_to_string(list(DISTINCT o_orderstatus ORDER BY o_orderstatus), '|')
               AS statuses
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/collect_set, sorted for determinism (collection order
    is partition-dependent otherwise) and serialized to '|'-joined
    strings: the external verifier's canonicalizer sorts on column
    values, so the final projection must emit scalars, not arrays."""
    return (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("o_orderpriority"))).alias(
                "priorities"
            ),
            F.concat_ws("|", F.sort_array(F.collect_set("o_orderstatus"))).alias(
                "statuses"
            ),
        )
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.5) AS median,
           quantile_cont(o_totalprice, 0.75) AS p75,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (linear interpolation — Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the definition, so
    values hash-match). ``approx_percentile`` is the sketch-based scale
    path when exactness isn't required; the exact form still
    distributes (sort within group)."""
    o = tbl(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("median"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("p75"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_approx_topk",
    oracle="""
    WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
    SELECT event_type AS item, CAST(n AS BIGINT) AS est_count
    FROM c
    """,
)
def q_agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based heavy hitters (Spark 4 ``approx_top_k`` —
    DataSketches frequent-items): heavy hitters of event_type with
    estimated counts from ONE mergeable sketch pass, no full groupBy at
    100 TB. k equals the column's full cardinality (5 ≪ sketch
    capacity), so the sketch is EXACT and boundary ties cannot change
    membership — the oracle is the exact count set, equality-tight (the
    q_agg_approx_distinct discipline with the ±bound closed to zero)."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("est_count"),
        )
    )
