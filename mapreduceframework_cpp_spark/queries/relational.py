"""Core relational queries (SURVEY.md §2.2-A scans, -B projections/filters,
-F sorts/limits, -G set ops).

Kernel lowering: scans ≙ R2 input splitting (``MapReduceFramework.cpp:79-81``),
projections/filters/CASE ≙ R3 map emitting 0-or-1 rows
(``MapReduceClient.h:57-59``), sort ≙ R5 per-partition sort + merge
(``MapReduceFramework.cpp:92,109``), distinct ≙ R7 (``:109-110``).

Scale notes: every query here is a narrow transform or a TakeOrdered —
no shuffle except where the semantics demand one (distinct/set ops), and
those shuffle on the final, already-projected key set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

# ---------------------------------------------------------------- A. scans


@query(
    "q_scan_parquet",
    oracle="""
    SELECT count(*) AS n_rows,
           min(l_orderkey) AS min_orderkey,
           max(l_orderkey) AS max_orderkey
    FROM lineitem
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan fingerprint: row count + key extrema (proves the whole
    file was read, not a sampled subset)."""
    return tbl(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
    )


@query(
    "q_scan_select_cols",
    oracle="SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem",
)
def q_scan_select_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan — ReadSchema must show exactly these 3 columns."""
    return tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )


# ------------------------------------------------- B. projections / filters


@query(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns (per-row IEEE arithmetic is deterministic, so no
    rounding needed for oracle parity)."""
    li = tbl(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE (l_quantity >= 30 AND l_shipdate >= TIMESTAMP '1998-01-01')
       OR (l_returnflag IN ('R', 'A') AND l_discount < 0.03)
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive + disjunctive predicates; pushed to the parquet scan."""
    li = tbl(spark, sf_dir, "lineitem")
    pred = (
        (F.col("l_quantity") >= 30)
        & (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
    ) | (F.col("l_returnflag").isin("R", "A") & (F.col("l_discount") < 0.03))
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@query(
    "q_case_expr",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS price_band,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def q_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing. Sums go through DECIMAL(18,2) in both engines
    so the aggregate is exact regardless of addition order (float sums are
    order-dependent; decimal sums are not)."""
    orders = tbl(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return (
        orders.select(band.alias("price_band"), "o_totalprice")
        .groupBy("price_band")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


# ------------------------------------------------------ F. sorts / limits


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort (desc+asc) with a unique tie-break, observed
    through the 100-row prefix (the driver's hash is order-insensitive, so
    the LIMIT is what makes sort order verifiable)."""
    return (
        tbl(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10: Spark plans TakeOrderedAndProject — per-partition top-k then
    a k-merge on the driver, no global sort materialization. This is the
    plan shape that survives 100 TB (k rows per task, not a full sort)."""
    return (
        tbl(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ------------------------------------------------------------ G. set ops


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@query(
    "q_union_all",
    oracle="""
    SELECT 'customer' AS src, c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT 'supplier' AS src, s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cust_nations(spark, sf_dir).select(F.lit("customer").alias("src"), "nationkey")
    s = _supp_nations(spark, sf_dir).select(F.lit("supplier").alias("src"), "nationkey")
    return c.unionByName(s)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "q_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys that placed orders but don't have a positive balance —
    chosen over the nations variant because it yields a non-empty result
    (suppliers cover all nations, which made EXCEPT vacuous)."""
    ordering = tbl(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    positive = (
        tbl(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return ordering.subtract(positive)


@query(
    "q_pivot",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user event counts, one column per event
    type. Explicit pivot values skip the extra distinct-scan Spark
    otherwise runs, and make the output schema static — required for the
    oracle and the right call at scale."""
    ev = tbl(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long): three lineitem measures into
    (metric, val) rows keyed by (orderkey, linenumber)."""
    return tbl(spark, sf_dir, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )


@query(
    "q_null_semantics",
    oracle="""
    WITH t AS (SELECT nullif(o_orderstatus, 'P') AS st, o_totalprice
               FROM orders),
    g AS (SELECT st,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(st) AS BIGINT) AS n_nonnull,
                 CAST(coalesce(sum(CASE WHEN o_totalprice > 100000
                                        THEN 1 END), 0) AS BIGINT) AS n_big
          FROM t GROUP BY 1)
    SELECT a.st, a.n_rows, a.n_nonnull, a.n_big, b.n_rows AS n_rows_b
    FROM g a JOIN g b ON a.st IS NOT DISTINCT FROM b.st
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics parity torture: a manufactured NULL group must (1)
    survive GROUP BY as its own group, (2) be skipped by count(col) but
    not count(*), (3) zero-fill through coalesce(sum(CASE..)), and (4)
    match ITSELF through a null-safe equality join (Spark ``<=>`` ==
    SQL ``IS NOT DISTINCT FROM``) — the exact places engines
    historically diverge, pinned by the oracle hash. The null-safe self
    join runs over the 3-row aggregate, so the pathological null×null
    fan-out is structurally bounded."""
    o = tbl(spark, sf_dir, "orders")
    t = o.select(
        F.expr("nullif(o_orderstatus, 'P')").alias("st"), "o_totalprice"
    )
    g = t.groupBy("st").agg(
        F.count("*").alias("n_rows"),
        F.count("st").alias("n_nonnull"),
        F.coalesce(
            F.sum(F.when(F.col("o_totalprice") > 100000, 1)), F.lit(0)
        )
        .cast("long")
        .alias("n_big"),
    )
    a = g.alias("a")
    b = g.select(F.col("st").alias("st_b"), F.col("n_rows").alias("n_rows_b"))
    return a.join(
        F.broadcast(b), F.expr("st <=> st_b")
    ).select("st", "n_rows", "n_nonnull", "n_big", "n_rows_b")
