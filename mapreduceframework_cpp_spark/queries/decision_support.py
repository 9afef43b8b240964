"""Decision-support query shapes II (TPC-H Q11/Q12/Q14/Q18/Q22 analogues).

Round-3 widening of the analytic surface begun in queries/analytics.py
(Q3/Q5/Q7/Q10/Q17 shapes): global-threshold HAVING, date-interval lag
predicates, conditional revenue shares, IN-subquery fact filters and
NOT-EXISTS anti joins — the remaining classic warehouse shapes a user of
the reference engine would expect from a complete SQL surface
(composition of SURVEY.md §2.1 primitives R3/R5/R8/R15, lowered exactly
like `MapReduceFramework.cpp:69-149`'s map→shuffle→reduce chain, twice
or more in sequence).

Scale notes: every dimension side broadcasts; each query keeps exactly
one fact shuffle (orders⋈lineitem on orderkey, or a groupBy on the
fact key); global scalars travel driver-free as 1-row broadcast
cross joins. Decimal-exact sums (order-independent) feed double-typed
outputs so both engines agree bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

_REV_SQL = (
    "sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(18,4))))"
)


def _rev():
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )


@query(
    "q_tpch_q11_shape",
    oracle=f"""
    WITH nat_rev AS (
      SELECT n_name, {_REV_SQL} AS rev
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name, CAST(rev AS DOUBLE) AS revenue
    FROM nat_rev
    WHERE CAST(rev AS DOUBLE) >
          (SELECT CAST(sum(rev) AS DOUBLE) * 0.02 FROM nat_rev)
    """,
)
def q_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important-stock value): supplier nations whose
    revenue exceeds 2% of global revenue. The global threshold is a
    1-row aggregate attached via broadcast cross join — no second scan
    of lineitem (the per-nation aggregate is reused for both sides) and
    no driver round-trip. Threshold compare happens in double on both
    engines (decimal*0.02 would type-drift)."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nat_rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).alias("rev"))
    )
    total = nat_rev.agg(
        (F.sum("rev").cast("double") * F.lit(0.02)).alias("_thresh")
    )
    return (
        nat_rev.crossJoin(F.broadcast(total))
        .filter(F.col("rev").cast("double") > F.col("_thresh"))
        .select("n_name", F.col("rev").cast("double").alias("revenue"))
    )


@query(
    "q_tpch_q12_shape",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def q_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority): lineitems shipped >60
    days after order placement, split by order priority per year. The
    lag predicate compares two columns of the SAME joined row — a
    residual filter on the one orders⋈lineitem shuffle, never a second
    pass. Conditional counts are a map-side-combinable sum of 0/1."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q14_shape",
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))
                         ELSE 0 END) AS DOUBLE) AS promo_rev,
           CAST({_REV_SQL} AS DOUBLE) AS total_rev,
           CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,4)))
                         ELSE 0 END) AS DOUBLE)
           / CAST({_REV_SQL} AS DOUBLE) AS promo_share
    FROM lineitem, part
    WHERE l_partkey = p_partkey
    GROUP BY 1
    """,
)
def q_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): monthly share of revenue from
    PROMO-type parts. part broadcasts into the lineitem scan, so the
    only exchange is the month groupBy; both sums come out of ONE
    aggregate (no self-join), decimal-exact, and the share divides in
    double identically on both engines."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    out = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.date_trunc("month", "l_shipdate")
            .cast("timestamp_ntz")
            .alias("ship_month")
        )
        .agg(
            F.sum(promo).cast("double").alias("promo_rev"),
            F.sum(_rev()).cast("double").alias("total_rev"),
        )
    )
    return out.select(
        "ship_month",
        "promo_rev",
        "total_rev",
        (F.col("promo_rev") / F.col("total_rev")).alias("promo_share"),
    )


@query(
    "q_tpch_q18_shape",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY 1
                         HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY 1, 2, 3, 4
    ORDER BY total_qty DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def q_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): top-50 orders whose
    total quantity exceeds 150 units. The IN-subquery lowers to a
    groupBy(orderkey) + semi join — both sides partition on orderkey,
    so AQE can plan the semi join shuffle-free against the re-aggregate;
    customer broadcasts at the end. Deterministic tie-break on
    o_orderkey keeps the LIMIT stable across engines."""
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_tq"))
        .filter(F.col("_tq") > 150)
        .select(F.col("l_orderkey").alias("_bigkey"), "_tq")
    )
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == F.col("_bigkey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("_tq").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "q_tpch_q22_shape",
    oracle="""
    WITH pos AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0)
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg_bal FROM pos)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales opportunity): wealthy customers
    with no recent orders, aggregated by nation. Composes the global
    scalar (decimal-exact mean over positive balances, broadcast-
    attached), a LEFT ANTI join against recent orders (the NOT EXISTS
    lowering — orders is pre-filtered on date BEFORE the anti join so
    the build side shrinks), and a broadcast nation rollup."""
    c = tbl(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    recent = (
        tbl(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


@query(
    "q_orders_cohort",
    oracle="""
    WITH f AS (SELECT o_custkey,
                      min(date_trunc('month', o_orderdate)) AS cohort
               FROM orders GROUP BY 1)
    SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
           CAST(date_diff('month', f.cohort,
                          date_trunc('month', o.o_orderdate)) AS BIGINT)
             AS months_since,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS active_custs,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o JOIN f ON o.o_custkey = f.o_custkey
    GROUP BY 1, 2
    """,
)
def q_orders_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention/revenue matrix: customers grouped by first-order
    month, activity and revenue tracked by months-since-acquisition.
    The first-order aggregate and the fact join both hash on custkey —
    one partitioning reused across the two stages (AQE keeps them
    co-located); months_since is exact month arithmetic on truncated
    timestamps, identical in both engines."""
    o = tbl(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    month = F.date_trunc("month", "o_orderdate").cast("timestamp_ntz")
    f = o.groupBy("o_custkey").agg(F.min(month).alias("cohort"))
    return (
        o.join(f, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(month, F.col("cohort"))
            .cast("long")
            .alias("months_since"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("active_custs"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "q_orders_abc",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey, {_REV_SQL} AS rev_dec,
             CAST({_REV_SQL} AS DOUBLE) AS rev
      FROM lineitem GROUP BY 1),
    r AS (
      SELECT l_partkey, rev_dec, rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             sum(rev) OVER () AS total
      FROM pr),
    c AS (
      SELECT l_partkey, rev_dec,
             CASE WHEN cum / total <= 0.8 THEN 'A'
                  WHEN cum / total <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM r)
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_dec) AS DOUBLE) AS class_rev
    FROM c GROUP BY 1
    """,
)
def q_orders_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: parts covering
    the first 80% of cumulative revenue are class A, the next 15% B,
    the tail C. The running share is a sequential window sum in a FIXED
    total order (rev DESC, partkey tie-break), so the double cumsum is
    bit-identical in both engines; the window runs over the per-part
    aggregate (one row per part), never the raw fact table. Class
    revenue re-sums the DECIMAL per-part values (order-independent) —
    summing the double would hash on partition-dependent addition
    order."""
    li = tbl(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("rev_dec"))
    pr = pr.withColumn("rev", F.col("rev_dec").cast("double"))
    w_cum = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    c = pr.select(
        "l_partkey",
        "rev_dec",
        (F.sum("rev").over(w_cum) / F.sum("rev").over(w_all)).alias("_share"),
    ).select(
        "l_partkey",
        "rev_dec",
        F.when(F.col("_share") <= 0.8, "A")
        .when(F.col("_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return c.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.sum("rev_dec").cast("double").alias("class_rev"),
    )


@query(
    "q_tpch_q21_shape",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_shipdate > o_orderdate
                                      + INTERVAL 90 DAY
                                 THEN l_suppkey END) AS n_late_supp,
             min(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN l_suppkey END) AS late_supp
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1)
    SELECT s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM per_order
    JOIN supplier ON s_suppkey = late_supp
    WHERE n_supp > 1 AND n_late_supp = 1
    GROUP BY 1
    """,
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept waiting): on finished
    multi-supplier orders, blame the SOLE supplier that shipped >90
    days late. The textbook form is a correlated EXISTS + NOT EXISTS
    pair per lineitem; the scalable lowering used here folds both into
    ONE aggregate over the order's lineitems (distinct-supplier count,
    distinct-late-supplier count, and the blamed key as a conditional
    MIN — well-defined because the kept orders have exactly one late
    supplier), so the fact table is scanned once and shuffled once on
    orderkey. supplier broadcasts at the end."""
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias(
                "n_late_supp"
            ),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q_tpch_q2_shape",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / sum(CAST(l_quantity AS DECIMAL(18,2))) AS unit_price
      FROM lineitem GROUP BY 1, 2),
    best AS (
      SELECT l_partkey, l_suppkey, unit_price,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY unit_price, l_suppkey) AS rn
      FROM cost)
    SELECT p.p_partkey, p.p_type, s.s_name, n.n_name,
           b.unit_price AS best_unit_price
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE b.rn = 1 AND p.p_size >= 40
    """,
)
def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for each large part, the
    supplier with the lowest realized unit price, attributed with its
    nation. The correlated MIN subquery lowers to an argmin window over
    the (part, supplier) aggregate — one fact shuffle for the
    aggregate, one partition-key window, then broadcast dimension
    attribution. Unit price divides exact decimal sums in double
    (identical both engines); (unit_price, suppkey) ordering makes the
    argmin deterministic."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_size") >= 40).select(
        "p_partkey", "p_type"
    )
    s = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        ).alias("unit_price")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "p_partkey",
            "p_type",
            "s_name",
            "n_name",
            F.col("unit_price").alias("best_unit_price"),
        )
    )


@query(
    "q_tpch_q4_shape",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY 1
    """,
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in one half-year
    having at least one lineitem shipped >30 days after placement. The
    EXISTS lowers to a LEFT SEMI join whose condition spans both tables
    (equi key + cross-table date comparison as the residual); the date
    filter prunes orders BEFORE the semi join."""
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_tpch_q6_shape",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS forecast_revenue_increase
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 10
    """,
)
def q_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): a pure scan-
    aggregate whose selective predicates (date range, discount band,
    quantity cap) must ALL reach the parquet reader — the query is a
    pushdown benchmark as much as a revenue sum. One row out, decimal-
    exact product sum."""
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 10)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,4)")
            )
            .cast("double")
            .alias("forecast_revenue_increase")
        )
    )


@query(
    "q_tpch_q15_shape",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, {_REV_SQL} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE CAST(r.total_rev AS DOUBLE) =
          (SELECT max(CAST(total_rev AS DOUBLE)) FROM rev)
    """,
)
def q_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    quarterly revenue. The CREATE VIEW + max-subquery of the original
    is one per-supplier aggregate reused for both the rows and the
    1-row global max (broadcast cross join — the q11 global-threshold
    pattern); the max compares in double on both engines."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    mx = rev.agg(
        F.max(F.col("total_rev").cast("double")).alias("_max_rev")
    )
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev").cast("double") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
        )
    )


@query(
    "q_brand_yoy",
    oracle="""
    WITH r AS (
      SELECT p_brand,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))))
                  AS DOUBLE) AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2)
    SELECT p_brand, yr, rev,
           lag(rev) OVER (PARTITION BY p_brand ORDER BY yr) AS prev_rev,
           (rev - lag(rev) OVER (PARTITION BY p_brand ORDER BY yr))
           / lag(rev) OVER (PARTITION BY p_brand ORDER BY yr) AS yoy_growth
    FROM r
    """,
)
def q_brand_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: per-brand yearly revenue with
    year-over-year growth — the lag-over-aggregate BI shape. The
    window runs over the tiny (brand, year) aggregate (the only fact
    shuffle is the aggregate itself); growth divides the SAME two
    decimal-exact doubles in both engines; first year's growth is NULL
    in both."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand")
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(F.sum(_rev()).cast("double").alias("rev"))
    )
    w = Window.partitionBy("p_brand").orderBy("yr")
    prev = F.lag("rev").over(w)
    return r.select(
        "p_brand",
        "yr",
        "rev",
        prev.alias("prev_rev"),
        ((F.col("rev") - prev) / prev).alias("yoy_growth"),
    )


@query(
    "q_supplier_hhi",
    oracle=f"""
    WITH r AS (
      SELECT p_type, l_suppkey, {_REV_SQL} AS rev
      FROM lineitem, part
      WHERE l_partkey = p_partkey
      GROUP BY 1, 2),
    t AS (SELECT p_type, l_suppkey, rev,
                 sum(rev) OVER (PARTITION BY p_type) AS total
          FROM r),
    q AS (SELECT p_type,
                 CAST(round(pow(CAST(rev AS DOUBLE) / CAST(total AS DOUBLE),
                                2) * 1000000000000) AS BIGINT) AS hq
          FROM t)
    SELECT p_type,
           CAST(sum(hq) AS DOUBLE) / 1000000000000 AS hhi,
           CAST(count(*) AS BIGINT) AS n_suppliers
    FROM q GROUP BY 1
    """,
)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration audit: Herfindahl–Hirschman index of
    supplier revenue shares per part type (1/n = perfect competition,
    1.0 = monopoly) — the concentration metric sourcing risk reviews
    use. Shares divide decimal-exact revenue by the windowed total
    (identical doubles both engines); each squared share quantizes to a
    1e-12 grid BEFORE the cross-supplier sum, so the index is
    order-independent."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_type")
    r = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("p_type")
    share = F.col("rev").cast("double") / F.sum("rev").over(w).cast("double")
    hq = F.round(F.pow(share, 2) * F.lit(1000000000000.0)).cast("long")
    return (
        r.withColumn("hq", hq)
        .groupBy("p_type")
        .agg(
            (F.sum("hq").cast("double") / 1000000000000).alias("hhi"),
            F.count("*").alias("n_suppliers"),
        )
    )


@query(
    "q_orders_reorder_gap",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             CAST(round((epoch(o_orderdate)
                         - epoch(lag(o_orderdate) OVER
                             (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey)))
                        / 86400.0 * 1000000) AS BIGINT) AS gap_udays
      FROM orders),
    f AS (SELECT CAST(gap_udays AS DOUBLE) / 1000000 AS gap_days
          FROM g WHERE gap_udays IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(quantile_cont(gap_days, 0.5) AS DOUBLE) AS p50_days,
           CAST(quantile_cont(gap_days, 0.9) AS DOUBLE) AS p90_days,
           CAST(max(gap_days) AS DOUBLE) AS max_days
    FROM f
    """,
)
def q_orders_reorder_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution: per-customer gaps between
    consecutive orders (lag over one custkey-partitioned window),
    described by exact percentiles — the repeat-purchase-cadence
    report behind churn models. Gaps quantize to integer micro-days
    before the percentile pass so every interpolation input is
    identical across engines."""
    o = tbl(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    sec = F.col("o_orderdate").cast("timestamp").cast("double")
    prev = F.lag(sec).over(w)
    gap_udays = F.round((sec - prev) / 86400.0 * 1000000).cast("long")
    f = (
        o.withColumn("gap_udays", gap_udays)
        .filter(F.col("gap_udays").isNotNull())
        .select((F.col("gap_udays").cast("double") / 1000000).alias("gap_days"))
    )
    return f.agg(
        F.count("*").alias("n_gaps"),
        F.expr("percentile(gap_days, 0.5)").cast("double").alias("p50_days"),
        F.expr("percentile(gap_days, 0.9)").cast("double").alias("p90_days"),
        F.max("gap_days").cast("double").alias("max_days"),
    )


@query(
    "q_order_size_dist",
    oracle="""
    WITH g AS (SELECT l_orderkey, count(*) AS n_lines
               FROM lineitem GROUP BY 1)
    SELECT CAST(n_lines AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) AS DOUBLE)
           / sum(count(*)) OVER () AS frac_orders
    FROM g GROUP BY 1
    """,
)
def q_order_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size distribution: how many lineitems orders carry — the
    fan-out histogram that sizes join plans (a shifted distribution
    here changes every orders⋈lineitem estimate). Two cheap aggregates;
    the share window runs over the ≤7-row histogram."""
    li = tbl(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    h = g.groupBy(F.col("n_lines").cast("long").alias("n_lines")).agg(
        F.count("*").alias("n_orders")
    )
    w = Window.partitionBy()
    return h.select(
        "n_lines",
        "n_orders",
        (F.col("n_orders").cast("double") / F.sum("n_orders").over(w)).alias(
            "frac_orders"
        ),
    )


@query(
    "q_cohort_ltv",
    oracle="""
    WITH om AS (
      SELECT o_custkey,
             CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS midx,
             CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS cents
      FROM orders),
    coh AS (SELECT o_custkey, min(midx) AS cohort FROM om GROUP BY 1),
    cells AS (
      SELECT coh.cohort, om.midx - coh.cohort AS age,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(om.cents) AS BIGINT) AS rev_cents
      FROM om JOIN coh USING (o_custkey)
      GROUP BY 1, 2)
    SELECT cohort, CAST(age AS BIGINT) AS age,
           n_orders, rev_cents,
           CAST(sum(rev_cents) OVER (PARTITION BY cohort ORDER BY age
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_rev_cents
    FROM cells
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV matrix: customers grouped by first-order month, each
    cohort's revenue tracked by months-since-acquisition with a running
    cumulative — the lifetime-value triangle every subscription /
    commerce warehouse reports. Months are exact integer indices
    (year*12+month — no months_between floats, no calendar dialect),
    revenue is exact int64 cents, and the cumulative is a ROWS window
    over the tiny (cohort × age) aggregate. Scale shape: one shuffle
    on custkey for the cohort assignment (co-partitioned with the
    fact join — Catalyst reuses the exchange), one small-key
    aggregate, window over ~85² cells max."""
    om = tbl(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("midx"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).alias("cents"),
    )
    coh = om.groupBy("o_custkey").agg(F.min("midx").alias("cohort"))
    cells = (
        om.join(coh, "o_custkey")
        .groupBy("cohort", (F.col("midx") - F.col("cohort")).alias("age"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "cohort",
        F.col("age").cast("long").alias("age"),
        "n_orders",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
    )


@query(
    "q_ols_discount_slope",
    oracle="""
    WITH d AS (
      SELECT l_returnflag,
             CAST(round(l_discount * 100) AS BIGINT) AS x,
             CAST(round(l_quantity) AS BIGINT) AS y
      FROM lineitem),
    s AS (
      SELECT l_returnflag, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM d GROUP BY 1)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE (CAST(sy AS DOUBLE)
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) END AS intercept
    FROM s
    """,
)
def q_ols_discount_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed simple linear regression (quantity ~ discount per
    return flag) by sufficient statistics — THE textbook MapReduce
    regression: one partial-aggregated pass accumulates (n, Σx, Σy,
    Σxy, Σx²) as exact int64 (discount quantized to integer points,
    both engines round the same doubles), and slope/intercept are
    closed-form double expressions over those exact sums. No iterative
    solver, no gradient steps, perfectly mergeable across 100 TB of
    partitions; degenerate (zero-variance-x) groups NULL out."""
    d = tbl(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.round("l_quantity").cast("long").alias("y"),
    )
    s = d.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cov.cast("double") / varx.cast("double")
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.when(varx == 0, F.lit(None).cast("double")).otherwise(slope).alias(
            "slope"
        ),
        F.when(varx == 0, F.lit(None).cast("double"))
        .otherwise(
            (
                F.col("sy").cast("double")
                - slope * F.col("sx").cast("double")
            )
            / n.cast("double")
        )
        .alias("intercept"),
    )


@query(
    "q_revenue_bridge",
    oracle="""
    WITH li AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CAST(round(l.l_discount * 100) AS BIGINT) AS d,
             CAST(round(l.l_tax * 100) AS BIGINT) AS t
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT month,
           CAST(sum(cents) AS BIGINT) AS gross_cents,
           round(CAST(sum(cents * d) AS DOUBLE) / 100.0, 2) AS discount_cents,
           round(CAST(sum(cents * (100 - d) * t) AS DOUBLE) / 10000.0, 2)
             AS tax_cents,
           round(CAST(sum(cents * (100 - d) * (100 + t)) AS DOUBLE)
                 / 10000.0, 2) AS net_cents
    FROM li GROUP BY 1
    """,
)
def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (gross → discounts → tax → net waterfall) per
    month — the finance decomposition that reconciles the P&L. Every
    component accumulates as EXACT int64 products (cents × integer
    discount/tax points; max term ≈ 1e11, sums ≈ 1e17 — no overflow,
    no float sums), and each output divides ONCE at the end — so the
    bridge identity net = gross − discounts + tax-on-discounted holds
    to the cent in both engines. One co-partitioned fact join + one
    month-key aggregate."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("t"),
    )
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate")
        .cast("timestamp_ntz")
        .alias("month"),
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    c, d, t = F.col("cents"), F.col("d"), F.col("t")
    return j.groupBy("month").agg(
        F.sum(c).cast("long").alias("gross_cents"),
        F.round(F.sum(c * d).cast("double") / 100.0, 2).alias("discount_cents"),
        F.round(F.sum(c * (100 - d) * t).cast("double") / 10000.0, 2).alias(
            "tax_cents"
        ),
        F.round(
            F.sum(c * (100 - d) * (100 + t)).cast("double") / 10000.0, 2
        ).alias("net_cents"),
    )


@query(
    "q_mix_shift",
    oracle="""
    WITH y AS (
      SELECT o_orderpriority,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             count(*) AS q,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS rev
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2),
    p AS (
      SELECT a.o_orderpriority,
             a.q AS q1, b.q AS q2, a.rev AS rev1, b.rev AS rev2
      FROM (SELECT * FROM y WHERE yr = 1996) a
      JOIN (SELECT * FROM y WHERE yr = 1997) b USING (o_orderpriority))
    SELECT o_orderpriority,
           CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
           CAST(rev1 AS BIGINT) AS rev1_cents,
           CAST(rev2 AS BIGINT) AS rev2_cents,
           CAST(rev2 - rev1 AS BIGINT) AS delta_cents,
           round(CAST((q2 - q1) * rev1 AS DOUBLE) / CAST(q1 AS DOUBLE), 2)
             AS volume_effect,
           round(CAST(rev2 * q1 - q2 * rev1 AS DOUBLE) / CAST(q1 AS DOUBLE),
                 2) AS price_effect
    FROM p
    """,
)
def q_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume decomposition of the year-over-year revenue change
    per order priority: ΔRev splits into a VOLUME effect ((q2−q1)
    valued at last year's average price) and a PRICE effect (this
    year's volume times the average-price change) — and the two
    reconcile to ΔRev exactly in the cleared-denominator forms used
    here ((q2−q1)·rev1/q1 and (rev2·q1 − q2·rev1)/q1 share the q1
    denominator; numerators are exact int64 products ≈ 1e17). The
    fact collapses to (priority, year) in one partial-agg shuffle;
    the decomposition is per-segment single-division arithmetic, no
    cross-row double sums."""
    o = tbl(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    y = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").alias("yr")
    ).agg(
        F.count(F.lit(1)).alias("q"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("rev"),
    )
    a = y.filter(F.col("yr") == 1996).select(
        "o_orderpriority", F.col("q").alias("q1"), F.col("rev").alias("rev1")
    )
    b = y.filter(F.col("yr") == 1997).select(
        "o_orderpriority", F.col("q").alias("q2"), F.col("rev").alias("rev2")
    )
    p = a.join(b, "o_orderpriority")
    q1, q2 = F.col("q1"), F.col("q2")
    r1, r2 = F.col("rev1"), F.col("rev2")
    return p.select(
        "o_orderpriority",
        q1.cast("long").alias("q1"),
        q2.cast("long").alias("q2"),
        r1.cast("long").alias("rev1_cents"),
        r2.cast("long").alias("rev2_cents"),
        (r2 - r1).cast("long").alias("delta_cents"),
        F.round(((q2 - q1) * r1).cast("double") / q1.cast("double"), 2).alias(
            "volume_effect"
        ),
        F.round(
            (r2 * q1 - q2 * r1).cast("double") / q1.cast("double"), 2
        ).alias("price_effect"),
    )
