"""Decision-support shapes III — the 7 TPC-H analogues that complete
the full 22-query shape set (Q1, Q8, Q9, Q13, Q16, Q19, Q20).

Together with queries/analytics.py (Q3/Q5/Q7/Q10/Q17) and
queries/decision_support.py (Q2/Q4/Q6/Q11/Q12/Q14/Q15/Q18/Q21/Q22),
every TPC-H query shape now has a registered, oracle-checked analogue —
the complete classic-warehouse surface a user of the reference engine
(compositions of SURVEY.md §2.1 primitives R3/R5/R8/R15, the same
map→sort→shuffle→reduce chain as `MapReduceFramework.cpp:69-149`) could
ask for. The testdata schema has no partsupp table and no
comment/container/receiptdate columns, so Q9/Q13/Q16/Q19/Q20 substitute
equivalent predicates over the columns that exist (noted per query) —
the SHAPE (join graph, subquery lowering, aggregate structure) is the
point, exactly as the earlier Q17/Q21 analogues did.

Scale notes (same discipline as the sibling modules): dimensions
broadcast; each query keeps at most one fact shuffle; money math is
exact decimal with precisions small enough that no engine hits the
38-digit cap (a capped product would round half-even at a scale the
other engine might not); doubles appear only after the final exact sum.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

# Exact revenue term with small precisions: (12,2)×(6,4) → at most
# (19,6) in Spark / (18,6) in DuckDB — far from the 38-digit cap, so
# both engines keep every digit and the final double cast agrees
# bit-for-bit. (The sibling modules' (18,2)×(18,4) variant is equally
# safe for two factors; Q1's THREE-factor charge term is why this
# module standardizes on the smaller widths.)
_REV_SQL = (
    "sum(CAST(l_extendedprice AS DECIMAL(12,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(6,4))))"
)


def _rev():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(6,4)")
    )


@query(
    "q_tpch_q1_shape",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)
             AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
                    * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE)
             AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE)
             / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY 1, 2
    """,
)
def q_tpch_q1_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — THE canonical scan-aggregate
    benchmark: one pass over lineitem, grouped by the 6 (flag, status)
    combinations, producing 8 aggregates per group including the
    three-factor charge term ext·(1−disc)·(1+tax). Fully
    map-side-combinable (partial aggregates carry 6 groups × a few
    decimals per partition), so at 100 TB the shuffle moves kilobytes.
    The charge product is (12,2)×(6,4)×(6,4) → decimal(26,10) in Spark
    — exact, uncapped; averages divide the exact decimal sum (as
    double) by the group count, the same two numbers in both engines."""
    li = tbl(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    # The three-factor charge needs BOTH precision discipline and a
    # final scale ≤ 6: (a) without explicit factor casts Spark's
    # int-literal promotion lands the product at precision 44 → capped
    # to decimal(38,6) with silent half-up rounding; (b) a scale-10
    # result is poison anyway — DuckDB casts decimal→double through
    # double(unscaled)·10^-scale, and a scale-10 sum's unscaled value
    # exceeds 2^53, going 1 ULP off Spark's correctly-rounded cast.
    # discount/tax are exact 2-decimal data, so typing the factors
    # DECIMAL(4,2) makes the product (22,6) — exact, uncapped, and the
    # scale-6 sum's unscaled digits stay < 2^53 through sf0.1.
    disc_f = (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")).cast(
        "decimal(4,2)"
    )
    tax_f = (F.lit(1) + F.col("l_tax").cast("decimal(4,2)")).cast("decimal(4,2)")
    charge = price * disc_f * tax_f
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(_rev()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q_tpch_q8_shape",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                         THEN CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(6,4)))
                         ELSE 0 END) AS DOUBLE) AS nation_rev,
           CAST({_REV_SQL} AS DOUBLE) AS market_rev,
           CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                         THEN CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(6,4)))
                         ELSE 0 END) AS DOUBLE)
             / CAST({_REV_SQL} AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    GROUP BY 1
    """,
)
def q_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's yearly share
    of STANDARD-part revenue sold into the ASIA-region market — the
    8-table snowflake join. Every dimension chain broadcasts
    (part-filter, supplier→nation, customer→nation→region-filter), so
    the ONLY shuffle is lineitem⋈orders on orderkey; numerator and
    denominator come out of one aggregate (a conditional decimal sum),
    never two passes. The share divides the same two doubles in both
    engines."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    p = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    sn = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    s = (
        tbl(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "sn_name")
    )
    cn = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rk")
    )
    r = (
        tbl(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    c = (
        tbl(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rk") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    nat_rev = F.when(F.col("sn_name") == "NATION_3", _rev()).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    out = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(nat_rev).cast("double").alias("nation_rev"),
            F.sum(_rev()).cast("double").alias("market_rev"),
        )
    )
    return out.select(
        "o_year",
        "nation_rev",
        "market_rev",
        (F.col("nation_rev") / F.col("market_rev")).alias("mkt_share"),
    )


@query(
    "q_tpch_q9_shape",
    oracle="""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(0.6 AS DECIMAL(2,1))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier-nation,
    per-year profit on 'red'-named parts. The original prices cost from
    partsupp.ps_supplycost (no partsupp in this dataset); the analogue
    keeps the SHAPE — profit = revenue − unit_cost·qty inside one
    aggregate over the full snowflake — costing units at 60% of
    p_retailprice instead. part (name-filtered) and supplier→nation
    broadcast; lineitem⋈orders on orderkey is the one shuffle. The
    profit term stays decimal end-to-end ((12,2)×(2,1)×(12,2) →
    (27,3), uncapped) so the cross-partition sum is order-independent."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    sn = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    s = (
        tbl(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "nation")
    )
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit(0.6).cast("decimal(2,1)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(F.sum(_rev() - cost).cast("double").alias("sum_profit"))
    )


@query(
    "q_tpch_q13_shape",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY 1)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY 1
    """,
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): histogram of
    orders-per-customer INCLUDING zero-order customers — the left-outer
    + count(nullable) + re-aggregate double-grouping. The original
    excludes 'special requests' via o_comment (no comment column here);
    the priority filter plays that role and, critically, lives in the
    JOIN condition, not a WHERE (a WHERE would silently drop the
    zero-order customers the query exists to count). count(o_orderkey)
    counts only matched rows, so unmatched customers land in bucket 0.
    Both groupings hash on custkey then on the tiny count domain."""
    c = tbl(spark, sf_dir, "customer").select("c_custkey")
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                            "o_orderpriority")
    cond = (c.c_custkey == o.o_custkey) & (
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    c_orders = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q_tpch_q16_shape",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) cell, excluding one brand/type and a
    complaint-flagged supplier set. partsupp doesn't exist here, so the
    part-supplier relation is derived as DISTINCT (l_partkey,
    l_suppkey) from the fact table — one shuffle that immediately
    collapses 60 k rows to ~a pair per part; 'customer complaints'
    becomes s_acctbal < 0 (the NOT-IN lowers to a broadcast LEFT ANTI
    join — the blocklist pattern). The brand/type/size predicates prune
    via the broadcast part join before the distinct-count aggregate."""
    p = (
        tbl(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        tbl(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    # broadcast-semi BEFORE the distinct: the brand/type/size predicate
    # keeps ~13% of parts, so filtering first shrinks the distinct's
    # shuffle ~8× — the distinct then runs on the narrow key pair and
    # the surviving dims re-attach by broadcast.
    ps = (
        tbl(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(p.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(F.broadcast(bad), F.col("l_suppkey") == bad.s_suppkey, "left_anti")
        .distinct()
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q19_shape",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): a disjunction of three
    brand/size/quantity envelopes — the classic OR-of-ANDs predicate
    that tests residual-filter handling on a broadcast join (the
    original's container/shipmode legs map onto the size/quantity
    columns that exist). Each disjunct mixes part and lineitem columns,
    so nothing can prune pre-join; the part side still broadcasts and
    the whole filter evaluates inside one codegen stage — no shuffle at
    all, one row out."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q_tpch_q20_shape",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
    """,
)
def q_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): NATION_1 suppliers
    who moved >300 units of red parts in 1997 — the nested
    IN-over-HAVING-aggregate lowering. The original compares
    partsupp.ps_availqty against half the shipped volume; without
    partsupp the analogue keeps the structural core: an aggregate
    subquery with a HAVING threshold feeding a semi join into a
    broadcast-dimension-filtered outer query. The inner aggregate
    shuffles on suppkey only AFTER the broadcast part-name filter and
    the pushed-down date range shrink the fact scan; the outer supplier
    table is tiny and the semi join broadcasts the aggregate's
    surviving keys."""
    sup = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = (
        tbl(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_1")
        .select("n_nationkey")
    )
    p = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select("l_suppkey")
    )
    return (
        sup.join(F.broadcast(n), sup.s_nationkey == n.n_nationkey)
        .join(F.broadcast(movers), sup.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
