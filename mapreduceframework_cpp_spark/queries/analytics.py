"""Multi-join analytical showcase queries (TPC-H Q3/Q5 shapes).

These exercise the engine end-to-end the way a warehouse user would:
selective dimension filters, 3- and 6-way join chains, decimal-exact
revenue aggregation, deterministic top-k — the composition of §2.2's
primitives rather than new ones. Kernel lowering is the repartition-join
+ reduce chain (SURVEY.md §2.2-C note; Tenzing, PAPERS.md:8) applied
twice or more in sequence.

Scale notes: Catalyst orders the join chain and AQE switches build sides
at runtime; the dimension sides (customer at 1/10th of orders, nation,
region, supplier) broadcast under the session threshold, so only the
fact tables shuffle — at 100 TB only lineitem/orders exchanges remain,
partitioned on the join keys. Revenue sums use the decimal discipline
from queries/aggregations.py (exact, order-independent)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl

def _rev():
    """Decimal-exact revenue term (built lazily — Column construction
    needs a live SparkContext): base columns hold exact 2dp values, so
    the decimal cast is unambiguous; decimal arithmetic is
    order-independent."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )

_REV_SQL = (
    "sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(18,4))))"
)


@query(
    "q_tpch_q3_shape",
    oracle=f"""
    SELECT o_orderkey, o_orderdate,
           CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one market
    segment. customer (selective filter) broadcasts; orders⋈lineitem is
    the only real shuffle; top-k plans as TakeOrderedAndProject."""
    cutoff = F.lit("1997-01-01").cast("timestamp_ntz")
    c = tbl(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q5_shape",
    oracle=f"""
    SELECT n_name, CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue by nation for one region —
    a 6-way join where region/nation/supplier/customer all broadcast and
    the local-supplier condition (c_nationkey = s_nationkey) is a
    residual filter on the join chain."""
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = tbl(spark, sf_dir, "nation")
    c = tbl(spark, sf_dir, "customer")
    s = tbl(spark, sf_dir, "supplier")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_premium
    FROM part p
    WHERE p_retailprice >
          (SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                  * 1.2 / count(*)
           FROM part p2 WHERE p2.p_brand = p.p_brand)
    GROUP BY p_brand
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 pattern): parts priced >1.2x
    their brand's average. Written as SQL so Catalyst's decorrelation
    rewrites the per-row subquery into one aggregate + join — the engine
    never executes a subquery per row. Decimal-exact sum / count keeps
    the threshold bit-identical across engines."""
    tbl(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_premium
        FROM part_v p
        WHERE p_retailprice >
              (SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                      * 1.2 / count(*)
               FROM part_v p2 WHERE p2.p_brand = p.p_brand)
        GROUP BY p_brand
        """
    )


@query(
    "q_tpch_q7_shape",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM supplier s, lineitem l, orders o, customer c,
         nation sn, nation cn
    WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
      AND c.c_custkey = o.o_custkey
      AND s.s_nationkey = sn.n_nationkey AND c.c_nationkey = cn.n_nationkey
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade revenue between
    two nations by ship year. The nation dimension broadcasts TWICE
    (supplier side and customer side — Catalyst keeps them as two
    independent broadcast joins); the nation-pair disjunction is a
    residual filter after both joins, and only lineitem⋈orders
    shuffles. The year comes from TIMESTAMP_NTZ, so extraction is
    session-timezone-proof."""
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q_tpch_q10_shape",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST({_REV_SQL} AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue on returned lineitems in one quarter. The orderdate
    predicate prunes orders BEFORE the fact join; customer and nation
    broadcast; the top-k plans as TakeOrderedAndProject (no global
    sort materializes). Tie-break on c_custkey keeps the LIMIT
    deterministic across engines."""
    cutoff_lo = F.lit("1996-01-01").cast("timestamp_ntz")
    cutoff_hi = F.lit("1996-07-01").cast("timestamp_ntz")
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    ).select("o_orderkey", "o_custkey")
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
