"""Ad-hoc SQL gateway (SURVEY.md §2.2-A): the whole engine surface is
also reachable as plain ANSI SQL over the registered tables —
``run_sql(spark, sf_dir, sql)`` registers every dataset as a temp view
and hands the string to Catalyst. This is the "switch path" for a user
of the reference who thinks in queries rather than DataFrames: any SQL
they run today runs here unchanged, with pushdown/pruning/AQE applied
exactly as for the DataFrame API (same optimizer, same plans).

The registered demonstration query shares ONE SQL string between the
Spark run and the DuckDB oracle — the dialect-common ANSI subset is the
contract, and the hash match proves the gateway executes it faithfully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import register_temp_views

#: runs verbatim in BOTH engines (ANSI common subset): CTE + join +
#: grouped decimal-exact aggregate + ranked window with tie-break.
_GATEWAY_SQL = """
    WITH seg AS (
      SELECT c.c_mktsegment, o.o_custkey,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, o.o_custkey
    )
    SELECT c_mktsegment, o_custkey, n_orders, spend,
           CAST(row_number() OVER (PARTITION BY c_mktsegment
                                   ORDER BY spend DESC, o_custkey)
                AS BIGINT) AS spend_rank
    FROM seg
    WHERE n_orders >= 3
"""


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Execute an ad-hoc SQL string against the engine's tables."""
    register_temp_views(spark, sf_dir)
    return spark.sql(sql)


@query("q_sql_gateway", oracle=_GATEWAY_SQL)
def q_sql_gateway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string entry point: the oracle IS the executed query text
    (one source of truth), so this row certifies the gateway itself,
    not a hand-mirrored translation."""
    return run_sql(spark, sf_dir, _GATEWAY_SQL)


#: revenue-threshold parameter sweep driven by an ENGINE-ITERATED loop
#: (Spark 4 SQL scripting): the script's WHILE accumulates one scalar
#: subquery result per threshold into a session array, exploded into
#: the final result set. The control flow the reference's client runs
#: in C++ around the kernel (`Sample Client/SampleClient.cpp:32-66`
#: drives jobs imperatively) here lives INSIDE the engine.
_SWEEP_STEPS = 8
_SWEEP_STEP_USD = 50_000


@query(
    "q_sql_scripting",
    oracle=f"""
    SELECT CAST(t.i * {_SWEEP_STEP_USD} AS DOUBLE) AS threshold,
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_totalprice > t.i * {_SWEEP_STEP_USD}) AS BIGINT)
             AS n_orders
    FROM range(0, {_SWEEP_STEPS}) t(i)
    """,
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN/DECLARE/WHILE): a parameter sweep
    where the LOOP runs inside the engine — each iteration binds the
    next revenue threshold and folds the matching order count into a
    script-local array variable; one explode turns the accumulator
    into the result set. Demonstrates engine-iterated control flow
    (the imperative driver loop of the reference client, absorbed into
    a declarative session); each iteration is an independently
    optimized scan with its own pushed-down predicate. The oracle
    states the sweep as a closed-form range cross join."""
    register_temp_views(spark, sf_dir)
    return spark.sql(f"""
    BEGIN
      DECLARE i INT DEFAULT 0;
      DECLARE acc ARRAY<STRUCT<t: DOUBLE, n: BIGINT>> DEFAULT array();
      WHILE i < {_SWEEP_STEPS} DO
        SET acc = array_append(acc,
          (SELECT struct(CAST(i * {_SWEEP_STEP_USD} AS DOUBLE) AS t,
                         count(*) AS n)
           FROM orders WHERE o_totalprice > i * {_SWEEP_STEP_USD}));
        SET i = i + 1;
      END WHILE;
      SELECT s.t AS threshold, s.n AS n_orders
      FROM (SELECT explode(acc) AS s);
    END
    """)


#: hierarchical ancestor-chain rollup over the implicit 10-ary customer
#: tree (parent(k) = k div 10, root 0): runs VERBATIM in both engines.
#: The parent step is the subtract-mod form so the recursion stays
#: exact-integer in the ANSI common subset (no dialect div operator).
_RECURSIVE_SQL = """
    WITH RECURSIVE chain(custkey, anc, depth) AS (
      SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
      UNION ALL
      SELECT custkey, CAST((anc - (anc % 10)) / 10 AS BIGINT), depth + 1
      FROM chain WHERE anc > 0
    )
    SELECT ch.custkey,
           CAST(max(ch.depth) AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CAST(CAST(cu.c_acctbal AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT)
             AS chain_balance_cents
    FROM chain ch JOIN customer cu ON cu.c_custkey = ch.anc
    GROUP BY 1
"""


@query("q_sql_recursive", oracle=_RECURSIVE_SQL)
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``, SPARK-24497): walk
    every customer's ancestor chain up the implicit 10-ary key tree
    (parent = key div 10) and roll up chain depth, node count and
    exact BIGINT-cents chain balance (a DECIMAL output column would
    hash-fail under the driver's pandas lens — round-6 red: Spark
    Decimal objects vs DuckDB float64) — the org-hierarchy / BOM-explosion
    shape that previously forced a driver-side loop (the iterative
    join of ``operators/dedup.dedup_clusters``) into hand-written
    Python. Here the ENGINE owns the fixpoint: each recursion level is
    one join-free projection (pure key arithmetic), depth is bounded
    by log10(max key), and the oracle executes the IDENTICAL string in
    DuckDB — one source of truth, like q_sql_gateway."""
    return run_sql(spark, sf_dir, _RECURSIVE_SQL)
