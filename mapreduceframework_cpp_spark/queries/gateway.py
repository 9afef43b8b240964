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
