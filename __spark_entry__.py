"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``mapreduceframework_cpp_spark/queries/`` and
register themselves with matching oracles via the ``@query`` decorator
(see SURVEY.md §2.2 for the declared inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The Sample Client's per-character corpus count
    (``Sample Client/SampleClient.cpp:32-66``) over ``documents.text`` —
    exercises scan → map (explode) → shuffle → reduce (agg), i.e. the
    reference kernel R1-R14 end-to-end in Spark form.
    """
    from mapreduceframework_cpp_spark.queries.flagship import q_flagship_charcount

    return q_flagship_charcount(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted ⇒ rows-only check)."""
    return all_oracles()
