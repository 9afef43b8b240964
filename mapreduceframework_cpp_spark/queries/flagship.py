"""Flagship: the Sample Client's computation, engine-native (SURVEY.md §2.2-J).

The reference's only shipped workload is a per-character frequency count
over a corpus of strings (``Sample Client/SampleClient.cpp:32-66``: ``map``
counts chars per string with a manual combiner, ``reduce`` sums per char).
Here it is one declarative pipeline — ``explode(split(...))`` ≙ emit2
multi-emit (``MapReduceFramework.cpp:172-175``), ``groupBy().sum()`` ≙
shuffle+reduce (``:100-133,135-149``) — and Spark's partial aggregation
plays the combiner role automatically (≙ R16).

Scale note: char-exploding 100 TB of text is shuffle-heavy if done naively;
the partial HashAggregate collapses each task's explode output to ≤ distinct
chars before the exchange, so shuffle volume is O(tasks × alphabet), not
O(total chars).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


def char_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-character counts over a text column.

    Spark's ``split`` with a zero-width pattern yields a trailing empty
    token (Java ``split(re, -1)`` semantics) — filtered out to match the
    reference semantics (every char of every string counted once).
    """
    return (
        docs.select(F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q_flagship_charcount",
    oracle="""
    SELECT ch, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
    GROUP BY ch
    """,
)
def q_flagship_charcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return char_count(tbl(spark, sf_dir, "documents"))
