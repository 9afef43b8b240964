"""Custom-source query (SURVEY.md §2.2-A, round-2): reads the
`synthetic_docs` Python DataSource (sources/pydatasource.py — the
Spark 4 DataSource API) and hash-verifies the source's output against a
SQL-reconstructed oracle: the generator is a pure function of doc_id,
so DuckDB can rebuild the exact corpus from ``range()``.

Kernel lowering: R2 input-split — the reference's client assembles
`InputVec` on the driver (`Sample Client/SampleClient.cpp:74-79`); a
real engine's connector produces splits executor-side, which is what
the DataSource API's ``partitions()``/``read()`` contract expresses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.pydatasource import register

_ROWS = 5000
_PARTS = 8


@query(
    "q_source_python",
    oracle=f"""
    WITH gen AS (
      SELECT i AS doc_id,
             (['en','de','fr','es','zh'])[(i % 5) + 1] AS lang,
             'tok' || (i % 97) || ' ' || 'tok' || (i * 31 % 97)
                   || ' ' || 'tok' || (i * 61 % 97) AS text
      FROM range({_ROWS}) AS t(i)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
           CAST(sum(len(text)) AS BIGINT) AS total_chars,
           min(doc_id) AS first_doc
    FROM gen GROUP BY lang
    """,
)
def q_source_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the custom Python data source and aggregate per language —
    hash-verified against the oracle's from-scratch reconstruction, so
    the whole executor-side generation path (partitions → read → Arrow
    → DataFrame) is checked value-for-value. ``sf_dir`` is unused: the
    source IS the data (fixed {rows} rows / {parts} partitions)."""
    register(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("rows", _ROWS)
        .option("partitions", _PARTS)
        .load()
    )
    return docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("text").cast("long").alias("n_distinct_texts"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )
