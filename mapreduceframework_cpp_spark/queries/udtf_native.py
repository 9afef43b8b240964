"""Native Python UDTF query (SURVEY.md §2.2-J, round-2 addition).

q_udtf_flatmap (queries/udfs.py) realizes the reference's ``emit2``
multi-emit (``MapReduceFramework.cpp:172-175``) as a pandas-UDF-built
array + explode — the JVM-friendly path. This module adds the OTHER
spelling of the same capability: Spark's first-class Python UDTF API
(``@udtf`` class + ``LATERAL`` correlation), Arrow-optimized, so a user
porting a reference client that thinks in terms of "call emit2 N times
per row" has the literal construct available.

Scale note: a Python UDTF runs Python per input row even when
Arrow-optimized — prefer explode/inline of JVM-built arrays in hot
paths (the flagship and q_udtf_flatmap show that shape); this exists
for API completeness and is oracle-verified like everything else.

Registered AFTER the round-1 families (see queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.registry import query
from mapreduceframework_cpp_spark.sources.tables import tbl


@query(
    "q_udtf_native",
    oracle="""
    SELECT p_partkey, u.s.w AS word, CAST(u.s.i AS INTEGER) AS idx
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS arr FROM part),
         unnest(list_transform(arr, (x, i) -> {'w': x, 'i': i})) AS u(s)
    """,
)
def q_udtf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize part names into (word, ordinal) rows via a real
    ``@udtf`` class lateral-joined per input row — one yield per token
    ≙ one ``emit2`` call per intermediate pair."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, idx int", useArrow=True)
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" "), start=1):
                yield w, i

    spark.udtf.register("mrfw_split_words", SplitWords)
    tbl(spark, sf_dir, "part").createOrReplaceTempView("part_udtf_native")
    return spark.sql(
        """
        SELECT p.p_partkey, s.word, s.idx
        FROM part_udtf_native p, LATERAL mrfw_split_words(p.p_name) s
        """
    )
