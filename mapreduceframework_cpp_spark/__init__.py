"""mapreduceframework_cpp_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MapReduce kernel (yairklo/MapReduceFramework.cpp — a pthreads
``map → sort → shuffle → reduce`` pipeline, ``MapReduceFramework.h:15-24``),
re-expressed idiomatically on Spark DataFrames / Spark SQL / Catalyst /
Structured Streaming. See SURVEY.md for the blueprint.

Layout
------
- ``sources``   — table loaders / readers / sinks (≙ InputVec/OutputVec,
  ``MapReduceClient.h:46-52``)
- ``operators`` — relational + custom operators (as-of join, dedup,
  similarity, text analysis, MR-compat wrapper)
- ``functions`` — scalar/array helper column functions
- ``plans``     — progress/plan introspection (≙ JobState polling,
  ``MapReduceFramework.h:8-13``)
- ``streaming`` — Structured Streaming wrappers (batch-first, stream-wrapped)
- ``queries``   — the declared capability inventory from SURVEY.md §2.2,
  each registered with a matching DuckDB oracle
"""

from mapreduceframework_cpp_spark.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    all_oracles,
    all_queries,
    query,
)
from mapreduceframework_cpp_spark.session import get_spark  # noqa: F401
from mapreduceframework_cpp_spark.sources.tables import TABLES, load, tbl  # noqa: F401

__version__ = "0.1.0"
