"""The declared capability inventory (SURVEY.md §2.2).

Importing this package registers every query + oracle pair into
:mod:`mapreduceframework_cpp_spark.registry`.
"""

from mapreduceframework_cpp_spark.queries import (  # noqa: F401
    aggregations,
    analytics,
    flagship,
    joins,
    llm_pipeline,
    relational,
    scalars,
    streaming_windows,
    udfs,
    windows,
)
