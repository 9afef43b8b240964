"""Query registry — keeps ``queries()`` and ``oracle_sql()`` in lockstep.

Every capability row in SURVEY.md §2.2 registers here exactly once via the
``@query`` decorator; ``__spark_entry__.py`` re-exports the two dicts. A
query with ``oracle=None`` is deliberately rows-only (non-SQL-expressible),
which the driver records as the weaker check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query (SURVEY.md §2.2) and its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def reorder(priority: list[str]) -> None:
    """Rebuild the registration order: ``priority`` names first (in the
    given order), everything else after in original registration order.

    The external verifier checks the first N registered queries per
    round, so each round promotes the queries still awaiting a hard
    correctness signal (see queries/__init__.py). Unknown names are an
    error — a stale rotation list should fail loudly, not silently
    shrink the verified window."""
    unknown = [n for n in priority if n not in QUERIES]
    if unknown:
        raise KeyError(f"reorder: unknown queries {unknown}")
    rest = [n for n in QUERIES if n not in set(priority)]
    ordered = {n: QUERIES[n] for n in [*priority, *rest]}
    QUERIES.clear()
    QUERIES.update(ordered)


def all_queries() -> dict[str, QueryFn]:
    import mapreduceframework_cpp_spark.queries  # noqa: F401  (registers on import)

    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    import mapreduceframework_cpp_spark.queries  # noqa: F401

    return dict(ORACLES)
