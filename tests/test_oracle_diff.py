"""Primary correctness gate (SURVEY.md §5.2 item 1): every registered
query with a SQL oracle is diffed against DuckDB at sf=0.01, exactly as
the driver will."""

from __future__ import annotations

import pytest

from mapreduceframework_cpp_spark.registry import all_oracles, all_queries

from tests._compare import assert_df_matches_oracle

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(name, spark, duck, oracle_sf_dir):
    df = _QUERIES[name](spark, oracle_sf_dir)
    assert_df_matches_oracle(df, duck, _ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_nonempty(name, spark, oracle_sf_dir):
    """Rows-only queries (no SQL oracle) must at least run and be stable."""
    df = _QUERIES[name](spark, oracle_sf_dir)
    n1 = df.count()
    n2 = _QUERIES[name](spark, oracle_sf_dir).count()
    assert n1 == n2, f"{name}: unstable row count {n1} != {n2}"
