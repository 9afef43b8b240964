"""Regression for the round-2 q_map_funcs driver hash-fail: the local
comparator must be dtype-strict so an un-cast DuckDB HUGEINT oracle
(→ pandas float64) against a Spark bigint (→ int64) fails locally
instead of burning a driver round — values being equal is not enough."""

from __future__ import annotations

import pytest

from tests._compare import assert_df_matches_oracle


def test_uncast_hugeint_oracle_fails(spark, duck):
    df = spark.range(1).selectExpr("CAST(3 AS BIGINT) AS s")
    with pytest.raises(AssertionError, match="dtype drift"):
        assert_df_matches_oracle(
            df, duck, "SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)",
            name="hugeint_regression",
        )


def test_cast_bigint_oracle_passes(spark, duck):
    df = spark.range(1).selectExpr("CAST(3 AS BIGINT) AS s")
    assert_df_matches_oracle(
        df, duck,
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)",
        name="hugeint_cast",
    )


def test_nullable_int_widens_identically_both_sides(spark, duck):
    """NULL-bearing int columns widen to float64 on BOTH sides (pandas
    inference and duckdb .df()) — must NOT false-positive."""
    df = spark.createDataFrame([(1, None), (2, 5)], "a long, b long")
    assert_df_matches_oracle(
        df, duck, "SELECT * FROM (VALUES (1, NULL), (2, 5)) t(a, b)",
        name="nullable_int",
    )
