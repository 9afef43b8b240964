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


def test_spark_decimal_output_fails(spark, duck):
    """Round-6 red class: a Spark DECIMAL result column collects as
    object-of-Decimal while the oracle's DECIMAL .df()'s to float64 —
    the driver's hash always diverges, so the comparator must fail it
    locally even when every value is equal."""
    df = spark.range(1).selectExpr("CAST(1.50 AS DECIMAL(18,2)) AS v")
    with pytest.raises(AssertionError, match="DECIMAL on the Spark side"):
        assert_df_matches_oracle(
            df, duck, "SELECT CAST(1.50 AS DECIMAL(18,2)) AS v",
            name="decimal_regression",
        )


def test_decimal_literal_division_fails(spark, duck):
    """The stealth variant that bit q_text_quality: Spark parses the
    /1000000.0 literal as DECIMAL(8,1), silently making BIGINT / it a
    DECIMAL column. The comparator must catch the infected division."""
    df = spark.range(1).selectExpr("CAST(3 AS BIGINT) / 1000000.0 AS r")
    with pytest.raises(AssertionError, match="DECIMAL on the Spark side"):
        assert_df_matches_oracle(
            df, duck, "SELECT 3 / 1e6 AS r", name="decimal_literal",
        )


def test_double_division_passes(spark, duck):
    """The sanctioned form: /1e6 is a DOUBLE literal in both dialects,
    and an exact integer divided by it is bit-identical across
    engines."""
    df = spark.range(1).selectExpr("CAST(4123456 AS BIGINT) / 1e6 AS r")
    assert_df_matches_oracle(
        df, duck, "SELECT CAST(4123456 AS BIGINT) / 1e6 AS r",
        name="double_division",
    )


def test_bigint_cents_passes(spark, duck):
    """The sanctioned money form: exact BIGINT cents on both sides."""
    df = spark.range(1).selectExpr(
        "CAST(CAST(112946.26 AS DECIMAL(18,2)) * 100 AS BIGINT) AS c"
    )
    assert_df_matches_oracle(
        df, duck,
        "SELECT CAST(CAST(112946.26 AS DECIMAL(18,2)) * 100 AS BIGINT) AS c",
        name="bigint_cents",
    )
