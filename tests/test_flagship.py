"""Flagship golden test (SURVEY.md §5.2 items 2-3, FIXTURES.md §2).

The Sample Client's exact 3-string input
(``Sample Client/SampleClient.cpp:74-79``) with the golden recomputed in
pure Python at test time; invariant under partition count — precisely the
property the reference's pointer-identity shuffle violates (SURVEY.md §2.1
R6)."""

from __future__ import annotations

from collections import Counter

import pytest

from mapreduceframework_cpp_spark.queries.flagship import char_count

STRINGS = [
    "This string is full of characters",
    "Multithreading is awesome",
    "race conditions are bad",
]


@pytest.mark.parametrize("nparts", [1, 4, 16])
def test_charcount_golden(spark, nparts):
    golden = Counter("".join(STRINGS))
    df = spark.createDataFrame([(s,) for s in STRINGS], "text string").repartition(nparts)
    got = {r["ch"]: r["cnt"] for r in char_count(df).collect()}
    assert got == dict(golden)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"ch", "cnt"}


def test_registry_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert "q_flagship_charcount" in qs
