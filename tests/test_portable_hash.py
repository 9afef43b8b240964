"""The portable-hash contract underpinning the round-8 oracle upgrades.

`portable_hash60` (top 60 bits of md5) is the hash the engine uses
wherever hash values SURFACE IN OUTPUT columns — count-min buckets,
winnowing fingerprints, simhash bit votes — precisely because three
independent implementations must produce the identical integer: Spark
(`conv(substring(md5(x), 1, 15), 16, 10)`), DuckDB
(`CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`), and stdlib Python
(`int(hashlib.md5(x.encode()).hexdigest()[:15], 16)`). The driver's
per-round hash rows prove it on testdata; this test pins the contract
in CI on an adversarial fixture set so a dialect drift (or a careless
edit to any one of the three formulations) fails locally, not in a
driver round.
"""

from __future__ import annotations

import duckdb
import pytest

import pyspark.sql.functions as F

from mapreduceframework_cpp_spark.operators.common import (
    portable_hash60,
    portable_hash60_py,
)

#: adversarial key set: empty, ASCII, SQL-significant chars, unicode
#: (precomposed + combining), the 'İ' lowering trap, CJK, astral emoji,
#: long strings, whitespace variants, digits-only, hex-looking
FIXTURE = [
    "",
    "a",
    "hello",
    "The Quick Brown Fox",
    "quote'quote",
    'double"quote',
    "semi;colon -- comment",
    "tab\tsep",
    "newline\nsplit",
    "ŁÓDŹ",
    "İstanbul",
    "naïve",
    "naïve",  # combining diaeresis ≠ precomposed ï
    "日本語テキスト",
    "🚀🌕",
    "x" * 500,
    " leading and trailing ",
    "0123456789",
    "deadbeefcafebabe",
]


def test_portable_hash60_three_way_parity(spark):
    """Spark, DuckDB, and stdlib md5 derive the identical 60-bit value
    for every fixture key — the exact three-way agreement the r8
    oracle upgrades (countmin / fingerprint / simhash) stand on."""
    sdf = spark.createDataFrame([(k,) for k in FIXTURE], "k string")
    spark_vals = {
        r.k: r.h for r in sdf.select("k", portable_hash60("k").alias("h")).collect()
    }
    con = duckdb.connect()
    for k in FIXTURE:
        duck = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [k]
        ).fetchone()[0]
        py = portable_hash60_py(k)
        assert spark_vals[k] == duck == py, repr(k)
        assert 0 <= py < 1 << 60


def test_portable_hash60_distribution_sanity():
    """Not a randomness proof — just a tripwire that the 60-bit values
    aren't degenerate (all-distinct on the fixture, both halves of the
    range populated), which a substring/endianness mistake would
    break."""
    vals = [portable_hash60_py(k) for k in FIXTURE]
    assert len(set(vals)) == len(vals)
    assert any(v < 1 << 59 for v in vals)
    assert any(v >= 1 << 59 for v in vals)


def test_cms_oracle_constants_single_sourced():
    """The countmin oracle's Carter–Wegman constants are generated from
    operators/sketch.py's CMS_* values (one source of truth): assert
    the registered oracle text actually carries them, so an edit to the
    engine constants that forgets the oracle (or vice versa) fails here
    rather than as a driver hash-red."""
    from mapreduceframework_cpp_spark.operators.sketch import (
        CMS_A,
        CMS_B1,
        CMS_B2,
        CMS_P,
    )
    from mapreduceframework_cpp_spark.registry import ORACLES

    import mapreduceframework_cpp_spark.queries  # noqa: F401 - registers

    sql = ORACLES["q_sketch_countmin"]
    for const in (CMS_A, CMS_B1, CMS_B2, CMS_P):
        assert str(const) in sql, const


def test_portable_hash60_property_duckdb_parity():
    """Property form of the contract (no Spark in the loop, so wide
    input coverage is cheap): for arbitrary unicode text, stdlib md5
    and DuckDB derive the same 60-bit value."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=64))
    def check(k: str) -> None:
        duck = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [k]
        ).fetchone()[0]
        assert duck == portable_hash60_py(k), repr(k)

    check()
