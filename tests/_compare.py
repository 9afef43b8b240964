"""Differential comparator mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison between a
Spark DataFrame result and a DuckDB oracle result.

Stricter than tolerant: values must match exactly after canonicalization
(floats compared by exact value after rounding to 9 decimals) — if this
passes, the driver's value-hash should too; near-misses fail loudly here
so float-instability bugs surface locally.

Also dtype-strict: the driver materializes both sides through pandas
before hashing, so a DuckDB HUGEINT sum (→ float64) against a Spark
bigint (→ int64) hash-mismatches even when every value is equal
(round-2's q_map_funcs failure). We reproduce that lens here — a column
that is integer-kind on one side and float-kind on the other fails,
forcing oracles to CAST(... AS BIGINT). Nullable ints widen to float64
identically on BOTH sides (pandas inference and duckdb .df(), verified
empirically), so null-bearing int columns don't false-positive.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import pandas as pd

#: numpy dtype.kind → the coarse numeric kind the driver's hash can
#: distinguish. Anything else (object/bool/datetime) is out of scope.
_NUMERIC_KIND = {"i": "int", "u": "int", "f": "float"}


def _col_kind(series: pd.Series):
    """Coarse hash-visible kind, incl. the object-of-Decimal trap: a
    Spark DECIMAL column collects as Python Decimal objects, while the
    DuckDB oracle's DECIMAL comes back from .df() as float64 — the
    driver's pandas value-hash always distinguishes them, even on
    equal values (round-6 reds: q_incr_join_view & co.; same lens as
    round-2's HUGEINT sums)."""
    k = _NUMERIC_KIND.get(series.dtype.kind)
    if k is None and series.dtype.kind == "O":
        for v in series:
            if v is None:
                continue
            if isinstance(v, Decimal):
                return "decimal"
            break
    return k


def _assert_dtype_kinds_match(
    name: str, spark_cols, spark_rows, duck_con, oracle: str
) -> None:
    spark_pdf = pd.DataFrame(spark_rows or None, columns=spark_cols)
    duck_pdf = duck_con.execute(oracle).df()
    for c in spark_cols:
        sk = _col_kind(spark_pdf[c])
        dk = _col_kind(duck_pdf[c]) if c in duck_pdf else None
        assert sk != "decimal", (
            f"{name}: column {c!r} is DECIMAL on the Spark side — it "
            "collects as object-of-Decimal while the oracle's DECIMAL "
            "lands as float64, so the driver's value-hash ALWAYS fails; "
            "emit BIGINT cents or CAST(... AS DOUBLE) in the final "
            "projection (and watch /1000000.0-style literals: Spark "
            "parses them as DECIMAL — use /1e6)"
        )
        assert sk is None or dk is None or sk == dk, (
            f"{name}: dtype drift on column {c!r}: spark={sk} "
            f"({spark_pdf[c].dtype}) vs oracle={dk} ({duck_pdf[c].dtype}) — "
            "the driver's pandas value-hash distinguishes these; "
            "CAST the oracle side (DuckDB sum() returns HUGEINT → float64)"
        )


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and sub-ulp noise; queries round/decimal-stabilize
        # anything coarser than this themselves
        r = round(v, 9)
        return 0.0 if r == 0 else r
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((str(k), _norm_val(x)) for k, x in v.items()))
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def assert_df_matches_oracle(spark_df, duck_con, oracle: str, name: str = "?") -> None:
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]

    cur = duck_con.execute(oracle)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = [tuple(r) for r in cur.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    _assert_dtype_kinds_match(name, spark_cols, spark_rows, duck_con, oracle)

    s = _normalize(spark_cols, spark_rows)
    d = _normalize(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(
            f"{name}: value mismatch ({len([1 for a, b in zip(s, d) if a != b])} differing "
            f"rows of {len(s)}); first diffs (spark, duck): {diffs}"
        )
