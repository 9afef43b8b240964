#!/usr/bin/env python
"""Driver simulation: vanilla session, hostile timezone, DuckDB oracle diff.

Reproduces the external verifier end-to-end against `__spark_entry__.py`:
a FRESH SparkSession (none of the engine's tuned confs, and a
deliberately hostile `America/New_York` session timezone to prove the
engine re-pins UTC itself via `session.tune()`), then every
``queries()`` entry diffed against ``oracle_sql()`` run in DuckDB over
the same parquet.

The comparison is `tests/_compare.py::assert_df_matches_oracle` — the
SAME driver-mirroring comparator the pytest oracle gate uses, including
the pandas dtype-kind lens (a DuckDB HUGEINT vs Spark bigint hash-fails
on the real driver even when values match — round-2's q_map_funcs) and
the NaN/-0.0/Decimal canonicalization. Re-deriving a looser copy here
once produced false OKs / false mismatches; don't.

Usage::

    python tools/driver_sim.py [query ...]     # default: all queries
    DRIVER_SIM_SF_DIR=/root/testdata/sf0.1 python tools/driver_sim.py

Exit status is nonzero on any schema/row-count/dtype/value mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tests._compare import assert_df_matches_oracle

SF_DIR = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    n = e.entry(spark).count()
    assert n > 0, "entry() produced no rows"
    print(f"entry(): {n} rows OK")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or list(qs)
    bad = 0
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            if name not in oracles:
                print(f"{name}: rows-only, {df.count()} rows")
                continue
            assert_df_matches_oracle(df, con, oracles[name], name=name)
            print(f"{name}: OK")
        except AssertionError as ex:
            print(f"{name}: MISMATCH {str(ex)[:300]}")
            bad += 1
        except Exception as ex:
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
            bad += 1
    print(f"done: {len(names)} checked, {bad} failures")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
