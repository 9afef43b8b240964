#!/usr/bin/env python
"""Driver simulation: vanilla session, hostile timezone, DuckDB oracle diff.

Reproduces the external verifier end-to-end against `__spark_entry__.py`:
a FRESH SparkSession (none of the engine's tuned confs, and a
deliberately hostile `America/New_York` session timezone to prove the
engine re-pins UTC itself via `session.tune()`), then every
``queries()`` entry collected and diffed against ``oracle_sql()`` run in
DuckDB over the same parquet.

Usage::

    python tools/driver_sim.py [query ...]     # default: all queries
    DRIVER_SIM_SF_DIR=/root/testdata/sf0.1 python tools/driver_sim.py

Exit status is nonzero on any schema/row-count/value mismatch — the same
canonicalization the driver applies (columns sorted by name, rows sorted
by repr, Decimal→float, float→round(9), datetimes naive-ISO).
"""

from __future__ import annotations

import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


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
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                print(f"{name}: rows-only, {len(srows)} rows")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            sc, sr = canon(scols, srows)
            dc, dr = canon(dcols, drows)
            if sc != dc:
                print(f"{name}: SCHEMA MISMATCH spark={sc} duck={dc}")
                bad += 1
            elif len(sr) != len(dr):
                print(f"{name}: ROWS {len(sr)} vs {len(dr)}")
                bad += 1
            elif sr != dr:
                diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
                print(f"{name}: VALUE MISMATCH at {diffs}")
                for i in diffs[:1]:
                    print("  spark:", sr[i])
                    print("  duck :", dr[i])
                bad += 1
            else:
                print(f"{name}: OK ({len(sr)} rows)")
        except Exception as ex:
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
            bad += 1
    print(f"done: {len(names)} checked, {bad} failures")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
