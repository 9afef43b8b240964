#!/usr/bin/env python
"""Degenerate-corpus robustness sweep: run EVERY registered query
against a copy of the test data with planted pathological rows — the
rows a 100 TB corpus is guaranteed to contain and the driver's clean
sf0.01 tables never exercise:

- documents: an empty text, a whitespace-only text, a symbol-only
  text, a single-stopword text, a NULL text, a NULL lang/source
- embeddings: an all-zero vector (zero L2 norm) and a NULL vector

A query FAILS the sweep only if it RAISES (ANSI DIVIDE_BY_ZERO,
INVALID_ARRAY_INDEX, overflow, ...) — empty results are fine. The r6
run of this sweep found 7 queries where one degenerate row killed the
whole job (similarity cosine norms, the e2e quality gate, BPE pair
enumeration, A-ES weighted sampling); all are fixed and pinned by
tests/test_scale_ops.py's degenerate-input tests. Keep the sweep in
the round-close checklist: any NEW query must survive it.

Usage::

    python tools/edge_sweep.py              # all queries
    python tools/edge_sweep.py q_foo q_bar  # subset
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("EDGE_SWEEP_BASE_SF_DIR", "/root/testdata/sf0.001")


def build_edge_corpus(dst: str) -> None:
    import duckdb

    con = duckdb.connect()
    for p in glob.glob(f"{SRC}/*.parquet"):
        shutil.copy(p, dst)
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/documents.parquet')
          UNION ALL
          SELECT * FROM (VALUES
            (900001, '', 'en', 'web', 0),
            (900002, '   ', 'en', 'web', 3),
            (900003, '!!! ??? ... ;;;', 'de', 'books', 15),
            (900004, 'the', 'fr', 'web', 3),
            (900005, NULL, 'en', 'web', NULL),
            (900006, 'normal text here', NULL, NULL, 16)
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '{dst}/documents.parquet' (FORMAT parquet)
        """
    )
    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    zeros = "[" + ",".join(["0.0"] * dim) + "]"
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/embeddings.parquet')
          UNION ALL
          SELECT 900001 AS vec_id, CAST({zeros} AS FLOAT[]) AS embedding,
                 0 AS label
          UNION ALL
          SELECT 900002, NULL, 0
        ) TO '{dst}/embeddings.parquet' (FORMAT parquet)
        """
    )


def main() -> int:
    from pyspark.sql import SparkSession

    from mapreduceframework_cpp_spark.operators.common import release_persisted
    from mapreduceframework_cpp_spark.registry import all_queries

    edge_dir = tempfile.mkdtemp(prefix="edgedata_")
    build_edge_corpus(edge_dir)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("edge-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    names = sys.argv[1:] or list(queries)
    bad = 0
    for name in names:
        try:
            queries[name](spark, edge_dir).count()
        except Exception as ex:  # noqa: BLE001 - report-and-continue sweep
            msg = str(ex).split("\n")[0][:160]
            print(f"FAIL {name}: {type(ex).__name__}: {msg}", flush=True)
            bad += 1
        finally:
            release_persisted()
    print(f"done: {len(names)} queries, {bad} failures")
    shutil.rmtree(edge_dir, ignore_errors=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
