"""MR-compat wrapper — API parity with the reference's client contract.

Reproduces ``startMapReduceJob`` semantics (``MapReduceFramework.h:18-24``,
``MapReduceClient.h:55-65``) as a library call on DataFrames:

- ``map_fn(k1, v1) -> iterable[(k2, v2)]`` ≙ ``MapReduceClient::map`` +
  ``emit2`` (``MapReduceFramework.cpp:172-175``): 0..n intermediate pairs
  per input row.
- every (k2, v2) reaches exactly **one** group per distinct k2 value —
  the *intended* semantics of the reference shuffle
  (``MapReduceFramework.cpp:100-133``), with value equality instead of its
  pointer-identity bugs (SURVEY.md §2.1 R6).
- values are passed to ``reduce_fn(k2, values)`` sorted (≙ R5 per-thread
  sort, ``MapReduceFramework.cpp:92`` — done here per group, which is the
  deterministic version of what the reference attempted).
- ``reduce_fn(k2, values) -> iterable[(k3, v3)]`` ≙ ``reduce`` + ``emit3``
  (``:177-189``).

Execution is Spark-native: ``mapInPandas`` for the map side (Arrow
batches, not row-at-a-time), hash shuffle for grouping, ``applyInPandas``
for the reduce side. Parallelism comes from partitioning — the
``multiThreadLevel`` knob maps to ``num_partitions``.

Scale: both UDF stages stream Arrow batches; nothing is collected to the
driver. A single giant key group is the applyInPandas caveat (group must
fit in one task's memory) — same contract as the reference's per-key
IntermediateVec, but spillable upstream.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

MapFn = Callable[[Any, Any], Iterable[tuple[Any, Any]]]
ReduceFn = Callable[[Any, list], Iterable[tuple[Any, Any]]]


def map_reduce_job(
    df: DataFrame,
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    intermediate_schema: str = "k2 string, v2 long",
    output_schema: str = "k3 string, v3 long",
    num_partitions: int | None = None,
) -> DataFrame:
    """Run a MapReduce-style job over a 2-column DataFrame (k1, v1).

    Returns the (k3, v3) DataFrame lazily — call ``.collect()`` (≙
    ``waitForJob``) or ``.write`` to execute. Async launch ≙ the
    reference's immediate-return handle falls out of Spark's laziness.
    """
    if len(df.columns) != 2:
        raise ValueError(f"input must have exactly 2 columns (k1, v1), got {df.columns}")

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[Any, Any]] = []
            for k1, v1 in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                out.extend(map_fn(k1, v1))
            yield pd.DataFrame(out, columns=["k2", "v2"])

    mapped = df.mapInPandas(_map, schema=intermediate_schema)
    key_col = mapped.columns[0]
    if num_partitions is not None:
        mapped = mapped.repartition(num_partitions, key_col)

    out_cols = [f.name for f in _schema_fields(mapped.sparkSession, output_schema)]

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf.iloc[0, 0]
        values = sorted(pdf.iloc[:, 1].tolist())
        return pd.DataFrame(list(reduce_fn(key, values)), columns=out_cols)

    return mapped.groupBy(key_col).applyInPandas(_reduce, schema=output_schema)


def _schema_fields(spark, schema: str):
    from pyspark.sql.types import StructType

    return StructType.fromDDL(schema).fields
