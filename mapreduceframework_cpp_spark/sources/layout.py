"""Storage-layout controls for scale: bucketing and partitioning
(SURVEY.md §4.2 engine-level physical decisions).

At 100 TB the dominant costs are shuffles and full scans; both are
storage-layout problems:

- **Bucketing** pre-shuffles a table once at write time. Two tables
  bucketed by the same key into the same bucket count join with NO
  exchange on either side — the shuffle is amortized across every future
  join. This is the Spark analog of co-located/co-partitioned storage.
- **Hive-style partitioning** turns selective filters into directory
  pruning: a predicate on the partition column skips whole partitions at
  planning time (``PartitionFilters`` in the scan node), reading none of
  the skipped bytes.

Both are plain DataFrameWriter features; tests assert the resulting
physical plans (no Exchange / PartitionFilters present), not just
results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted table. Joins/aggregations on
    ``bucket_col`` against tables bucketed the same way run shuffle-free.
    Bucket metadata lives in the session catalog; ``path`` pins the data
    location (required for temp dirs in tests)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet: one directory per partition value;
    filters on partition columns prune directories at planning time."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog-table scan (bucket metadata applies, unlike a bare path
    read)."""
    return spark.table(table)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> F.Column:
    """Z-order (Morton) interleave expression over numeric columns.

    Each column is min-max scaled onto [0, 2^bits) using scalar bounds
    gathered in one tiny aggregate, then the bit planes are interleaved:
    bit b of column c lands at position ``b * len(cols) + c``. Sorting by
    the resulting key clusters rows so that EVERY dimension's values are
    locally close — after writing, per-file min/max column statistics
    become tight on ALL the z-ordered columns at once, and data skipping
    prunes multi-dimensional predicates (a single-column sort only ever
    tightens one dimension). Pure JVM bit arithmetic, no UDFs."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    ).collect()[0]  # scalar-probe: 2·|cols| bounds, never a result set
    n = len(cols)
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn, mx = bounds[f"_mn_{c}"], bounds[f"_mx_{c}"]
        span = (mx - mn) or 1.0
        scaled = F.least(
            F.lit(top),
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top),
        ).cast("long")
        for b in range(bits):
            bit = F.shiftright(scaled, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + ci))
    return key


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8, bits: int = 8
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered along the
    z-curve of ``cols`` — the layout-compaction job run after ingest so
    later multi-dimensional range scans skip most files via footer
    min/max stats. repartitionByRange on the key gives equal-size,
    key-contiguous files (range exchange, no driver materialization)."""
    (
        df.withColumn("_z", zorder_key(df, cols, bits=bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
