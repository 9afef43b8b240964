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
