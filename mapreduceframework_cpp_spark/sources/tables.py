"""Table sources (≙ the reference's InputVec, ``MapReduceClient.h:46,50``).

The reference copies the caller's ``InputVec`` into the job
(``MapReduceFramework.cpp:51``); here the source is a parquet scan —
columnar, splittable, predicate-pushdown-able — which is what makes the
same logical pipeline viable at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.session import tune

#: The driver-generated star schema + event/LLM tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: (session, sf_dir, table) → analyzed base DataFrame. DataFrame plans are
#: immutable, so reusing one across queries is safe; what the cache saves
#: is the per-call file listing + parquet footer/schema read, which
#: dominates per-query setup when a verifier/bench runs dozens of queries
#: back-to-back on one session. Keyed by the live SparkSession object so a
#: restarted session never sees another session's plans (the key holds the
#: session itself — identity hash — so ids are never recycled across GC'd
#: sessions). NOT ``.persist()`` — an InMemoryRelation would block
#: predicate pushdown to the scan.
_TBL_CACHE: dict[tuple[SparkSession, str, str], DataFrame] = {}


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + filter pushdown reach the file
    scan because this stays a plain ``spark.read.parquet`` (no collect,
    no RDD round-trip)."""
    key = (spark, sf_dir, name)
    cached = _TBL_CACHE.get(key)
    if cached is not None:
        return cached
    tune(spark)  # pin UTC etc. even on externally built sessions
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to TIMESTAMP_NTZ whatever the file stores. Older
        # driver datasets wrote parquet TIMESTAMP(NANOS,false) — illegal
        # for Spark's reader; nanosAsLong (session.RUNTIME_CONFS)
        # surfaces it as nanos-since-epoch and floor(ns/1000) matches
        # DuckDB's ns→µs truncation for the all-positive testdata.
        # Newer datasets store TIMESTAMP(MICROS,false), which Spark
        # already reads as timestamp_ntz — just pin the type.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampNTZType()))
    _TBL_CACHE[key] = df
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table as a dict (used by tests/bench)."""
    return {name: tbl(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for ``spark.sql`` queries."""
    for name in TABLES:
        tbl(spark, sf_dir, name).createOrReplaceTempView(name)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Sink ≙ OutputVec append (``MapReduceFramework.cpp:181-184``), but
    distributed: each task writes its own file, no global mutex."""
    df.write.mode(mode).parquet(path)


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet sink: one directory per partition
    value, so downstream scans get partition pruning for free
    (tests/test_layout.py proves the pruning)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Idempotent-backfill sink: replace ONLY the partitions present in
    ``df`` (dynamic partition overwrite), leaving every other partition
    untouched. This is the write primitive an incremental 100 TB
    pipeline re-runs a failed day with — a static ``overwrite`` would
    wipe the whole dataset for one day's batch. Implemented with
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` scoped to this
    write (the session value is restored afterwards)."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# --- additional source/sink formats -------------------------------------
# The reference ingests only in-memory vectors (``MapReduceClient.h:46``);
# a standalone engine needs the standard interchange formats too. All are
# plain DataFrameReader/Writer paths, so Catalyst pruning/pushdown and
# task-parallel IO apply. Explicit schemas are preferred at scale —
# ``inferSchema`` scans the data twice and is for exploration only.


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV source. Pass a DDL ``schema`` in production (inference reads
    the input twice and types drift); header names are still honored."""
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: str | None = None, **options
) -> DataFrame:
    """JSON-lines source (one object per line — the splittable layout;
    multiline JSON forces one task per file)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(header=True, **options).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).json(path)


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """ORC source — columnar like parquet (pruning + predicate pushdown
    apply); kept for interchange with Hive-era pipelines."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", schema: str | None = None
) -> DataFrame:
    """XML source (Spark 4 built-in, the former spark-xml package):
    element-per-row with schema-on-read or an explicit schema — the
    interchange format for feed/catalog ingest. Row-tag scoping keeps
    the parse streaming (no whole-document DOM)."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).format("xml").option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).save(path)
