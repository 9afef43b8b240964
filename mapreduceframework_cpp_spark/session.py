"""SparkSession construction with scale-appropriate defaults.

The reference launches one job per ``startMapReduceJob`` call with a
user-chosen thread count (``MapReduceFramework.cpp:191-202``). Here the
session is the engine: parallelism comes from partitioning, and the
configs below are the 100 TB-design knobs (AQE, Arrow, sane shuffle
partitioning) applied once.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime (non-static) confs we also re-apply to externally created
#: sessions (e.g. the driver's) via :func:`tune`.
RUNTIME_CONFS: dict[str, str] = {
    # Testdata timestamps are timezone-naive; pin UTC so Spark and the
    # DuckDB oracle agree on every date/time function.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing, skew-join splitting, join-strategy switch.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the pandas_udf / applyInPandas surface (vectorized transfer).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local-mode shuffle sizing; on a real cluster this is set per job size
    # (AQE coalesces down from a high initial value).
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects
    # outright; read as long and convert in sources.tables.tbl.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — builder path sets it instead
    return spark


def get_spark(app_name: str = "mapreduceframework_cpp_spark") -> SparkSession:
    """Build (or fetch) the engine session.

    local[$SPARK_GRAFT_CPUS] for tests/bench; on a cluster the master is
    whatever ``spark-submit`` provides — nothing here assumes local mode.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
