"""Structured Streaming wrappers (SURVEY.md §2.2-I).

The reference's only streaming element is incremental progress polling
(R12, ``Sample Client/SampleClient.cpp:85-94``). This engine adds real
stream processing: the window queries are written batch-first (so the
DuckDB oracle applies), and the same transformation functions are wrapped
here over ``readStream`` with ``availableNow`` — Spark's unified
batch/stream semantics guarantee parity, and tests assert it.

Scale: file-source streaming with ``maxFilesPerTrigger`` + watermarked
state store is the incremental-ingest path; ``availableNow`` gives
exactly-once catch-up batches over the same code.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.session import tune

#: Physical schemas of events.parquet, keyed by how the file stores ts.
#: Older driver datasets use TIMESTAMP(NANOS), which Spark only reads as
#: long (nanosAsLong, see sources.tables); newer ones use
#: TIMESTAMP(MICROS,false) == timestamp_ntz natively. The streaming file
#: source needs the schema up front, so peek at the parquet footer
#: (driver-side metadata read, no job) and pick the matching DDL +
#: normalization — both paths yield the exact batch ``tbl()`` schema.
_EVENTS_DDL_NANOS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
_EVENTS_DDL_MICROS = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events table, normalized to the same schema
    the batch ``tbl()`` produces (ts: timestamp_ntz)."""
    import pyarrow.parquet as pq

    tune(spark)
    ts_unit = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    nanos = str(ts_unit) == "timestamp[ns]"
    # the streaming file source requires a directory; select the single
    # events file out of the table dir via glob filter
    raw = (
        spark.readStream.schema(_EVENTS_DDL_NANOS if nanos else _EVENTS_DDL_MICROS)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if nanos:
        return raw.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return raw


def run_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming DataFrame to completion with the availableNow
    trigger into an in-memory sink; return the result as a batch
    DataFrame. Used by parity tests and smoke checks."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
