"""Media-directory ingest (SURVEY.md §2.2-A + K): read a directory of
raw media files (images/audio/video) as rows via Spark's built-in
``binaryFile`` source, normalized onto the engine's MEDIA_SCHEMA
contract so the multimodal stages (operators/multimodal.py: decode /
features / frame sampling) consume files exactly as they consume
parquet-stored media columns.

Scale notes: binaryFile splits by FILE (one row per file, never
splitting a payload), applies ``pathGlobFilter`` / ``modifiedAfter``
pushdown at listing time, and honors ``spark.sql.files.maxPartitionBytes``
for bin-packing small files into tasks — the right ingest geometry for
media corpora, where a 100 TB crawl is billions of small objects. The
conversion to parquet media rows (large row groups, metadata columns
for pushdown) is exactly :func:`media_files_to_rows` + ``write_parquet``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: media_type by file extension (the ingest-time routing rule)
_EXT_TYPES = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw ``binaryFile`` rows: (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def media_files_to_rows(files: DataFrame) -> DataFrame:
    """Normalize binaryFile rows onto MEDIA_SCHEMA: doc_id from a stable
    path hash (re-ingest gives the same ids — idempotent appends),
    media_type routed by extension, metadata struct ready for predicate
    pushdown once written to parquet."""
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    type_expr = F.lit(None).cast("string")
    for e, t in _EXT_TYPES.items():
        type_expr = F.when(ext == e, t).otherwise(type_expr)
    return files.select(
        F.xxhash64("path").alias("doc_id"),
        F.coalesce(type_expr, F.lit("unknown")).alias("media_type"),
        F.col("content"),
        F.struct(
            ext.alias("format"),
            F.col("length").alias("n_bytes"),
            F.element_at(F.split(F.col("path"), "/"), -1).alias("source"),
        ).alias("meta"),
    )
