"""Streaming ingest dedup (SURVEY.md §2.2-I/K): the training-data
ingest loop as a Structured Streaming job — each micro-batch of arriving
documents is near-dup-checked against the accumulated corpus AND against
itself (operators/dedup.incremental_near_dups), and only novel documents
append to the corpus.

This is the streaming composition of the batch pieces the engine already
verifies: file-source exactly-once ingest (tests/test_streaming_recovery)
+ incremental LSH dedup (q_dedup_incremental). corpus×corpus work is
never redone — per-batch cost is O(batch) banding + a key join against
the corpus index.

Idempotency: each batch writes to its own ``batch_id=N`` directory with
overwrite mode, so a replayed micro-batch (foreachBatch is at-least-once
on failure) rewrites the same files instead of duplicating them — the
standard idempotent-sink recipe when the target is a plain parquet
directory rather than a transactional table. Critically, the corpus
read EXCLUDES the current batch's own ``batch_id`` partition: a replay
must not see its previous (possibly partial) attempt's output as
"corpus", or every replayed doc would be flagged as a near-dup of
itself and the overwrite would wipe the partition. The exclusion is a
partition filter, so the files being overwritten are pruned at planning
time and never race the lazy scan.

At 100 TB the corpus-side banding index would be maintained persistently
(appended per accepted batch) instead of recomputed; the operator
already accepts a precomputed ``corpus_banded`` for exactly that
(operators/dedup.py:incremental_near_dups).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mapreduceframework_cpp_spark.operators.common import release_persisted
from mapreduceframework_cpp_spark.operators.dedup import incremental_near_dups

DOCS_DDL = "doc_id long, text string"


def _read_corpus(
    spark: SparkSession, corpus_dir: str, exclude_batch_id: int | None = None
) -> DataFrame:
    """Accumulated corpus (all accepted batches); empty frame if none.

    ``exclude_batch_id`` drops that ``batch_id`` partition — a replayed
    batch must never read its own prior attempt's output back as corpus
    (see module doc)."""
    try:
        df = spark.read.option("basePath", corpus_dir).parquet(corpus_dir)
    except Exception:  # first batch: directory does not exist yet
        return spark.createDataFrame([], DOCS_DDL)
    if exclude_batch_id is not None and "batch_id" in df.columns:
        df = df.filter(F.col("batch_id") != F.lit(exclude_batch_id))
    return df.select("doc_id", "text")


def accept_novel_docs(
    corpus: DataFrame,
    batch: DataFrame,
    n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """The batch minus near-dups (of the corpus or of earlier batch
    members): the rows allowed to enter the corpus. Pure function —
    shared by the streaming sink and the tests."""
    pairs = incremental_near_dups(
        corpus, batch, n=n, bands=32, rows_per_band=2, threshold=threshold
    )
    dup_ids = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
    return batch.join(dup_ids, "doc_id", "left_anti")


def start_dedup_ingest(
    spark: SparkSession,
    src_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    threshold: float = 0.7,
    max_files_per_trigger: int | None = None,
):
    """Watch ``src_dir`` for document parquet files; gate every
    micro-batch through near-dup detection; append survivors to
    ``corpus_dir``. Returns the started StreamingQuery (availableNow:
    processes the backlog exactly once per checkpoint, then stops).
    ``max_files_per_trigger`` splits the backlog into several
    micro-batches — later batches dedup against earlier batches' output
    within the same run (the admission-controlled ingest shape)."""

    reader = spark.readStream.schema(DOCS_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(src_dir)
        .writeStream.foreachBatch(
            lambda batch_df, batch_id: process_dedup_batch(
                batch_df, batch_id, corpus_dir, n=n, threshold=threshold
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def process_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    n: int = 3,
    threshold: float = 0.7,
) -> None:
    """One micro-batch of the dedup ingest: gate against the corpus
    (minus this batch's own partition — replay safety) and overwrite
    this batch's partition with the survivors. Module-level so the
    at-least-once replay path is directly testable."""
    sess = batch_df.sparkSession
    corpus = _read_corpus(sess, corpus_dir, exclude_batch_id=batch_id)
    accepted = accept_novel_docs(
        corpus, batch_df.select("doc_id", "text"), n=n, threshold=threshold
    )
    accepted.write.mode("overwrite").parquet(f"{corpus_dir}/batch_id={batch_id}")
    release_persisted()  # the dedup operators persist plan diamonds
