"""Streaming ingest dedup (streaming/ingest_dedup.py): micro-batches are
gated against the accumulated corpus and themselves; only novel docs
land; checkpoint replay does not duplicate."""

from __future__ import annotations

import shutil


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
OTHER = "one two three four five six seven eight nine ten"
THIRD = "red orange yellow green blue indigo violet ultra infra deep"


def _stage(df, stage_dir, src_dir, name):
    df.coalesce(1).write.mode("overwrite").parquet(str(stage_dir))
    part = next(p for p in stage_dir.iterdir() if p.name.startswith("part-"))
    src_dir.mkdir(exist_ok=True)
    shutil.copy(part, src_dir / name)


def _corpus_ids(spark, corpus_dir):
    df = spark.read.option("basePath", str(corpus_dir)).parquet(str(corpus_dir))
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_streaming_dedup_ingest(spark, tmp_path):
    from mapreduceframework_cpp_spark.streaming.ingest_dedup import (
        start_dedup_ingest,
    )

    src, ckpt, corpus = tmp_path / "src", tmp_path / "ckpt", tmp_path / "corpus"

    batch1 = spark.createDataFrame(
        [(1, BASE), (2, OTHER)], "doc_id long, text string"
    )
    _stage(batch1, tmp_path / "s1", src, "b1.parquet")
    q = start_dedup_ingest(spark, str(src), str(corpus), str(ckpt))
    q.awaitTermination()
    assert _corpus_ids(spark, corpus) == {1, 2}

    # batch 2: 10 = near-dup of corpus doc 1; 11/12 = batch-internal
    # dup pair (11 kept as the smaller id); 13 = novel
    batch2 = spark.createDataFrame(
        [
            (10, BASE + " extra"),
            (11, THIRD),
            (12, THIRD + " word"),
            (13, "completely different tokens nothing shared here at all now"),
        ],
        "doc_id long, text string",
    )
    _stage(batch2, tmp_path / "s2", src, "b2.parquet")
    q = start_dedup_ingest(spark, str(src), str(corpus), str(ckpt))
    q.awaitTermination()
    assert _corpus_ids(spark, corpus) == {1, 2, 11, 13}

    # nothing new: same checkpoint processes nothing, corpus unchanged
    q = start_dedup_ingest(spark, str(src), str(corpus), str(ckpt))
    q.awaitTermination()
    assert _corpus_ids(spark, corpus) == {1, 2, 11, 13}


def test_multi_microbatch_run_dedups_across_batches(spark, tmp_path):
    """One availableNow run split by maxFilesPerTrigger=1 must process
    each staged file as its own micro-batch, with later batches deduped
    against earlier batches' committed output."""
    from mapreduceframework_cpp_spark.streaming.ingest_dedup import (
        start_dedup_ingest,
    )

    src, ckpt, corpus = tmp_path / "src", tmp_path / "ckpt", tmp_path / "corpus"
    b1 = spark.createDataFrame([(1, BASE), (2, OTHER)], "doc_id long, text string")
    # 30 = near-dup of file-1's doc 1 → must be rejected by batch 2
    b2 = spark.createDataFrame(
        [(30, BASE + " coda"), (31, THIRD)], "doc_id long, text string"
    )
    _stage(b1, tmp_path / "s1", src, "b1.parquet")
    _stage(b2, tmp_path / "s2", src, "b2.parquet")

    q = start_dedup_ingest(
        spark, str(src), str(corpus), str(ckpt), max_files_per_trigger=1
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # really ran as separate batches
    assert _corpus_ids(spark, corpus) == {1, 2, 31}


def test_precomputed_corpus_index_roundtrips_through_parquet(spark, sf_dir, tmp_path):
    """The 100 TB ingest shape: the corpus band index is computed once,
    persisted, and read back per batch — results must be identical to
    recomputing it from the corpus documents."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.operators.dedup import (
        incremental_near_dups,
        lsh_banded,
        shingle_arrays,
    )
    from mapreduceframework_cpp_spark.sources.tables import tbl

    docs = tbl(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    ref = sorted(
        map(tuple, incremental_near_dups(
            corpus, batch, n=3, bands=32, rows_per_band=2, threshold=0.7
        ).collect())
    )

    arrays_p, banded_p = str(tmp_path / "arrays"), str(tmp_path / "banded")
    arrays = shingle_arrays(corpus, n=3)
    arrays.write.parquet(arrays_p)
    lsh_banded(arrays, bands=32, rows_per_band=2).write.parquet(banded_p)

    got = sorted(
        map(tuple, incremental_near_dups(
            corpus, batch, n=3, bands=32, rows_per_band=2, threshold=0.7,
            corpus_arrays=spark.read.parquet(arrays_p),
            corpus_banded=spark.read.parquet(banded_p),
        ).collect())
    )
    assert got == ref and ref  # identical, and the fixture finds pairs


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """At-least-once replay: re-running the SAME (batch, batch_id) after
    its output was already committed must reproduce the partition, not
    flag every doc as a near-dup of its own prior attempt and wipe it."""
    from mapreduceframework_cpp_spark.streaming.ingest_dedup import (
        process_dedup_batch,
    )

    corpus = tmp_path / "corpus"
    b0 = spark.createDataFrame([(1, BASE), (2, OTHER)], "doc_id long, text string")
    process_dedup_batch(b0, 0, str(corpus))
    assert _corpus_ids(spark, corpus) == {1, 2}

    # batch 1: doc 20 novel, doc 21 near-dup of corpus doc 1
    b1 = spark.createDataFrame(
        [(20, THIRD), (21, BASE + " tail")], "doc_id long, text string"
    )
    process_dedup_batch(b1, 1, str(corpus))
    assert _corpus_ids(spark, corpus) == {1, 2, 20}

    # replay batch 1 (foreachBatch at-least-once): identical outcome —
    # doc 20 must NOT be rejected as a dup of its own committed copy
    process_dedup_batch(b1, 1, str(corpus))
    assert _corpus_ids(spark, corpus) == {1, 2, 20}
