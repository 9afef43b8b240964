"""Checkpointed incremental ingest: the exactly-once property that makes
file-source streaming the 100 TB catch-up path — a restarted query with
the same checkpoint processes each input file exactly once, picking up
only files that appeared since the last run."""

from __future__ import annotations

import shutil


def _stage_file(df, stage_dir, src_dir, name):
    """Write df as parquet and move its part file into the watched dir."""
    df.coalesce(1).write.mode("overwrite").parquet(str(stage_dir))
    part = next(p for p in stage_dir.iterdir() if p.name.startswith("part-"))
    src_dir.mkdir(exist_ok=True)
    shutil.copy(part, src_dir / name)


def _run_batch(spark, schema, src, ckpt, run_name):
    # foreachBatch is the checkpoint-recoverable sink (memory sink is not)
    seen: list[int] = []
    q = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .writeStream.foreachBatch(lambda bdf, _id: seen.append(bdf.count()))
        .queryName(run_name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(seen)


def test_checkpointed_ingest_is_exactly_once(spark, sf_dir, tmp_path):
    from mapreduceframework_cpp_spark.sources.tables import tbl

    ev = tbl(spark, sf_dir, "events")
    first = ev.filter("event_id % 2 = 0")
    second = ev.filter("event_id % 2 = 1")
    n1, n2 = first.count(), second.count()

    src, ckpt = tmp_path / "src", tmp_path / "ckpt"

    _stage_file(first, tmp_path / "stage1", src, "batch1.parquet")
    got1 = _run_batch(spark, ev.schema, src, ckpt, "ingest_run1")
    assert got1 == n1

    # new file arrives; same checkpoint → only the new file is processed
    _stage_file(second, tmp_path / "stage2", src, "batch2.parquet")
    got2 = _run_batch(spark, ev.schema, src, ckpt, "ingest_run2")
    assert got2 == n2, f"reprocessed old data: {got2} != {n2}"

    # a third run with nothing new processes nothing
    got3 = _run_batch(spark, ev.schema, src, ckpt, "ingest_run3")
    assert got3 == 0
