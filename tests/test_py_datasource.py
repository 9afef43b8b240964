"""Custom Python DataSource (sources/pydatasource.py): partitioned batch
read, determinism (replayability), and the micro-batch stream reader."""

from __future__ import annotations

import time

from mapreduceframework_cpp_spark.sources.pydatasource import _row, register


def _read(spark, rows=200, parts=4):
    register(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
    )


def test_batch_read_partitioned_and_exact(spark):
    df = _read(spark, rows=200, parts=4)
    assert df.rdd.getNumPartitions() == 4
    got = {r.doc_id: (r.lang, r.text) for r in df.collect()}
    assert len(got) == 200
    for doc_id in (0, 1, 7, 199):
        want = _row(doc_id)
        assert got[doc_id] == (want[1], want[2])


def test_batch_read_replayable(spark):
    a = sorted(map(tuple, _read(spark).collect()))
    b = sorted(map(tuple, _read(spark).collect()))
    assert a == b


def test_stream_reader_microbatches(spark, tmp_path):
    register(spark)
    q = (
        spark.readStream.format("synthetic_docs")
        .option("batch_rows", 50)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM synth_stream").collect()[0].c
            if n >= 50:
                break
            time.sleep(0.5)
        rows = {
            r.doc_id: (r.lang, r.text)
            for r in spark.sql("SELECT * FROM synth_stream").collect()
        }
        assert len(rows) >= 50
        # offsets advance from 0 with no gaps, rows replayable-exact
        for doc_id in range(50):
            want = _row(doc_id)
            assert rows[doc_id] == (want[1], want[2])
    finally:
        q.stop()
