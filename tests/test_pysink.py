"""Transactional Python data sink (sources/pysink.py): batch commit /
abort atomicity, overwrite semantics, manifest-scoped visibility, and
the streaming writer's replayed-batch idempotence (the exactly-once
property the engine claims)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from mapreduceframework_cpp_spark.sources.pysink import (
    TxnFilesStreamWriter,
    committed_entries,
    committed_files,
    compact,
    read_changes,
    read_committed,
    read_committed_between,
    read_snapshot,
    register,
    vacuum,
)

_SCHEMA = "k bigint, v string"


def _rows(spark, n, tag="a"):
    return spark.range(n).select(
        F.col("id").alias("k"), F.concat(F.lit(tag), F.col("id")).alias("v")
    )


def _read_back(spark, path):
    return sorted(map(tuple, read_committed(spark, str(path), _SCHEMA).collect()))


def test_batch_roundtrip_and_visibility(spark, tmp_path):
    register(spark)
    df = _rows(spark, 20).repartition(4)
    df.write.format("txn_files").mode("append").save(str(tmp_path))
    assert _read_back(spark, tmp_path) == sorted(map(tuple, df.collect()))
    # staging drained, exactly one manifest, only part-* published
    assert os.listdir(tmp_path / "_staging") == []
    manifests = os.listdir(tmp_path / "_txn")
    assert len(manifests) == 1
    listed = json.load(open(tmp_path / "_txn" / manifests[0]))
    assert listed["rows"] == 20
    parts = [f for f in os.listdir(tmp_path) if f.startswith("part-")]
    assert sorted(parts) == sorted(listed["files"])


def test_empty_partitions_write_no_files(spark, tmp_path):
    register(spark)
    _rows(spark, 2).repartition(8).write.format("txn_files").mode("append").save(
        str(tmp_path)
    )
    listed = committed_files(str(tmp_path))
    assert 0 < len(listed) <= 2  # 6+ empty partitions stage nothing
    assert _read_back(spark, tmp_path) == [(0, "a0"), (1, "a1")]


def test_append_accumulates_manifests(spark, tmp_path):
    register(spark)
    for tag in ("a", "b"):
        _rows(spark, 3, tag).coalesce(1).write.format("txn_files").mode(
            "append"
        ).save(str(tmp_path))
    assert len(_read_back(spark, tmp_path)) == 6
    assert len(os.listdir(tmp_path / "_txn")) == 2


def test_overwrite_unpublishes_previous_commits(spark, tmp_path):
    register(spark)
    _rows(spark, 5, "old").coalesce(1).write.format("txn_files").mode("append").save(
        str(tmp_path)
    )
    _rows(spark, 2, "new").coalesce(1).write.format("txn_files").mode(
        "overwrite"
    ).save(str(tmp_path))
    assert _read_back(spark, tmp_path) == [(0, "new0"), (1, "new1")]
    # the old job's parts are physically reclaimed, not just unlisted
    assert len([f for f in os.listdir(tmp_path) if f.startswith("part-")]) == 1


def test_failed_job_leaves_nothing_visible(spark, tmp_path):
    register(spark)

    @F.udf("string")
    def boom(v):
        raise ValueError("injected task failure")

    df = _rows(spark, 4).select("k", boom("v").alias("v"))
    with pytest.raises(Exception, match="injected"):
        df.write.format("txn_files").mode("append").save(str(tmp_path))
    assert committed_files(str(tmp_path)) == []
    assert read_committed(spark, str(tmp_path), _SCHEMA).count() == 0


def test_read_ignores_unmanifested_files(spark, tmp_path):
    register(spark)
    _rows(spark, 3).coalesce(1).write.format("txn_files").mode("append").save(
        str(tmp_path)
    )
    # an orphaned part (crash between rename and manifest) and a staged
    # leftover must both be invisible to readers
    (tmp_path / "part-orphan.jsonl").write_text('{"k": 99, "v": "ghost"}\n')
    (tmp_path / "_staging" / "stage-zzz.jsonl").write_text('{"k": 98, "v": "g"}\n')
    assert _read_back(spark, tmp_path) == [(0, "a0"), (1, "a1"), (2, "a2")]


def test_stream_replayed_batch_is_discarded(tmp_path):
    """Direct protocol unit: a micro-batch re-delivered after a sink
    commit (restart inside the at-least-once window) must not double
    its rows — the batchId-keyed manifest detects the replay."""
    w = TxnFilesStreamWriter(str(tmp_path))
    rows = [Row(k=1, v="x"), Row(k=2, v="y")]
    w.commit([w.write(iter(rows))], batchId=0)
    first = committed_files(str(tmp_path))
    w.commit([w.write(iter(rows))], batchId=0)  # replay of batch 0
    assert committed_files(str(tmp_path)) == first
    assert os.listdir(tmp_path / "_staging") == []  # duplicate discarded
    w.commit([w.write(iter(rows))], batchId=1)  # a NEW batch still lands
    assert len(committed_files(str(tmp_path))) == 2


def test_stream_replay_race_loses_atomically(tmp_path):
    """The TOCTOU window: a replay that passes the exists-check before
    the first commit lands must still lose — the manifest claim is
    put-if-absent (os.link), not check-then-replace. Exercised by
    calling the publish layer directly with the same manifest name."""
    from mapreduceframework_cpp_spark.sources.pysink import (
        TxnFilesStreamWriter as W,
        _publish,
    )

    w = W(str(tmp_path))
    m1 = w.write(iter([Row(k=1, v="first")]))
    m2 = w.write(iter([Row(k=1, v="replay")]))
    assert _publish(str(tmp_path), [m1], "manifest-race.json") is True
    assert _publish(str(tmp_path), [m2], "manifest-race.json") is False
    files = committed_files(str(tmp_path))
    assert len(files) == 1
    assert "first" in open(files[0]).read()
    # the loser's renamed part was deleted, not orphaned
    assert len([f for f in os.listdir(tmp_path) if f.startswith("part-")]) == 1


def test_stream_abort_discards_staged(tmp_path):
    w = TxnFilesStreamWriter(str(tmp_path))
    msg = w.write(iter([Row(k=1, v="x")]))
    w.abort([msg, None], batchId=0)  # None = failed task's message
    assert committed_files(str(tmp_path)) == []
    assert os.listdir(tmp_path / "_staging") == []


def test_manifest_zone_maps_and_pruned_read(spark, tmp_path):
    """Range-clustered write → manifest stats are tight per file → a
    key-range read opens ONLY overlapping files, and the residual
    filter keeps the result exact."""
    register(spark)
    df = _rows(spark, 1000).repartitionByRange(10, "k")
    df.write.format("txn_files").mode("append").save(str(tmp_path))
    entries = committed_entries(str(tmp_path))
    assert len(entries) == 10
    for e in entries:
        assert set(e["stats"]) == {"k", "v"}
        assert e["stats"]["k"][0] <= e["stats"]["k"][1]
    kept = [
        e for e in entries
        if e["stats"]["k"][0] <= 250 and 200 <= e["stats"]["k"][1]
    ]
    assert len(kept) < len(entries)  # pruning has something to skip
    got = read_committed_between(spark, str(tmp_path), _SCHEMA, "k", 200, 250)
    assert sorted(r.k for r in got.collect()) == list(range(200, 251))
    # a file with NO stats for the column is kept conservatively
    import json as _json

    m = sorted((tmp_path / "_txn").glob("manifest-*.json"))[0]
    doc = _json.loads(m.read_text())
    doc["entries"][0]["stats"] = {}
    m.write_text(_json.dumps(doc))
    got2 = read_committed_between(spark, str(tmp_path), _SCHEMA, "k", 200, 250)
    assert got2.count() == 51


def test_snapshot_time_travel(spark, tmp_path):
    register(spark)
    _rows(spark, 3, "a").coalesce(1).write.format("txn_files").mode(
        "append"
    ).save(str(tmp_path))
    _rows(spark, 5, "b").coalesce(2).write.format("txn_files").mode(
        "append"
    ).save(str(tmp_path))
    s1 = read_snapshot(spark, str(tmp_path), _SCHEMA, as_of=1)
    assert sorted(r.v for r in s1.collect()) == ["a0", "a1", "a2"]
    s2 = read_snapshot(spark, str(tmp_path), _SCHEMA, as_of=2)
    assert s2.count() == 8


def test_overwrite_is_atomic_and_orders_after(spark, tmp_path):
    """The r10 review findings on the overwrite protocol: (a) a
    replaces commit supersedes earlier manifests the instant it lands
    — even while they are still on disk, readers must not see them;
    (b) post-overwrite appends must sort AFTER the overwrite
    (monotone sequence, not manifest count), keeping snapshot and
    change windows correct."""
    from mapreduceframework_cpp_spark.sources.pysink import (
        TxnFilesWriter,
        _visible_log,
    )

    register(spark)
    for tag in ("a", "b"):
        _rows(spark, 2, tag).coalesce(1).write.format("txn_files").mode(
            "append"
        ).save(str(tmp_path))
    # (a) atomic supersede: drive the writer directly so reclamation
    # can be observed separately from the claim
    w = TxnFilesWriter(str(tmp_path), overwrite=True)
    msg = w.write(iter([Row(k=9, v="ow")]))
    w.commit([msg])
    assert [r[1] for r in _read_back(spark, tmp_path)] == ["ow"]
    assert len(_visible_log(str(tmp_path))) == 1
    # (b) order: the next appends come after the overwrite generation
    for tag in ("c", "d"):
        _rows(spark, 1, tag).coalesce(1).write.format("txn_files").mode(
            "append"
        ).save(str(tmp_path))
    s1 = read_snapshot(spark, str(tmp_path), _SCHEMA, as_of=1)
    assert sorted(r.v for r in s1.collect()) == ["ow"]
    feed = read_changes(spark, str(tmp_path), _SCHEMA, 1, 3)
    assert sorted(r.v for r in feed.collect()) == ["c0", "d0"]


def test_stream_complete_mode_truncates_per_batch(tmp_path):
    """outputMode('complete') → Spark passes overwrite=True to
    streamWriter → each batch is a replaces commit holding the full
    state; the sink must not accumulate earlier batches' copies."""
    w = TxnFilesStreamWriter(str(tmp_path), truncate=True)
    w.commit([w.write(iter([Row(k=1, v="state1")]))], batchId=0)
    w.commit([w.write(iter([Row(k=1, v="state2"), Row(k=2, v="s2")]))], batchId=1)
    files = committed_files(str(tmp_path))
    content = "".join(open(f).read() for f in files)
    assert "state1" not in content and "state2" in content
    # replay of the latest batch is still discarded
    w.commit([w.write(iter([Row(k=1, v="replay")]))], batchId=1)
    assert committed_files(str(tmp_path)) == files


def test_string_zone_maps_truncated_and_sound(spark, tmp_path):
    """Wide string columns must not bloat manifests: bounds cap at 32
    chars, the upper bound rounds UP (so pruning stays sound), and a
    range read over the truncated column still returns exact rows."""
    register(spark)
    long_v = spark.sql(
        "SELECT id AS k, concat('prefix-', lpad(cast(id as string), 6, '0'),"
        " repeat('x', 500)) AS v FROM range(100)"
    ).repartitionByRange(4, "v")
    long_v.write.format("txn_files").mode("append").save(str(tmp_path))
    for e in committed_entries(str(tmp_path)):
        lo, hi = e["stats"]["v"]
        assert len(lo) <= 32 and len(hi) <= 33
        assert lo <= hi
    lo_q = "prefix-000010" + "x" * 500
    hi_q = "prefix-000019" + "x" * 500
    got = read_committed_between(
        spark, str(tmp_path), "k bigint, v string", "v", lo_q, hi_q
    )
    assert got.count() == 10


def test_read_changes_window(spark, tmp_path):
    """The change feed returns exactly the commits in (from, to] —
    commit 1 excluded, commits 2-3 included, nothing beyond."""
    register(spark)
    for n, tag in ((2, "a"), (3, "b"), (4, "c"), (5, "d")):
        _rows(spark, n, tag).coalesce(1).write.format("txn_files").mode(
            "append"
        ).save(str(tmp_path))
    feed = read_changes(spark, str(tmp_path), _SCHEMA, 1, 3)
    tags = sorted({r.v[0] for r in feed.collect()})
    assert tags == ["b", "c"]
    assert feed.count() == 7
    # empty window and full-history window
    assert read_changes(spark, str(tmp_path), _SCHEMA, 2, 2).count() == 0
    assert read_changes(spark, str(tmp_path), _SCHEMA, 0, 4).count() == 14


def test_vacuum_removes_only_invisible_files(spark, tmp_path):
    register(spark)
    _rows(spark, 5).coalesce(1).write.format("txn_files").mode("append").save(
        str(tmp_path)
    )
    (tmp_path / "part-orphan.jsonl").write_text('{"k": 9, "v": "g"}\n')
    (tmp_path / "_staging" / "stage-left.jsonl").write_text('{"k": 8, "v": "g"}\n')
    (tmp_path / "_txn" / ".tmp-dead").write_text("{}")
    before = _read_back(spark, tmp_path)
    # default age guard protects an in-flight commit's fresh files
    assert vacuum(str(tmp_path)) == 0
    assert (tmp_path / "part-orphan.jsonl").exists()
    # min_age_s=0 reaps everything invisible
    assert vacuum(str(tmp_path), min_age_s=0) == 3
    assert not (tmp_path / "part-orphan.jsonl").exists()
    assert os.listdir(tmp_path / "_staging") == []
    assert os.listdir(tmp_path / "_txn") != []  # manifest intact
    assert _read_back(spark, tmp_path) == before
    assert vacuum(str(tmp_path), min_age_s=0) == 0  # idempotent


def test_recluster_makes_zone_maps_effective(spark, tmp_path):
    """Hash layout → every file spans the key range → pruning keeps
    all files; recluster → range layout → the same window keeps few.
    Data identical before and after."""
    from mapreduceframework_cpp_spark.sources.pysink import recluster

    register(spark)
    _rows(spark, 1000).repartition(8).write.format("txn_files").mode(
        "append"
    ).save(str(tmp_path))
    before = _read_back(spark, tmp_path)

    def kept(lo, hi):
        return [
            e for e in committed_entries(str(tmp_path))
            if e["stats"]["k"][0] <= hi and lo <= e["stats"]["k"][1]
        ]

    assert len(kept(100, 150)) == 8  # hash layout: nothing prunable
    recluster(spark, str(tmp_path), _SCHEMA, "k", target_files=8)
    assert _read_back(spark, tmp_path) == before
    assert len(kept(100, 150)) <= 2  # tight spans: most files skipped
    got = read_committed_between(spark, str(tmp_path), _SCHEMA, "k", 100, 150)
    assert got.count() == 51


def test_compaction_atomic_and_lossless(spark, tmp_path):
    register(spark)
    _rows(spark, 100).repartition(8).write.format("txn_files").mode(
        "append"
    ).save(str(tmp_path))
    before = sorted(map(tuple, read_committed(spark, str(tmp_path), _SCHEMA).collect()))
    n_before = len(committed_files(str(tmp_path)))
    assert n_before > 1
    compact(spark, str(tmp_path), _SCHEMA)
    assert len(committed_files(str(tmp_path))) == 1
    assert len(os.listdir(tmp_path / "_txn")) == 1  # old commits reclaimed
    after = sorted(map(tuple, read_committed(spark, str(tmp_path), _SCHEMA).collect()))
    assert after == before
    # physical small files are gone, not just unlisted
    assert len([f for f in os.listdir(tmp_path) if f.startswith("part-")]) == 1


def test_arrow_sink_typed_roundtrip(spark, tmp_path):
    """txn_parquet carries types JSONL cannot: timestamps survive the
    round trip exactly; zone maps are collected vectorized."""
    register(spark)
    df = spark.sql(
        "SELECT id AS k, concat('v', id) AS v, "
        "timestamp_ntz'2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id)"
        " AS ts FROM range(100)"
    ).repartitionByRange(4, "k")
    df.write.format("txn_parquet").mode("append").save(str(tmp_path))
    schema = "k bigint, v string, ts timestamp_ntz"
    back = read_committed(spark, str(tmp_path), schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    entries = committed_entries(str(tmp_path))
    assert len(entries) == 4
    for e in entries:
        assert set(e["stats"]) == {"k", "v"}  # ts: no JSON zone map
    got = read_committed_between(spark, str(tmp_path), schema, "k", 10, 19)
    assert got.count() == 10


def test_arrow_sink_shares_txn_protocol(spark, tmp_path):
    """Abort and overwrite semantics are inherited unchanged by the
    Arrow writer (shared publish/discard helpers)."""
    register(spark)

    @F.udf("string")
    def boom2(v):
        raise ValueError("injected arrow failure")

    df = _rows(spark, 4).select("k", boom2("v").alias("v"))
    with pytest.raises(Exception, match="injected"):
        df.write.format("txn_parquet").mode("append").save(str(tmp_path))
    assert committed_files(str(tmp_path)) == []
    _rows(spark, 5, "old").coalesce(1).write.format("txn_parquet").mode(
        "append"
    ).save(str(tmp_path))
    _rows(spark, 2, "new").coalesce(1).write.format("txn_parquet").mode(
        "overwrite"
    ).save(str(tmp_path))
    assert _read_back(spark, tmp_path) == [(0, "new0"), (1, "new1")]


def test_arrow_sink_compact_keeps_format(spark, tmp_path):
    register(spark)
    _rows(spark, 50).repartition(6).write.format("txn_parquet").mode(
        "append"
    ).save(str(tmp_path))
    assert len(committed_files(str(tmp_path))) > 1
    compact(spark, str(tmp_path), _SCHEMA)
    files = committed_files(str(tmp_path))
    assert len(files) == 1 and files[0].endswith(".parquet")
    assert read_committed(spark, str(tmp_path), _SCHEMA).count() == 50


def test_arrow_stream_sink_multibatch(spark, tmp_path):
    register(spark)
    src = tmp_path / "src"
    src.mkdir()
    (src / "f1.jsonl").write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    (src / "f2.jsonl").write_text('{"k": 3, "v": "c"}\n')
    out = tmp_path / "out"
    q = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.format("txn_parquet")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start(str(out))
    )
    q.awaitTermination()
    assert _read_back(spark, out) == [(1, "a"), (2, "b"), (3, "c")]
    assert len(os.listdir(out / "_txn")) == 2
    assert all(f.endswith(".parquet") for f in committed_files(str(out)))


def test_stream_end_to_end_multibatch(spark, tmp_path):
    """Real writeStream: two input files under maxFilesPerTrigger=1 →
    two micro-batches → two manifests; read-back equals the batch
    read of the same input."""
    register(spark)
    src = tmp_path / "src"
    src.mkdir()
    (src / "f1.jsonl").write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    (src / "f2.jsonl").write_text('{"k": 3, "v": "c"}\n')
    out = tmp_path / "out"
    q = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.format("txn_files")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start(str(out))
    )
    q.awaitTermination()
    assert _read_back(spark, out) == [(1, "a"), (2, "b"), (3, "c")]
    assert len(os.listdir(out / "_txn")) == 2
