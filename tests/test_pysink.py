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
    old_files = committed_files(str(tmp_path))
    _rows(spark, 2, "new").coalesce(1).write.format("txn_files").mode(
        "overwrite"
    ).save(str(tmp_path))
    assert _read_back(spark, tmp_path) == [(0, "new0"), (1, "new1")]
    # superseded parts are unlisted but NOT deleted by the commit: a
    # reader that planned its scan on the prior snapshot must be able
    # to finish against intact files (ADVICE r10); vacuum reclaims
    # them past the retention window
    assert all(os.path.exists(f) for f in old_files)
    assert vacuum(str(tmp_path)) == 0  # default retention: too fresh
    assert all(os.path.exists(f) for f in old_files)
    assert vacuum(str(tmp_path), min_age_s=0) > 0
    assert not any(os.path.exists(f) for f in old_files)
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
    after = sorted(map(tuple, read_committed(spark, str(tmp_path), _SCHEMA).collect()))
    assert after == before
    # the small files linger for in-flight readers until vacuumed
    assert vacuum(str(tmp_path), min_age_s=0) > 0
    assert len(os.listdir(tmp_path / "_txn")) == 1  # old commits reclaimed
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


def test_vacuum_orphan_clock_starts_at_rename(tmp_path):
    """ADVICE r10: os.replace preserves the staged file's mtime, so a
    slow job whose tasks staged parts long before the driver reached
    publish must NOT have its freshly renamed (but not yet manifested)
    parts reaped by a concurrent vacuum — parts are touched at rename,
    and the orphan age guard therefore measures the rename→claim
    window, not task runtime."""
    import time

    from mapreduceframework_cpp_spark.sources.pysink import (
        _rename_parts,
        _stage_rows,
    )

    msg = _stage_rows(str(tmp_path), iter([Row(k=1, v="slow")]))
    staged = tmp_path / msg.staged
    old = time.time() - 7200  # staged two "hours" ago
    os.utime(staged, (old, old))
    doc = _rename_parts(str(tmp_path), [msg])  # crash before claim
    part = tmp_path / doc["files"][0]
    assert part.exists()
    # a vacuum with a 1h retention window runs during the rename→claim
    # crash window: the part was renamed JUST NOW, so it must survive
    assert vacuum(str(tmp_path), min_age_s=3600) == 0
    assert part.exists()
    # once genuinely old *as an orphan*, it is reclaimed
    os.utime(part, (old, old))
    assert vacuum(str(tmp_path), min_age_s=3600) == 1
    assert not part.exists()


def test_writer_style_mixing_rejected(spark, tmp_path):
    """ADVICE r10: batch manifests are sequence-numbered, streaming
    manifests batchId-numbered; interleaving them in one generation
    would conflate the numberings and corrupt snapshot/change order.
    Appending the other style raises; a batch OVERWRITE legitimately
    takes over a streaming table (new generation, sequence sorts after
    every batchId), after which the stream is locked out."""
    from mapreduceframework_cpp_spark.sources.pysink import (
        TxnFilesWriter,
        _visible_log,
    )

    register(spark)
    sw = TxnFilesStreamWriter(str(tmp_path))
    sw.commit([sw.write(iter([Row(k=1, v="s0")]))], batchId=0)
    sw.commit([sw.write(iter([Row(k=2, v="s1")]))], batchId=1)

    # batch APPEND into the streaming generation: refused, nothing
    # staged leaks into the table
    bw = TxnFilesWriter(str(tmp_path), overwrite=False)
    msg = bw.write(iter([Row(k=9, v="batch")]))
    with pytest.raises(ValueError, match="mixing writer styles"):
        bw.commit([msg])
    assert sorted(v for _, v in _read_back(spark, tmp_path)) == ["s0", "s1"]

    # maintenance (an overwrite commit) may take the table over — this
    # is how compact/recluster stay legal on streaming tables
    compact(spark, str(tmp_path), _SCHEMA)
    assert sorted(v for _, v in _read_back(spark, tmp_path)) == ["s0", "s1"]
    assert len(_visible_log(str(tmp_path))) == 1

    # the stream (same checkpoint lineage, next batchId) is now locked
    # out instead of silently corrupting the batch generation's order
    msg2 = sw.write(iter([Row(k=3, v="s2")]))
    with pytest.raises(ValueError, match="mixing writer styles"):
        sw.commit([msg2], batchId=2)
    assert sorted(v for _, v in _read_back(spark, tmp_path)) == ["s0", "s1"]


def test_concurrent_append_writers_never_lose_a_commit(tmp_path):
    """VERDICT r10 item 3: the manifest protocol under real writer
    concurrency. Eight threads append-commit simultaneously through
    the full writer path; every commit must land (uuid-unique names
    commute), the visible log holds all eight, and no rows are lost or
    duplicated."""
    from concurrent.futures import ThreadPoolExecutor

    from mapreduceframework_cpp_spark.sources.pysink import (
        TxnFilesWriter,
        _visible_log,
    )

    def one(i: int) -> None:
        w = TxnFilesWriter(str(tmp_path), overwrite=False)
        w.commit([w.write(iter([Row(k=i, v=f"w{i}")]))])

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(one, range(8)))
    log = _visible_log(str(tmp_path))
    assert len(log) == 8
    assert sum(d["rows"] for d in log) == 8
    vals = sorted(
        json.loads(line)["v"]
        for f in committed_files(str(tmp_path))
        for line in open(f)
    )
    assert vals == [f"w{i}" for i in range(8)]


def test_concurrent_same_sequence_commits_are_total(tmp_path):
    """Deterministic interleaving of the worst race: two appenders and
    two overwriters all resolve _next_seq BEFORE any claim lands, so
    all four target the same sequence number. Append claims are
    uuid-unique and must BOTH survive; overwrite claims both land but
    exactly ONE generation wins (the later sorted name), and the
    sequence stays monotone afterwards."""
    from mapreduceframework_cpp_spark.sources.pysink import (
        TxnFilesStreamWriter as W,
        _next_seq,
        _publish,
        _visible_log,
    )
    import uuid as _uuid

    txn = str(tmp_path / "_txn")
    w = W(str(tmp_path))
    # both appenders freeze the same sequence (interleaving hook: the
    # seq read happens before either claim)
    seq = _next_seq(txn)
    assert seq == 0
    n1 = f"manifest-{seq:020d}-{_uuid.uuid4().hex[:8]}.json"
    n2 = f"manifest-{seq:020d}-{_uuid.uuid4().hex[:8]}.json"
    m1 = w.write(iter([Row(k=1, v="a1")]))
    m2 = w.write(iter([Row(k=2, v="a2")]))
    assert _publish(str(tmp_path), [m1], n1) is True
    assert _publish(str(tmp_path), [m2], n2) is True  # appends commute
    assert sum(d["rows"] for d in _visible_log(str(tmp_path))) == 2

    # two racing overwriters, same frozen sequence
    seq2 = _next_seq(txn)
    assert seq2 == 1  # monotone even after the same-seq double claim
    o1 = f"manifest-{seq2:020d}-{_uuid.uuid4().hex[:8]}.json"
    o2 = f"manifest-{seq2:020d}-{_uuid.uuid4().hex[:8]}.json"
    g1 = w.write(iter([Row(k=3, v="gen1")]))
    g2 = w.write(iter([Row(k=4, v="gen2")]))
    assert _publish(str(tmp_path), [g1], o1, replaces=True) is True
    assert _publish(str(tmp_path), [g2], o2, replaces=True) is True
    log = _visible_log(str(tmp_path))
    assert len(log) == 1  # exactly one generation visible
    winner = max(o1, o2)  # sorted-name order decides, totally
    content = "".join(open(f).read() for f in committed_files(str(tmp_path)))
    assert ("gen1" in content) == (winner == o1)
    assert ("gen2" in content) == (winner == o2)
    assert _next_seq(txn) == 2


def test_stream_crash_between_rename_and_claim_is_exactly_once(
    tmp_path, monkeypatch
):
    """VERDICT r10 item 6: kill the writer INSIDE the publish window —
    parts renamed, manifest claim never issued — then replay the batch
    (what a restarted stream does). The replay must commit exactly one
    copy; the crashed attempt's renamed parts stay invisible orphans
    until vacuum."""
    from mapreduceframework_cpp_spark.sources import pysink

    real_claim = pysink._claim_manifest
    crashes = {"armed": True}

    def claim_with_crash(txn, name, doc):
        if crashes["armed"]:
            crashes["armed"] = False
            raise RuntimeError("injected crash before manifest claim")
        return real_claim(txn, name, doc)

    monkeypatch.setattr(pysink, "_claim_manifest", claim_with_crash)
    w = TxnFilesStreamWriter(str(tmp_path))
    rows = [Row(k=1, v="once")]
    with pytest.raises(RuntimeError, match="injected crash"):
        w.commit([w.write(iter(rows))], batchId=0)
    # crash window state: a renamed part exists, nothing committed
    orphans = [f for f in os.listdir(tmp_path) if f.startswith("part-")]
    assert len(orphans) == 1
    assert committed_files(str(tmp_path)) == []
    # restart → the source replays batch 0 from the checkpoint
    w2 = TxnFilesStreamWriter(str(tmp_path))
    w2.commit([w2.write(iter(rows))], batchId=0)
    files = committed_files(str(tmp_path))
    assert len(files) == 1
    assert open(files[0]).read().count("once") == 1
    # second replay (restart after the successful commit) still no-ops
    w2.commit([w2.write(iter(rows))], batchId=0)
    assert committed_files(str(tmp_path)) == files
    # the crashed attempt's orphan is invisible and vacuumable
    assert vacuum(str(tmp_path), min_age_s=0) == 1
    assert committed_files(str(tmp_path)) == files
    assert len([f for f in os.listdir(tmp_path) if f.startswith("part-")]) == 1


def test_format_reader_symmetric_roundtrip(spark, tmp_path):
    """VERDICT r10 item 4: `spark.read.format("txn_files"|"txn_parquet")`
    is symmetric with the writer — no library helper, no user schema
    (the manifest carries the committed StructType), manifest-scoped
    visibility, asOf time travel through the format API."""
    register(spark)
    df = _rows(spark, 100).repartition(4)
    for fmt, path in (("txn_parquet", tmp_path / "pq"), ("txn_files", tmp_path / "js")):
        df.write.format(fmt).mode("append").save(str(path))
        back = spark.read.format(fmt).load(str(path))
        assert back.schema.simpleString() == "struct<k:bigint,v:string>"
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
        # staged/orphaned files stay invisible through the format API
        (path / "part-orphan.jsonl").write_text('{"k": 999, "v": "g"}\n')
        assert spark.read.format(fmt).load(str(path)).count() == 100
        # asOf: second commit invisible at snapshot 1
        _rows(spark, 5, "z").coalesce(1).write.format(fmt).mode("append").save(str(path))
        assert spark.read.format(fmt).option("asOf", 1).load(str(path)).count() == 100
        assert spark.read.format(fmt).load(str(path)).count() == 105


def test_format_reader_pushdown_prunes_partitions(spark, tmp_path):
    """The pushed key-range must shrink the PLANNED partition list (one
    partition per committed file) at the manifest, while the result
    stays exact — and a filter the zone maps cannot serve (no stats /
    cross-type) keeps files conservatively."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThanOrEqual,
    )

    from mapreduceframework_cpp_spark.sources.pysink import (
        TxnParquetDataSource,
        committed_entries,
    )

    register(spark)
    _rows(spark, 1000).repartitionByRange(10, "k").write.format(
        "txn_parquet"
    ).mode("append").save(str(tmp_path))
    total = len(committed_entries(str(tmp_path)))
    assert total == 10

    src = TxnParquetDataSource(
        options={"path": str(tmp_path), "pushdown": "true"}
    )
    rd = src.reader(src.schema())
    residual = rd.pushFilters(
        [GreaterThanOrEqual(("k",), 200), LessThanOrEqual(("k",), 250),
         IsNotNull(("k",))]
    )
    assert len(list(residual)) == 3  # ALL filters stay residual
    assert len(rd.partitions()) < total

    rd_eq = src.reader(src.schema())
    rd_eq.pushFilters([EqualTo(("k",), 42)])
    assert len(rd_eq.partitions()) == 1

    # impossible range → zero partitions, and the engine read of the
    # same predicate returns an empty (not failing) result
    rd_none = src.reader(src.schema())
    rd_none.pushFilters([GreaterThanOrEqual(("k",), 10_000)])
    assert rd_none.partitions() == []
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format("txn_parquet")
            .option("pushdown", "true")
            .load(str(tmp_path))
            .where("k between 200 and 250")
        )
        assert sorted(r.k for r in got.collect()) == list(range(200, 251))
        empty = (
            spark.read.format("txn_parquet")
            .option("pushdown", "true")
            .load(str(tmp_path))
            .where("k > 10000")
        )
        assert empty.count() == 0
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")

    # cross-type filter vs the stats: conservative, never wrong
    rd_str = src.reader(src.schema())
    rd_str.pushFilters([EqualTo(("k",), "not-a-number")])
    assert len(rd_str.partitions()) == total


def test_format_reader_empty_table_requires_schema(spark, tmp_path):
    register(spark)
    os.makedirs(tmp_path / "_txn")
    with pytest.raises(Exception, match="no committed schema"):
        spark.read.format("txn_files").load(str(tmp_path)).count()
    # explicit schema unblocks the read
    got = spark.read.format("txn_files").schema(_SCHEMA).load(str(tmp_path))
    assert got.count() == 0


def test_merge_into_prunes_and_upserts(spark, tmp_path):
    """File-pruned MERGE: on a range-clustered table, an upsert whose
    source spans a narrow key range rewrites ONLY the intersecting
    files (untouched part names survive verbatim), the delta commit's
    removes are applied atomically by readers, removed bytes persist
    until vacuum, and delete-mode removes matched rows only."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.sources.pysink import merge_into

    register(spark)
    _rows(spark, 1000).repartitionByRange(10, "k").write.format(
        "txn_parquet"
    ).mode("append").save(str(tmp_path))
    before = {os.path.basename(e["name"]) for e in committed_entries(str(tmp_path))}

    upd = spark.range(200, 260).select(
        F.col("id").alias("k"), F.lit("upd").alias("v")
    )
    stats = merge_into(spark, str(tmp_path), _SCHEMA, upd, "k")
    assert stats["files_total"] == 10
    assert stats["files_touched"] == 1  # 200..259 sits in one range file
    after = {os.path.basename(e["name"]) for e in committed_entries(str(tmp_path))}
    assert len(before & after) == 9  # untouched files survive verbatim
    back = read_committed(spark, str(tmp_path), _SCHEMA)
    assert back.count() == 1000
    assert back.where("v = 'upd'").count() == 60
    assert back.where("v like 'a%'").count() == 940
    # removed files persist for in-flight readers until vacuum
    removed = before - after
    assert removed and all(
        os.path.exists(tmp_path / n) for n in removed
    )
    assert vacuum(str(tmp_path)) == 0  # retention window
    assert vacuum(str(tmp_path), min_age_s=0) == len(removed)
    assert not any(os.path.exists(tmp_path / n) for n in removed)
    assert read_committed(spark, str(tmp_path), _SCHEMA).count() == 1000

    # inserts: keys beyond the table's range are appended
    ins = spark.range(5000, 5005).select(
        F.col("id").alias("k"), F.lit("ins").alias("v")
    )
    merge_into(spark, str(tmp_path), _SCHEMA, ins, "k")
    assert read_committed(spark, str(tmp_path), _SCHEMA).count() == 1005

    # delete mode: matched rows vanish, nothing inserted
    stats = merge_into(
        spark, str(tmp_path), _SCHEMA,
        spark.range(5000, 5010).select(F.col("id").alias("k")),
        "k", when_matched="delete",
    )
    back = read_committed(spark, str(tmp_path), _SCHEMA)
    assert back.count() == 1000
    assert back.where("v = 'ins'").count() == 0


def test_stream_source_tails_the_log(spark, tmp_path):
    """Streaming SOURCE over the manifest log: each availableNow run
    consumes exactly the commits since the checkpointed offset
    (exactly-once across restarts, empty windows emit nothing), and a
    maintenance/replaces commit inside the window raises instead of
    silently re-emitting rewritten rows."""
    import pyspark.sql.functions as F

    src = tmp_path / "table"
    out = tmp_path / "out"
    chk = tmp_path / "chk"

    def run_once():
        q = (
            spark.readStream.format("txn_files")
            .load(str(src))
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(str(out))
            )
            .option("checkpointLocation", str(chk))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    register(spark)
    _rows(spark, 3, "a").coalesce(1).write.format("txn_files").mode(
        "append"
    ).save(str(src))
    run_once()
    assert spark.read.parquet(str(out)).count() == 3
    # two more commits land; the restarted stream reads ONLY those
    _rows(spark, 4, "b").coalesce(1).write.format("txn_files").mode(
        "append"
    ).save(str(src))
    _rows(spark, 2, "c").coalesce(1).write.format("txn_files").mode(
        "append"
    ).save(str(src))
    run_once()
    got = spark.read.parquet(str(out))
    assert got.count() == 9
    assert got.where(F.col("v").startswith("a")).count() == 3  # no re-emit
    run_once()  # empty window: nothing new
    assert spark.read.parquet(str(out)).count() == 9
    # a replaces commit breaks append-only: the stream must refuse
    compact(spark, str(src), _SCHEMA)
    with pytest.raises(Exception, match="append-only"):
        run_once()


def test_in_filter_prunes_and_changes_guard(spark, tmp_path):
    """(round-11 self-review) The In filter's literal tuple is its
    `value` field — pushFilters must prune from it, not crash; and
    read_changes must refuse a window containing a delta commit (its
    files REWRITE earlier rows, so a CDC consumer would double-count
    survivors)."""
    import pyspark.sql.functions as F
    from pyspark.sql.datasource import In

    from mapreduceframework_cpp_spark.sources.pysink import (
        TxnParquetDataSource,
        merge_into,
    )

    register(spark)
    _rows(spark, 1000).repartitionByRange(10, "k").write.format(
        "txn_parquet"
    ).mode("append").save(str(tmp_path))
    src = TxnParquetDataSource(
        options={"path": str(tmp_path), "pushdown": "true"}
    )
    rd = src.reader(src.schema())
    rd.pushFilters([In(("k",), (205, 210, 250))])
    assert len(rd.partitions()) == 1  # all three literals in one file
    # end-to-end through the engine
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format("txn_parquet")
            .option("pushdown", "true")
            .load(str(tmp_path))
            .where(F.col("k").isin(205, 210, 250))
        )
        assert sorted(r.k for r in got.collect()) == [205, 210, 250]
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")

    # change windows refuse delta commits
    _rows(spark, 5, "z").coalesce(1).write.format("txn_parquet").mode(
        "append"
    ).save(str(tmp_path))  # commit 2: plain append — fine in a window
    assert read_changes(spark, str(tmp_path), _SCHEMA, 1, 2).count() == 5
    merge_into(
        spark, str(tmp_path), _SCHEMA,
        spark.range(100, 110).select(
            F.col("id").alias("k"), F.lit("m").alias("v")
        ),
        "k",
    )  # commit 3: delta
    with pytest.raises(ValueError, match="delta commit"):
        read_changes(spark, str(tmp_path), _SCHEMA, 1, 3)
    # a window BEFORE the delta commit still serves
    assert read_changes(spark, str(tmp_path), _SCHEMA, 1, 2).count() == 5


def test_narrow_schema_read_prunes_columns(spark, tmp_path):
    """An explicit narrow .schema() on the format read decodes only
    those parquet column chunks (iter_batches(columns=...)) — the
    file-level ReadSchema behavior — and still serves exact values, in
    the requested column order, including a column some files lack."""
    import pyspark.sql.functions as F

    register(spark)
    spark.range(100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") * 1.5).alias("x"),
    ).coalesce(1).write.format("txn_parquet").mode("append").save(str(tmp_path))
    narrow = spark.read.format("txn_parquet").schema("x double, k bigint").load(
        str(tmp_path)
    )
    assert narrow.columns == ["x", "k"]
    rows = sorted((r.k, r.x) for r in narrow.collect())
    assert rows[0] == (0, 0.0) and rows[99] == (99, 148.5)
    # a requested column absent from the file pads with nulls
    ghost = spark.read.format("txn_parquet").schema(
        "k bigint, missing string"
    ).load(str(tmp_path))
    assert ghost.where("missing is null").count() == 100


def test_delta_retention_clock_is_the_removing_manifest(spark, tmp_path):
    """Removed-by-merge files are reclaimed on the REMOVING manifest's
    age, not the parts' own mtimes: an old part removed by a fresh
    merge must survive the retention window (a reader that planned on
    the pre-merge snapshot may still be scanning it), and backdating
    the remover releases it."""
    import time

    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.sources.pysink import (
        _manifests,
        merge_into,
    )

    register(spark)
    _rows(spark, 100).coalesce(1).write.format("txn_parquet").mode(
        "append"
    ).save(str(tmp_path))
    old_part = committed_files(str(tmp_path))[0]
    stale = time.time() - 7200
    os.utime(old_part, (stale, stale))  # the data is two "hours" old
    merge_into(
        spark, str(tmp_path), _SCHEMA,
        spark.range(5).select(F.col("id").alias("k"), F.lit("m").alias("v")),
        "k",
    )
    assert os.path.exists(old_part)  # unlisted, not deleted
    # fresh remover: the old part survives a 1h retention vacuum even
    # though its own mtime is ancient
    assert vacuum(str(tmp_path), min_age_s=3600) == 0
    assert os.path.exists(old_part)
    # backdate the removing manifest (visibility was lost long ago)
    remover = [
        m for m in _manifests(str(tmp_path))
        if json.load(open(m)).get("removes")
    ][0]
    os.utime(remover, (stale, stale))
    assert vacuum(str(tmp_path), min_age_s=3600) == 1
    assert not os.path.exists(old_part)
    assert read_committed(spark, str(tmp_path), _SCHEMA).count() == 100


def test_schema_evolution_add_and_widen(spark, tmp_path):
    """Schema evolution at scan time: a later commit may ADD a column
    (files that predate it pad with typed nulls — and the merged
    schema must be nullable, or codegen reads the padding unchecked)
    or WIDEN a column (older files cast up). Works on both staged
    formats; time travel to the pre-evolution snapshot serves the old
    shape."""
    import pyspark.sql.functions as F

    register(spark)
    for fmt, path in (("txn_parquet", tmp_path / "pq"), ("txn_files", tmp_path / "js")):
        spark.range(5).select(
            F.col("id").alias("k"), F.lit("v1").alias("v")
        ).coalesce(1).write.format(fmt).mode("append").save(str(path))
        spark.range(5, 9).select(
            F.col("id").alias("k"),
            F.lit("v2").alias("v"),
            (F.col("id") * 10).alias("w"),
        ).coalesce(1).write.format(fmt).mode("append").save(str(path))
        back = spark.read.format(fmt).load(str(path))
        assert back.schema.simpleString() == "struct<k:bigint,v:string,w:bigint>"
        assert all(f.nullable for f in back.schema.fields)
        rows = sorted((r.k, r.w) for r in back.collect())
        assert rows[:5] == [(i, None) for i in range(5)]
        assert rows[5:] == [(i, i * 10) for i in range(5, 9)]
        # the pre-evolution snapshot still reads with the old shape
        s1 = spark.read.format(fmt).option("asOf", 1).load(str(path))
        assert s1.columns == ["k", "v", "w"]  # merged shape, null w
        assert s1.where("w is not null").count() == 0

    # widening: int32 files cast up when a later commit is int64
    wd = tmp_path / "wide"
    spark.range(3).select(F.col("id").cast("int").alias("k")).coalesce(1).write.format(
        "txn_parquet"
    ).mode("append").save(str(wd))
    spark.range(3, 5).select(F.col("id").alias("k")).coalesce(1).write.format(
        "txn_parquet"
    ).mode("append").save(str(wd))
    bw = spark.read.format("txn_parquet").load(str(wd))
    assert bw.schema.simpleString() == "struct<k:bigint>"
    assert sorted(r.k for r in bw.collect()) == [0, 1, 2, 3, 4]


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
