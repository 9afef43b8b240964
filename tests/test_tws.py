"""transformWithState (Spark 4 typed stateful streaming) — end-to-end
since r9 via the protobuf bridge (see streaming/pb_bridge.py): the
state-server protocol needs google.protobuf, which this container
lacks as a package but ships inside google-cloud-sdk; the bridge
aliases that copy for the driver and both Python-worker flavors. The
full stream-to-batch parity check runs wherever EITHER a real protobuf
or the sdk copy exists, and skips loudly only where neither does. The
processor's pure-Python state logic runs everywhere against stub state
handles — the part that is ours rather than the engine's.
"""

from __future__ import annotations

import pandas as pd
import pytest

_PB_TIER = None
try:  # pragma: no cover - environment probe
    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )

    _PB_TIER = install_protobuf_bridge()  # driver-side probe only
except ImportError:
    pass


class _StubValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _StubMapState:
    def __init__(self):
        self._m = {}

    def containsKey(self, k):
        return k in self._m

    def getValue(self, k):
        return self._m[k]

    def updateValue(self, k, v):
        self._m[k] = v

    def keys(self):
        return iter(self._m)


class _StubListState:
    def __init__(self):
        self._l = []

    def appendList(self, rows):
        self._l.extend(rows)

    def put(self, rows):
        self._l = list(rows)

    def get(self):
        return iter(list(self._l))

    def clear(self):
        self._l = []


class _StubHandle:
    def __init__(self):
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return _StubValueState()

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return _StubMapState()

    def getListState(self, name, schema, ttlDurationMs=None):
        return _StubListState()

    def registerTimer(self, ms):
        self.timers.add(ms)

    def deleteTimer(self, ms):
        self.timers.discard(ms)


def test_processor_state_logic_two_batches():
    """Counters accumulate across handleInputRows calls; distinct-type
    count reflects the union of batches (stub state, no engine)."""
    from mapreduceframework_cpp_spark.streaming.tws import (
        UserActivityProcessor,
    )

    p = UserActivityProcessor()
    p.init(_StubHandle())
    b1 = pd.DataFrame({"event_type": ["click", "click", "view"]})
    b2 = pd.DataFrame({"event_type": ["view", "purchase"]})
    (r1,) = list(p.handleInputRows((7,), iter([b1]), None))
    (r2,) = list(p.handleInputRows((7,), iter([b2]), None))
    assert r1.iloc[0].to_dict() == {"user_id": 7, "n_events": 3, "n_types": 2}
    assert r2.iloc[0].to_dict() == {"user_id": 7, "n_events": 5, "n_types": 3}


@pytest.mark.skipif(
    _PB_TIER is None,
    reason="transformWithState needs google.protobuf and neither the "
    "package nor the cloud-sdk copy the bridge aliases is on this host "
    "(see streaming/pb_bridge.py)",
)
def test_tws_stream_matches_batch(spark, sf_dir):
    """Full engine path: final emissions equal the batch groupBy count
    + distinct-type count. Runs through the same bridge + scoped
    RocksDB provider the registered q_stream_tws uses."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.sources.tables import tbl
    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )
    from mapreduceframework_cpp_spark.streaming.stream import (
        events_stream,
        run_to_memory,
    )
    from mapreduceframework_cpp_spark.streaming.tws import (
        user_activity_profile,
    )

    install_protobuf_bridge(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    emissions = run_to_memory(
        user_activity_profile(events_stream(spark, sf_dir)),
        name="tws_parity_sink",
        output_mode="update",
    )
    got = {
        r["user_id"]: (r["n"], r["t"])
        for r in emissions.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("n_types").alias("t"))
        .collect()
    }
    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in tbl(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("event_type").alias("t"),
        )
        .collect()
    }
    assert got == want

from mapreduceframework_cpp_spark.streaming.tws import (  # noqa: E402
    SESSION_DELAY_MS as DELAY,
    SESSION_GAP_MS as GAP,
)


class _ExpInfo:
    def __init__(self, ms):
        self._ms = ms

    def getExpiryTimeInMs(self):
        return self._ms


def test_session_assembler_state_logic():
    """Timer re-registration across batches, gap splitting at the fire,
    late-data timers never shrinking, and state clearing (stub state,
    no engine)."""
    from mapreduceframework_cpp_spark.streaming.tws import SessionAssembler

    p = SessionAssembler()
    h = _StubHandle()
    p.init(h)
    t0 = 1_700_000_000_000
    # batch 1: two events 5 min apart -> one timer at last+GAP
    b1 = pd.DataFrame({"ts_ms": [t0, t0 + 300_000]})
    assert list(p.handleInputRows((7,), iter([b1]), None)) == []
    assert h.timers == {t0 + 300_000 + GAP}
    # batch 2: a LATE event (before t0) must not shrink the timer
    b2 = pd.DataFrame({"ts_ms": [t0 - 60_000]})
    assert list(p.handleInputRows((7,), iter([b2]), None)) == []
    assert h.timers == {t0 + 300_000 + GAP}
    # batch 3: an event 2h later -> single timer moves forward
    t1 = t0 + 2 * 3_600_000
    b3 = pd.DataFrame({"ts_ms": [t1]})
    assert list(p.handleInputRows((7,), iter([b3]), None)) == []
    assert h.timers == {t1 + GAP}
    # fire: buffer gap-splits into two sessions; state clears
    (out,) = list(p.handleExpiredTimer((7,), None, _ExpInfo(t1 + GAP)))
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == [
        (7, t0 - 60_000, t0 + 300_000, 3),
        (7, t1, t1, 1),
    ]
    assert list(p._buf.get()) == []
    assert not p._timer.exists()
    # a second fire on cleared state emits nothing
    assert list(p.handleExpiredTimer((7,), None, _ExpInfo(t1 + GAP))) == []


@pytest.mark.skipif(
    _PB_TIER is None,
    reason="transformWithState needs google.protobuf (see pb_bridge.py)",
)
def test_session_assembler_multibatch_engine(spark, tmp_path):
    """Incremental multi-batch behavior on a hand-built two-file stream
    (maxFilesPerTrigger=1, mtime-ordered): user 1's session becomes
    fireable only after batch 2 advances the watermark, so its emission
    proves the timer-only trailing batch runs; user 2 (timer moved
    forward by its 6h-later event) and user 3 (too close to the stream
    max) must NOT emit. Every boundary below is minutes away from the
    gap/delay edges, so the assertion is exact."""
    import os
    import time

    from mapreduceframework_cpp_spark.streaming.tws import (
        SESSIONS_SCHEMA,
        SessionAssembler,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = tmp_path / "stream_in"
    src.mkdir()
    h = 3_600_000
    t0 = 1_700_000_000_000  # ms, whole seconds
    rows1 = [(1, t0), (1, t0 + 600_000), (2, t0 + 300_000)]
    rows2 = [(2, t0 + 6 * h), (3, t0 + 6 * h + 300_000)]

    def write(path, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts_ms"])
        pdf["ts"] = pd.to_datetime(pdf["ts_ms"], unit="ms")
        spark.createDataFrame(pdf[["user_id", "ts", "ts_ms"]]).coalesce(
            1
        ).write.mode("overwrite").parquet(path)

    write(str(src / "b1"), rows1)
    write(str(src / "b2"), rows2)
    now = time.time()
    for i, d in enumerate(("b1", "b2")):
        for f in (src / d).iterdir():
            os.utime(f, (now + i, now + i))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, ts_ms long")
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .load(str(src))
        .withWatermark("ts", "600 seconds")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionAssembler(),
            outputStructType=SESSIONS_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("tws_sessions_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.s_start, r.s_end, r.n_events)
        for r in spark.table("tws_sessions_multibatch").collect()
    }
    # batch1 wm=0; after batch1 wm=t0+600s-600s=t0 -> nothing fired yet.
    # batch2 runs with wm=t0: still < user1 expiry (t0+600s+GAP). After
    # batch2 wm = t0+6h+300s-600s; the final timer batch fires user 1
    # (expiry t0+600s+GAP <= wm) and NOT user 2 (expiry t0+6h+GAP > wm)
    # ... except user 2's batch-1 event (t0+300s) was merged into the
    # SAME buffer as its 6h-later event, timer moved forward: no emit.
    # User 3's expiry is also above the final wm: no emit.
    assert got == {(1, t0, t0 + 600_000, 2)}
    # the progress log must show >=3 batches (2 files + timer batch)
    assert len(q.recentProgress) >= 3


# ---------------------------------------------------------------------------
# Batch-split invariance of SessionAssembler (hypothesis, stub engine)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _batch_sessions(ts_by_user):
    """Reference gap-sessionization (the oracle's arithmetic)."""
    out = set()
    for u, ts in ts_by_user.items():
        ts = sorted(ts)
        start = prev = ts[0]
        n = 0
        for v in ts:
            if v - prev > GAP:
                out.add((u, start, prev, n))
                start, n = v, 0
            prev = v
            n += 1
        out.add((u, start, prev, n))
    return out


@st.composite
def _split_streams(draw):
    """A small multi-user event stream, globally sorted then split into
    contiguous batches — the in-order-enough regime where nothing is
    late relative to the watermark (each event's ts >= every earlier
    batch's max, hence > any watermark derived from it)."""
    n = draw(st.integers(1, 24))
    t0 = 1_700_000_000_000
    evs = sorted(
        (
            t0 + draw(st.integers(0, 8 * 3_600_000)),
            draw(st.integers(1, 3)),
        )
        for _ in range(n)
    )
    cuts = sorted(draw(st.sets(st.integers(1, n - 1), max_size=4))) if n > 1 else []
    batches, lo = [], 0
    for c in cuts + [n]:
        batches.append(evs[lo:c])
        lo = c
    return batches


@given(_split_streams())
@settings(max_examples=120, deadline=None)
def test_session_assembler_batch_split_invariants(batches):
    """Simulate Spark's protocol (per-batch input, watermark = floor-ms
    global max − delay updated AFTER each batch, eligible timers fired
    inclusively at each boundary and in a trailing pass) over random
    contiguous splits of a sorted stream. Invariants that must hold for
    EVERY split:

    (a) every emitted session is exactly a session of the batch
        gap-sessionization (boundaries and counts correct);
    (b) no session emits twice;
    (c) a user whose last event + gap <= final watermark has ALL their
        sessions emitted — the registered query's oracle predicate;
    (d) with no split at all (single batch), the emission set EQUALS
        the oracle set of (c) exactly.

    Mid-stream fires and bounded-state evictions may legitimately emit
    sessions of users (c) does not cover (provably closed at an
    intermediate watermark); (a)+(b) pin those to still be correct
    sessions. Additionally (e): after every input call the remaining
    buffer holds NO session the current watermark already closed — the
    bounded-state guarantee (an always-active user's state stays
    O(open session), the 100 TB property)."""
    from mapreduceframework_cpp_spark.streaming.tws import SessionAssembler

    class _TV:
        def __init__(self, wm):
            self._wm = wm

        def getCurrentWatermarkInMs(self):
            return self._wm

    procs, handles = {}, {}
    emitted = []
    wm = 0

    def fire_eligible(wm_now):
        for u, h in handles.items():
            for t in sorted(h.timers):
                if t <= wm_now:
                    h.deleteTimer(t)
                    for pdf in procs[u].handleExpiredTimer(
                        (u,), None, _ExpInfo(t)
                    ):
                        emitted.extend(
                            tuple(r) for r in pdf.itertuples(index=False)
                        )

    for batch in batches:
        if not batch:
            continue
        fire_eligible(wm)  # Spark evicts timers at the batch boundary
        by_user = {}
        for ts, u in batch:
            by_user.setdefault(u, []).append(ts)
        for u, ts in by_user.items():
            if u not in procs:
                procs[u] = SessionAssembler()
                handles[u] = _StubHandle()
                procs[u].init(handles[u])
            pdf = pd.DataFrame({"ts_ms": ts})
            for out in procs[u].handleInputRows((u,), iter([pdf]), _TV(wm)):
                emitted.extend(tuple(r) for r in out.itertuples(index=False))
            # (e) bounded state: nothing provably closed stays buffered
            buf = sorted(v[0] for v in procs[u]._buf.get())
            if buf:
                closed_left = [
                    s
                    for s in SessionAssembler._split(buf)
                    if s[1] + GAP < wm  # strict: the eviction bound
                ]
                assert closed_left == [], (u, wm, buf)
        wm = max(wm, max(ts for ts, _ in batch) - DELAY)
    fire_eligible(wm)  # the availableNow trailing batch

    ts_by_user = {}
    for b in batches:
        for ts, u in b:
            ts_by_user.setdefault(u, []).append(ts)
    oracle_all = _batch_sessions(ts_by_user)

    # (a) correctness of every emission
    assert set(emitted) <= oracle_all, (sorted(set(emitted) - oracle_all),)
    # (b) no duplicates
    assert len(emitted) == len(set(emitted))
    # (c) fired users are complete
    fired = {
        u for u, ts in ts_by_user.items() if max(ts) + GAP <= wm
    }
    want_fired = {s for s in oracle_all if s[0] in fired}
    assert want_fired <= set(emitted)
    # (d) the single-batch case equals the oracle exactly
    if len(batches) == 1:
        assert set(emitted) == want_fired


@pytest.mark.skipif(
    _PB_TIER is None,
    reason="transformWithState needs google.protobuf (see pb_bridge.py)",
)
def test_tws_initial_state_bootstrap(spark, sf_dir):
    """Snapshot-resume (handleInitialState) + TTL-configured state
    through the bridge: seed per-user counts from a batch snapshot,
    stream the events table, and require final counts = snapshot +
    streamed for seeded users and = streamed for unseeded ones. The
    snapshot deliberately includes a user id above the corpus range to
    prove seeds without stream rows stay silent (no spurious emission
    in update mode — emissions only come from handleInputRows)."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.sources.tables import tbl
    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )
    from mapreduceframework_cpp_spark.streaming.stream import (
        events_stream,
        run_to_memory,
    )
    from mapreduceframework_cpp_spark.streaming.tws import (
        bootstrapped_activity_profile,
    )

    install_protobuf_bridge(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    ev = tbl(spark, sf_dir, "events")
    users = sorted(r[0] for r in ev.select("user_id").distinct().collect())
    seeded = {users[0]: 1000, users[1]: 7, max(users) + 10_000: 5}
    snapshot = spark.createDataFrame(
        [(u, n) for u, n in seeded.items()], "user_id long, n_events long"
    )
    emissions = run_to_memory(
        bootstrapped_activity_profile(events_stream(spark, sf_dir), snapshot),
        name="tws_bootstrap_sink",
        output_mode="update",
    )
    got = {
        r["user_id"]: r["n"]
        for r in emissions.groupBy("user_id")
        .agg(F.max("n_events").alias("n"))
        .collect()
    }
    want = {
        r["user_id"]: r["n"] + seeded.get(r["user_id"], 0)
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    assert max(users) + 10_000 not in got  # seed-only keys stay silent


@pytest.mark.skipif(
    _PB_TIER is None,
    reason="transformWithState needs google.protobuf (see pb_bridge.py)",
)
def test_tws_ttl_state_protocol(spark, sf_dir):
    """TTL-configured state through the bridge (the state-server
    protocol's TTL-config messages, which plain states never send).
    PROBED (r9): processing-time mode never quiesces once TTL state
    exists — the engine keeps scheduling 'cleaning up state' batches,
    so BOTH availableNow termination AND processAllAvailable() hang;
    this polls the sink for the expected aggregate and then stops the
    query explicitly. The 24h TTL cannot expire mid-run, so counts
    must still be exact."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.sources.tables import tbl
    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )
    from mapreduceframework_cpp_spark.streaming.stream import events_stream
    from mapreduceframework_cpp_spark.streaming.tws import (
        bootstrapped_activity_profile,
    )

    install_protobuf_bridge(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    snapshot = spark.createDataFrame([(0, 11)], "user_id long, n_events long")
    sdf = bootstrapped_activity_profile(
        events_stream(spark, sf_dir), snapshot, ttl_ms=86_400_000
    )
    ev = tbl(spark, sf_dir, "events")
    want = {
        r["user_id"]: r["n"] + (11 if r["user_id"] == 0 else 0)
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }

    def sink():
        return {
            r["user_id"]: r["n"]
            for r in spark.table("tws_ttl_sink")
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n"))
            .collect()
        }

    import time

    q = (
        sdf.writeStream.format("memory")
        .queryName("tws_ttl_sink")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 180
        got = sink()
        while got != want and time.time() < deadline:
            time.sleep(2)
            got = sink()
    finally:
        q.stop()
    assert got == want


@pytest.mark.skipif(
    _PB_TIER is None,
    reason="transformWithState needs google.protobuf (see pb_bridge.py)",
)
def test_tws_state_survives_query_restart(spark, tmp_path):
    """Failure-recovery durability: typed TWS state must carry across a
    full query stop/start from the same checkpoint. Run 1 processes
    file b1 and stops; run 2 (a NEW query object, same checkpoint)
    discovers b2 and must CONTINUE the per-user counters from the
    RocksDB-checkpointed state rather than recount from zero."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )
    from mapreduceframework_cpp_spark.streaming.tws import (
        OUTPUT_SCHEMA,
        UserActivityProcessor,
    )

    install_protobuf_bridge(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write(name, rows):
        spark.createDataFrame(rows, "user_id long, event_type string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    def run(sink):
        # the memory sink refuses checkpoint recovery ("this query does
        # not support recovering from checkpoint location"), so emissions
        # land in a parquet dir via foreachBatch — the recoverable sink
        out_dir = str(tmp_path / sink)
        stream = (
            spark.readStream.schema("user_id long, event_type string")
            .format("parquet")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .load(str(src))
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=UserActivityProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.user_id): (r.n_events, r.n_types)
            for r in spark.read.parquet(out_dir)
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("n_types").alias("n_types"),
            )
            .collect()
        }

    write("b1", [(1, "click"), (1, "view"), (2, "click")])
    assert run("tws_restart_1") == {1: (2, 2), 2: (1, 1)}

    write("b2", [(1, "purchase"), (3, "view")])
    got = run("tws_restart_2")
    # user 1 continues from restored state (2+1 events, 3rd type);
    # user 2 has no new rows (update mode: no re-emission); user 3 new
    assert got == {1: (3, 3), 3: (1, 1)}


@pytest.mark.skipif(
    _PB_TIER is None,
    reason="transformWithState needs google.protobuf (see pb_bridge.py)",
)
def test_tws_sessions_partition_invariant(spark, sf_dir):
    """State-store partition-count invariance: the sessionizer's
    emission set must be identical whether the stream runs with 1
    shuffle partition (one state store instance) or many — the
    property that makes the operator trustworthy when a cluster sizes
    its state stores differently from the test box. Each run starts a
    fresh implicit checkpoint, so the partition count genuinely differs
    between runs."""
    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )
    from mapreduceframework_cpp_spark.streaming.stream import (
        events_stream,
        run_to_memory,
    )
    from mapreduceframework_cpp_spark.streaming.tws import session_assembler

    install_protobuf_bridge(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    results = {}
    try:
        for n in (1, 7):
            spark.conf.set(key, str(n))
            out = run_to_memory(
                session_assembler(events_stream(spark, sf_dir)),
                name=f"tws_sessions_pi_{n}",
                output_mode="append",
            )
            results[n] = sorted(map(tuple, out.collect()))
    finally:
        spark.conf.set(key, prev)
    assert results[1] == results[7]
    assert results[1], "invariance vacuous: no sessions emitted"

@pytest.mark.skipif(
    _PB_TIER is None,
    reason="transformWithState needs google.protobuf (see pb_bridge.py)",
)
def test_tws_sessions_survive_query_restart(spark, tmp_path):
    """Failure-recovery durability for the SESSIONIZER specifically
    (VERDICT r9 item 5): the counter-processor restart test proves
    typed state survives, but the sessionizer adds event-time timers +
    eviction, whose recovery semantics are the risk — a timer
    registered in run N must still fire in run N+1, and a session
    already emitted before a restart must NOT re-emit after it. Three
    runs from ONE checkpoint, a new file landing between each:

    run 1 (b1): buffers users 1/2, registers timers, fires nothing
      (wm = t0 after the batch — below every expiry).
    run 2 (b2): wm advances past user 1's RECOVERED timer -> user 1's
      session emits. User 2's timer moved forward by its 6h-later
      event; user 3 too close to the stream max. Nothing else emits.
    run 3 (b3, a far-future clock event): users 2 and 3 fire from
      recovered buffers; user 1 must NOT appear again (its state was
      cleared before the restart) and nothing may emit twice — the
      parquet sink keeps every append-mode emission, so multiset
      equality IS the no-double-emission proof."""
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )
    from mapreduceframework_cpp_spark.streaming.tws import session_assembler

    install_protobuf_bridge(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    out_dir = str(tmp_path / "out")
    src.mkdir()
    h = 3_600_000
    t0 = 1_700_000_000_000  # ms, whole seconds

    def write(name, rows):
        spark.createDataFrame(rows, "user_id long, ms long").select(
            "user_id", F.timestamp_millis("ms").alias("ts")
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    def run():
        stream = session_assembler(
            spark.readStream.schema("user_id long, ts timestamp")
            .format("parquet")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .load(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            map(tuple, spark.read.parquet(out_dir).collect())
        )

    write("b1", [(1, t0), (1, t0 + 600_000), (2, t0 + 300_000)])
    assert run() == []  # wm=t0 after b1: below every expiry

    write("b2", [(2, t0 + 6 * h), (3, t0 + 6 * h + 300_000)])
    assert run() == [(1, t0, t0 + 600_000, 2)]

    write("b3", [(9, t0 + 20 * h)])
    # wm = t0+20h-600s covers users 2 and 3; user 2's buffer recovered
    # across TWO restarts gap-splits into two singleton sessions. User
    # 1 absent (no re-emission), user 9 above the final wm.
    assert run() == [
        (1, t0, t0 + 600_000, 2),
        (2, t0 + 300_000, t0 + 300_000, 1),
        (2, t0 + 6 * h, t0 + 6 * h, 1),
        (3, t0 + 6 * h + 300_000, t0 + 6 * h + 300_000, 1),
    ]


@pytest.mark.skipif(
    _PB_TIER is None,
    reason="transformWithState needs google.protobuf (see pb_bridge.py)",
)
def test_tws_sessions_null_and_tied_rows(spark, tmp_path):
    """ADVICE r9 adversarial inputs the testdata happens not to contain:
    (a) duplicate (user_id, ms) pairs — possible after micros->ms
    flooring — where the oracle's two independent ORDER BY ms sorts
    could disagree on tie order (fixed with a RANGE-framed sid sum);
    (b) NULL ts rows, which used to reach handleInputRows as NaN and
    kill the query at int(); (c) NULL user_id rows. Engine and DuckDB
    oracle must agree exactly on a stream containing all three."""
    import duckdb
    import pyspark.sql.functions as F

    from mapreduceframework_cpp_spark.registry import all_oracles
    from mapreduceframework_cpp_spark.streaming.pb_bridge import (
        install_protobuf_bridge,
    )
    from mapreduceframework_cpp_spark.streaming.tws import (
        SESSION_GAP_MS,
        session_assembler,
    )

    install_protobuf_bridge(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    t0 = 1_700_000_000_000
    rows = [
        (5, t0), (5, t0), (5, t0 + 100),          # tied-minimum dup
        (6, t0), (6, t0 + SESSION_GAP_MS + 1000),  # two sessions
        (None, t0),                                # null key
        (7, None),                                 # null event time
        (99, t0 + 72_000_000),                     # clock: fires 5 & 6
    ]
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(rows, "user_id long, ms long").select(
        "user_id", F.timestamp_millis("ms").alias("ts")
    ).coalesce(1).write.parquet(str(src / "b1"))

    q = (
        session_assembler(
            spark.readStream.schema("user_id long, ts timestamp")
            .format("parquet")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .load(str(src))
        )
        .writeStream.format("memory")
        .queryName("tws_sessions_nulls")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(tuple, spark.table("tws_sessions_nulls").collect())
    )

    pdf = pd.DataFrame(rows, columns=["user_id", "ms"])
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    pdf["ts"] = pd.to_datetime(pdf["ms"], unit="ms")
    con = duckdb.connect()
    con.register("events", pdf[["user_id", "ts"]])
    want = sorted(
        map(
            tuple,
            con.execute(
                all_oracles()["q_stream_tws_sessions"]
            ).df().itertuples(index=False),
        )
    )
    assert got == want
    assert got == [
        (5, t0, t0 + 100, 3),
        (6, t0, t0, 1),
        (6, t0 + SESSION_GAP_MS + 1000, t0 + SESSION_GAP_MS + 1000, 1),
    ]
