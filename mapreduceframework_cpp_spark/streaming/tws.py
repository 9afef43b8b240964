"""transformWithState stateful streaming (Spark 4's successor to
``applyInPandasWithState`` — see streaming/stateful.py for the legacy
surface): typed, composable per-key state primitives (ValueState /
ListState / MapState, timers) managed by the engine's state store.

The processor here maintains, per user, a running event count
(ValueState) AND a per-event-type count map (MapState) — the keyed
multi-state shape (counter + set membership) that the single
struct-typed state of the legacy API forces users to hand-encode. Same
kernel correspondence as stateful.py: the framework hands user code the
grouped rows plus persistent context (``MapReduceClient.h:61-64``),
now with state as named typed handles instead of one tuple.

Scale: state lives in the executor state store partitioned by key,
checkpoint-backed; emissions are per-batch updates, so the final value
per key is the max over emissions (monotone counters) — no driver
involvement on the unbounded path.

DEPENDENCY (bridged since r9): Spark's Python state-server protocol
imports ``google.protobuf``, which this container does not ship as a
package — streaming/pb_bridge.py aliases the pure-python protobuf
runtime vendored inside google-cloud-sdk into the canonical namespace
(driver + both worker flavors), so the END-TO-END run now works here:
tests/test_tws.py runs the full stream-to-batch parity check and
q_stream_tws (queries/streaming_windows.py) is SQL-oracle-registered.
On hosts with a real protobuf package the bridge is a no-op; on hosts
with neither, install_protobuf_bridge raises and the test skips,
loudly. TWS needs a column-family-capable state store —
RocksDBStateStoreProvider, set per-query with restore.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

OUTPUT_SCHEMA = "user_id long, n_events long, n_types long"

#: Session gap and watermark delay for the event-time-timer sessionizer,
#: in ms (the timer API's unit). Both are part of q_stream_tws_sessions'
#: oracle contract — change them there too.
SESSION_GAP_MS = 30 * 60 * 1000
SESSION_DELAY_MS = 10 * 60 * 1000
SESSIONS_SCHEMA = "user_id long, s_start long, s_end long, n_events long"


class UserActivityProcessor(StatefulProcessor):
    """Per-user running totals with two independent typed states."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n", "n long")
        self._types = handle.getMapState("types", "t string", "c long")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
            for t, c in pdf["event_type"].value_counts().items():
                prev = (
                    self._types.getValue((t,))[0]
                    if self._types.containsKey((t,))
                    else 0
                )
                self._types.updateValue((t,), (prev + int(c),))
        self._n.update((n,))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "n_types": [n_types]}
        )

    def close(self) -> None:
        pass


class BootstrappedActivityProcessor(UserActivityProcessor):
    """UserActivityProcessor seeded from a batch snapshot — the
    snapshot-resume surface (``handleInitialState``): an incremental
    pipeline restarts from a persisted per-key aggregate instead of
    replaying history. The engine calls ``handleInitialState`` once per
    key in the FIRST batch with that key's row of the ``initialState``
    grouped frame; counters then continue from the seed.

    ``ttl_ms`` optionally declares the seed ValueState with a TTL —
    the engine only permits that under ``timeMode="ProcessingTime"``,
    and PROBED (r9): a processing-time query under an availableNow
    trigger NEVER terminates once TTL state exists — the engine keeps
    scheduling "no new data but cleaning up state" batches, each of
    which advances processing time and schedules the next. TTL'd
    streams must run a normal trigger and be stopped explicitly
    (``processAllAvailable()`` + ``stop()``, tests/test_tws.py); the
    availableNow/oracle path stays TTL-free and ``timeMode="None"``."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n", "n long", ttlDurationMs=self._ttl_ms)
        self._types = handle.getMapState("types", "t string", "c long")

    def handleInitialState(
        self, key: Any, initialState: pd.DataFrame, timerValues: TimerValues
    ) -> None:
        self._n.update((int(initialState["n_events"].iloc[0]),))


def bootstrapped_activity_profile(
    events: DataFrame, snapshot: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Per-user running event counts resumed from a batch snapshot
    (columns: user_id, n_events); distinct-type counts restart fresh."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=BootstrappedActivityProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms else "None",
        initialState=snapshot.groupBy("user_id"),
    )


class SessionAssembler(StatefulProcessor):
    """Streaming sessionization via event-time timers + ListState — the
    canonical buffer-until-closed pattern the timer API exists for.

    Per user: every batch appends the arriving event times (floor-ms,
    the timer unit) to a ListState buffer and re-registers ONE timer at
    ``last_event + SESSION_GAP_MS``. When the watermark passes that
    expiry (probed on this Spark build: fire condition is
    ``expiry <= watermark``, watermark = floor-ms(max event time) −
    delay, micros FLOORED not rounded), every session in the buffer is
    closed by definition — the buffer is gap-split, all sessions emit
    at once, and state + timer are cleared. A user whose last event is
    within ``gap + delay`` of the stream's max event time never fires
    and emits nothing; the SQL oracle restates exactly that.

    Kernel correspondence: reduce-with-context over a grouped stream
    (``MapReduceClient.h:61-64``) where the framework, not the user,
    decides when a group is complete — the piece the reference's
    barrier-then-reduce design (MapReduceFramework.cpp:162-166) cannot
    express incrementally.

    Scale — BOUNDED STATE: a key's buffer is NOT its whole history.
    Every input batch also evicts-and-emits the buffered sessions the
    current watermark already proves closed (``end + gap < wm``,
    STRICT — at ``end + gap == wm`` an on-time event at exactly
    ``ts == wm`` could still merge under the batch ``diff > gap``
    rule), so an always-active user holds only events within
    ~gap+delay of their frontier, O(one open session), not O(stream).
    Under the registered query's single-batch availableNow run the
    input batch sees wm=0 and the eager path is a no-op, so the
    oracle's fired-user predicate is unchanged; the eviction matters
    exactly where it must — long-running incremental streams.
    Boundary caveat: the ENGINE's timer fire is inclusive
    (``expiry <= wm``, probed), so after a fire an event landing at
    exactly ``ts == wm == last+gap`` starts a new session where batch
    sessionization would merge — a 1-ms-exact collision inherent to
    the engine's fire semantics; the strict eviction bound never
    widens that window. State is partitioned across executors by the group key
    and checkpoint-backed; emission is append-mode only, no driver
    involvement. Note the quantum: this operator sessionizes on the
    timer's ms grid, while the batch q_events_sessionize compares raw
    micros — sub-ms gaps land identically only because the gap is
    minutes.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._h = handle
        self._buf = handle.getListState("ts_buf", "ts_ms long")
        self._timer = handle.getValueState("timer", "t long")

    @staticmethod
    def _split(ts: list[int]) -> list[tuple[int, int, int]]:
        """Gap-split a sorted ts list into (start, end, n) sessions."""
        out: list[tuple[int, int, int]] = []
        start = prev = ts[0]
        n = 0
        for v in ts:
            if v - prev > SESSION_GAP_MS:
                out.append((start, prev, n))
                start, n = v, 0
            prev = v
            n += 1
        out.append((start, prev, n))
        return out

    def _emit(self, key: Any, sessions: list[tuple[int, int, int]]):
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(sessions),
                "s_start": [s[0] for s in sessions],
                "s_end": [s[1] for s in sessions],
                "n_events": [s[2] for s in sessions],
            }
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        mx = None
        for pdf in rows:
            if not len(pdf):
                continue
            vals = [int(v) for v in pdf["ts_ms"]]
            self._buf.appendList([(v,) for v in vals])
            hi = max(vals)
            mx = hi if mx is None else max(mx, hi)
        if mx is None:
            return iter(())
        expiry = mx + SESSION_GAP_MS
        if not self._timer.exists():
            self._h.registerTimer(expiry)
            self._timer.update((expiry,))
        elif (old := self._timer.get()[0]) < expiry:
            # late rows only extend the timer, never shrink it
            self._h.deleteTimer(old)
            self._h.registerTimer(expiry)
            self._timer.update((expiry,))
        # Bounded-state eviction: emit buffered sessions the watermark
        # already proves closed; keep only the still-extendable tail.
        # Sessions are time-ordered with strictly increasing ends, so
        # the closed ones form a prefix. STRICT `<`: an on-time event
        # at exactly ts == wm == end+gap would still merge into the
        # session under the batch `diff > gap` rule, so end+gap == wm
        # is NOT yet provably closed (the engine's own timer fire is
        # inclusive at that boundary — see the class docstring caveat).
        wm = timerValues.getCurrentWatermarkInMs() if timerValues else 0
        if wm <= 0:
            return iter(())
        ts = sorted(v[0] for v in self._buf.get())
        sessions = self._split(ts)
        closed = [s for s in sessions if s[1] + SESSION_GAP_MS < wm]
        if not closed:
            return iter(())
        keep = [(v,) for v in ts if v > closed[-1][1]]
        if keep:
            self._buf.put(keep)
        else:  # every buffered event was provably closed out
            self._buf.clear()
        return self._emit(key, closed)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # key arrives as a tuple in handleInputRows but as a Row here;
        # positional access covers both (probed on this Spark build).
        ts = sorted(v[0] for v in self._buf.get())
        self._buf.clear()
        self._timer.clear()
        if not ts:
            return iter(())
        return self._emit(key, self._split(ts))

    def close(self) -> None:
        pass


def session_assembler(events: DataFrame) -> DataFrame:
    """Gap-sessionize an event stream with event-time timers; sessions
    emit (append mode) when the watermark proves them closed.

    ``ts_ms`` is computed ENGINE-SIDE with ``unix_millis`` (floor, the
    same integer every engine derives from the micros value) so the
    processor never touches pandas datetime dtypes; the raw timestamp
    column stays on the frame only to carry the watermark. The NTZ
    source column is cast through TIMESTAMP — the session timezone is
    UTC-pinned by session.tune(), so the instant is unchanged.
    NULL user_id AND NULL ts rows are dropped on BOTH sides (here and
    in the oracle's WHERE): sessionizing a null key is meaningless, a
    null event time would reach handleInputRows as NaN and kill the
    query at int() (ADVICE r9), and the oracle's equi-join would
    silently disagree with a null-key group (the q_text_fingerprint
    NULL lesson, ADVICE r8)."""
    ev = (
        events.filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.expr("unix_millis(cast(ts as timestamp))").alias("ts_ms"),
        )
        .withWatermark("ts", f"{SESSION_DELAY_MS // 1000} seconds")
    )
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionAssembler(),
        outputStructType=SESSIONS_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


def user_activity_profile(events: DataFrame) -> DataFrame:
    """Per-user (event count, distinct-type count) maintained across
    micro-batches in typed keyed state; update-mode emissions."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserActivityProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# Ship by value so executors without this package on PYTHONPATH can run
# the processor (same rationale as streaming/stateful.py).
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
