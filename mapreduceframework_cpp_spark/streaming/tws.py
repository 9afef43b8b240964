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
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

OUTPUT_SCHEMA = "user_id long, n_events long, n_types long"


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
