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


class _StubHandle:
    def getValueState(self, name, schema, ttlDurationMs=None):
        return _StubValueState()

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return _StubMapState()


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
