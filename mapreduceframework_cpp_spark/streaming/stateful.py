"""Custom stateful streaming operator (SURVEY.md §2.2-I, smoke-only).

``applyInPandasWithState`` is the engine's arbitrary-stateful surface —
the streaming analog of the reference's reduce-with-context
(``MapReduceClient.h:61-64``): the framework groups by key and hands the
user code the group plus persistent state, exactly as the reference hands
``reduce`` the grouped vector plus the job context.

The operator here keeps per-user running totals across micro-batches and
emits the updated row per batch. State lives in the executor state store
(checkpointed, partitioned by key) — no driver involvement, which is what
makes it viable on an unbounded stream at scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n_events long, total_value double"


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in keyed state.
    Works on a streaming DataFrame; each micro-batch emits the updated
    totals for users seen in that batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Ship the state-update function by VALUE (it is referenced by module
# path otherwise) so the stateful operator runs on executors that don't
# have this package on PYTHONPATH — same rationale as
# operators/multimodal and sources/pydatasource.
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
