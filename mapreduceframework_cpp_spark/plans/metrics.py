"""Query-time metrics via ``df.observe`` — counters collected DURING the
action, not by a second scan.

The reference kernel exposes job progress through ``getJobState``
(`MapReduceFramework.h:8-13`, polled by the client); the analog for
*data* counters (rows seen, nulls dropped, bytes of text ingested) on
Spark is the Observation API: named aggregate expressions evaluated
inside the running job as an AccumulatorV2 under the hood. At 100 TB
this is the difference between "audit counters are free" and "the audit
re-reads the lake": an ``observe`` node adds a per-task partial
aggregate to the existing scan, so data-quality counters (null rate,
domain violations, row volume) ride along with the production write.

Batch only — streaming queries surface the same metrics through
``StreamingQueryProgress.observedMetrics`` (see streaming/stream.py for
the progress surface).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions to ``df``; returns (df, observation).

    The metrics materialize on the observation after the FIRST action on
    the returned frame — zero extra scans, zero driver collection of
    data rows (only the scalar metric row travels back).
    """
    obs = Observation(name)
    aliased = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *aliased), obs


def metrics_of(obs: Observation) -> dict[str, Any]:
    """The collected metric row (blocks until the action has run)."""
    return dict(obs.get)
