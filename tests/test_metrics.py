"""plans/metrics.py: audit counters ride the production action
(Observation API) — no second scan, only the scalar metric row reaches
the driver."""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduceframework_cpp_spark.plans.metrics import metrics_of, observed
from mapreduceframework_cpp_spark.sources.tables import tbl


def test_observe_counts_ride_the_write(spark, sf_dir, tmp_path):
    docs = tbl(spark, sf_dir, "documents")
    df, obs = observed(
        docs,
        "ingest_audit",
        n_rows=F.count(F.lit(1)),
        n_null_text=F.count(F.when(F.col("text").isNull(), 1)),
        total_chars=F.sum(F.length("text")),
    )
    # the production action IS the metric collection
    df.write.format("noop").mode("overwrite").save()
    m = metrics_of(obs)
    n = docs.count()
    assert m["n_rows"] == n
    assert m["n_null_text"] == 0
    assert m["total_chars"] == docs.agg(F.sum(F.length("text"))).first()[0]


def test_observe_survives_filter_pushdown(spark, sf_dir):
    """Metrics attach at a chosen plan point: observing BEFORE a filter
    counts raw input rows even though the filter prunes the output —
    the drop-rate audit shape (rows_in vs rows_out in one pass)."""
    ev = tbl(spark, sf_dir, "events")
    pre, obs_in = observed(ev, "pre_filter", rows_in=F.count(F.lit(1)))
    kept, obs_out = observed(
        pre.filter(F.col("event_type") == "purchase"),
        "post_filter",
        rows_out=F.count(F.lit(1)),
    )
    kept.write.format("noop").mode("overwrite").save()
    rows_in = metrics_of(obs_in)["rows_in"]
    rows_out = metrics_of(obs_out)["rows_out"]
    assert rows_in == ev.count()
    assert rows_out == ev.filter(F.col("event_type") == "purchase").count()
    assert rows_out < rows_in
