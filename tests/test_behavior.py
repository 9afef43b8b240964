"""Event-behavior family (queries/behavior.py): semantic invariants the
oracle diff can't express (it proves Spark==DuckDB; these prove both are
RIGHT), plus the plan property that makes sessionization one-shuffle."""

from __future__ import annotations

import contextlib
import io
from collections import defaultdict

from mapreduceframework_cpp_spark.registry import all_queries

_Q = all_queries()


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_win_dedup_keeps_latest_per_key(spark, sf_dir):
    rows = _Q["q_win_dedup"](spark, sf_dir).collect()
    keys = [(r.user_id, r.event_type) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate (user, type) survived"
    from mapreduceframework_cpp_spark.sources.tables import tbl

    ev = tbl(spark, sf_dir, "events")
    import pyspark.sql.functions as F

    max_ts = {
        (r.user_id, r.event_type): r.m
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.max("ts").alias("m"))
        .collect()
    }
    for r in rows:
        assert r.latest_ts == max_ts[(r.user_id, r.event_type)]


def test_sessionize_gap_semantics(spark, sf_dir):
    """Within a session every consecutive gap ≤ 30 min; consecutive
    sessions of one user are > 30 min apart; event counts conserve."""
    sess = _Q["q_events_sessionize"](spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in sess:
        by_user[r.user_id].append(r)
    ev_counts = defaultdict(int)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    for e in ev:
        ev_counts[e.user_id] += 1
    for uid, ss in by_user.items():
        ss.sort(key=lambda r: r.session_idx)
        assert [r.session_idx for r in ss] == list(range(1, len(ss) + 1))
        assert sum(r.n_events for r in ss) == ev_counts[uid]
        for a, b in zip(ss, ss[1:]):
            gap = (b.session_start - a.session_end).total_seconds()
            assert gap > 1800, (uid, a.session_idx, gap)
        for r in ss:
            assert r.session_start <= r.session_end


def test_sessionize_single_exchange(spark, sf_dir):
    """lag + running-sum share one window spec → exactly one shuffle
    before the final aggregate's (which AQE may add); the window sort
    must not be duplicated."""
    p = _plan(_Q["q_events_sessionize"](spark, sf_dir))
    # one Exchange for the user_id window, one for the groupBy — any more
    # means the two window functions stopped sharing their sort
    assert p.count("Exchange") <= 2, p


def test_funnel_is_monotone(spark, sf_dir):
    r = _Q["q_events_funnel"](spark, sf_dir).collect()[0]
    assert r.n_signup >= r.n_signup_view >= r.n_signup_view_purchase >= 0
    assert r.n_signup > 0  # testdata has signups


def test_retention_week0_equals_cohort(spark, sf_dir):
    """Every user is active in their own cohort week, so the
    weeks_since=0 cell must equal the cohort size, and no cell exceeds
    it."""
    rows = _Q["q_events_retention"](spark, sf_dir).collect()
    week0 = {r.cohort_wk: r.n_users for r in rows if r.weeks_since == 0}
    for r in rows:
        assert r.cohort_wk in week0
        assert r.n_users <= week0[r.cohort_wk], r
