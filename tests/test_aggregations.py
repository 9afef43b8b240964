from __future__ import annotations

from mapreduceframework_cpp_spark.registry import all_queries


def test_approx_distinct_within_4pct(spark, oracle_sf_dir, duck):
    """approx_count_distinct (HLL++) vs exact. The sketch is configured
    with rsd=0.02, so the bound is 4% = 2 sigma (ADVICE r6: the earlier
    2.5% bound left only ~1.25 sigma of headroom — deterministic for
    the frozen dataset, but a testdata regeneration or a Spark HLL++
    change could legitimately exceed it with no real bug). Measured
    relative error at sf0.01 is 0.95%; 2 sigma still fails loudly on a
    mis-configured sketch (rsd 0.05 would sit at ~2.5 sigma of ITS
    noise inside 4% only by luck). r9 ledger (tools/bounds_ledger.py):
    worst 1.00% at sf0.1 — the 2-sigma argument stands, NOT tightened
    despite 4x measured slack."""
    approx = (
        all_queries()["q_agg_approx_distinct"](spark, oracle_sf_dir)
        .collect()[0]["approx_parts"]
    )
    exact = duck.execute("SELECT count(DISTINCT l_partkey) FROM lineitem").fetchone()[0]
    assert abs(approx - exact) / exact <= 0.04, (approx, exact)


def test_approx_quantile_within_0p2pct(spark, oracle_sf_dir, duck):
    """GK-sketch quantiles at accuracy 10k within 0.2% of the exact
    interpolated percentile. Tightened from 1% in r9 (VERDICT r8 item
    7, tools/bounds_ledger.py): measured worst relative error is
    6.2e-5 at sf0.01 and 3.0e-4 at sf0.1, so 1% carried 33-160x slack;
    the sketch's own guarantee (rank error n/10000 = 1e-4 of rank) maps
    to well under 0.1% in value space on this totalprice distribution,
    leaving 0.2% ~ 6x the worst measurement — loud on a mis-configured
    sketch, safe against a testdata regeneration."""
    from mapreduceframework_cpp_spark.registry import all_queries

    row = all_queries()["q_agg_approx_quantile"](spark, oracle_sf_dir).collect()[0]
    exact = duck.execute(
        "SELECT quantile_cont(o_totalprice, 0.5), "
        "quantile_cont(o_totalprice, 0.95) FROM orders"
    ).fetchone()
    assert abs(row.p50 - exact[0]) / exact[0] <= 0.002, (row.p50, exact[0])
    assert abs(row.p95 - exact[1]) / exact[1] <= 0.002, (row.p95, exact[1])


def test_hll_rollup_within_2pct(spark, oracle_sf_dir, duck):
    """Daily HLL estimates AND the merged month estimate must land
    within 2% of exact distinct users — the union must not degrade
    accuracy (sketches merge losslessly). Tightened from 5% in r6:
    every daily and the merged monthly estimate measured EXACT at
    sf0.01; 2% keeps HLL-noise headroom at larger cardinalities.
    r9 ledger: worst 1.42% at sf0.1 — only 1.4x slack, stands."""
    from mapreduceframework_cpp_spark.registry import all_queries

    rows = all_queries()["q_agg_hll_rollup"](spark, oracle_sf_dir).collect()
    exact_day = dict(
        duck.execute(
            "SELECT CAST(date_trunc('day', ts) AS DATE), count(DISTINCT user_id) "
            "FROM events GROUP BY 1"
        ).fetchall()
    )
    exact_month = duck.execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    month_rows = [r for r in rows if r.day is None]
    assert len(month_rows) == 1
    assert abs(month_rows[0].approx_users - exact_month) / exact_month <= 0.02
    day_rows = [r for r in rows if r.day is not None]
    assert len(day_rows) == len(exact_day)
    for r in day_rows:
        exact = exact_day[r.day]
        assert abs(r.approx_users - exact) / exact <= 0.02, (r.day, r.approx_users, exact)


def test_theta_sketch_set_algebra_within_1pct(spark, oracle_sf_dir, duck):
    """Theta-sketch audience overlap: every estimate (each side, the
    intersection, the difference, the union) within 1% of exact.
    Tightened from 5% in r6: at sf0.01 the audience cardinalities sit
    below the sketch's retention threshold, so every estimate measured
    EXACT — 1% keeps headroom for a sketch-mode (sub-sampled) future
    dataset while still catching any real estimator drift. r9 ledger:
    still exact at sf0.1."""
    from mapreduceframework_cpp_spark.registry import all_queries

    (row,) = all_queries()["q_sketch_theta"](spark, oracle_sf_dir).collect()
    ex = dict(
        zip(
            ("n_click", "n_purchase", "n_both", "n_click_only", "n_either"),
            duck.execute(
                """
        WITH c AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'click'),
        p AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'purchase')
        SELECT (SELECT count(*) FROM c),
               (SELECT count(*) FROM p),
               (SELECT count(*) FROM c WHERE user_id IN (SELECT * FROM p)),
               (SELECT count(*) FROM c
                WHERE user_id NOT IN (SELECT * FROM p)),
               (SELECT count(*) FROM (SELECT * FROM c UNION
                                      SELECT * FROM p))
        """
            ).fetchone(),
        )
    )
    for k, exact in ex.items():
        got = row[k]
        assert abs(got - exact) <= max(1, 0.01 * exact), (k, got, exact)


def test_kll_quantiles_within_2pct(spark, oracle_sf_dir, duck):
    """KLL sketch p50/p95 per priority within 2% of exact quantiles.
    r6 measured the real error at sf0.01: 0.69% on an 8-partition
    session, 1.06% on the 32-wide test session standalone — but the
    estimate depends on sketch-merge order, and inside the full suite
    (same session, different task scheduling) it exceeded 1.5% once.
    2% is the honest bound for this sketch config; the deterministic
    sketches (theta/HLL/approx-distinct) carry the tight bounds.
    r9 ledger: worst 1.16% at sf0.1 — 1.7x slack, stands."""
    from mapreduceframework_cpp_spark.registry import all_queries

    rows = all_queries()["q_sketch_kll"](spark, oracle_sf_dir).collect()
    exact = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            """
        SELECT o_orderpriority,
               quantile_disc(o_totalprice, 0.5),
               quantile_disc(o_totalprice, 0.95)
        FROM orders GROUP BY 1
        """
        ).fetchall()
    }
    assert len(rows) == len(exact)
    for r in rows:
        e50, e95 = exact[r.o_orderpriority]
        assert abs(r.p50 - e50) / e50 <= 0.02, (r.o_orderpriority, r.p50, e50)
        assert abs(r.p95 - e95) / e95 <= 0.02, (r.o_orderpriority, r.p95, e95)
