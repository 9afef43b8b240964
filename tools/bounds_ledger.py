#!/usr/bin/env python
"""Staleness ledger for the rows-only sketch bounds (VERDICT r8 item 7).

The approximate-sketch queries carry measured-bound pytest evidence in
lieu of SQL-oracle hashes (tests/test_aggregations.py). Those bounds
were tightened in r6 from sf0.01 measurements; this tool re-measures
the ACTUAL relative errors at any scale so each bound can be audited
for slack:

    python tools/bounds_ledger.py                      # sf0.01
    BOUNDS_SF_DIR=/root/testdata/sf0.1 python tools/bounds_ledger.py

Prints one JSON line per query: the pinned pytest bound, the worst
measured relative error, and the slack ratio bound/measured. Bounds
whose r6 rationale is a sketch-sigma argument (approx_distinct 4% = 2
sigma at rsd 0.02) should NOT be tightened below that sigma no matter
the measured slack — the ledger records, the human (or the SURVEY
note) decides.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("BOUNDS_SF_DIR", "/root/testdata/sf0.01")

#: query -> the bound its pytest pins (tests/test_aggregations.py)
PINNED = {
    "q_agg_approx_distinct": 0.04,
    "q_agg_approx_quantile": 0.002,  # tightened r9 (was 0.01)
    "q_agg_hll_rollup": 0.02,
    "q_sketch_theta": 0.01,
    "q_sketch_kll": 0.02,
}


def main() -> None:
    import duckdb

    from mapreduceframework_cpp_spark.registry import all_queries
    from mapreduceframework_cpp_spark.session import get_spark
    import mapreduceframework_cpp_spark.queries  # noqa: F401

    spark = get_spark("bounds-ledger")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in ("lineitem", "orders", "events"):
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    q = all_queries()

    def rel(approx, exact):
        return abs(approx - exact) / exact if exact else 0.0

    worst: dict[str, float] = {}

    approx = q["q_agg_approx_distinct"](spark, SF_DIR).collect()[0]["approx_parts"]
    exact = duck.execute(
        "SELECT count(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()[0]
    worst["q_agg_approx_distinct"] = rel(approx, exact)

    row = q["q_agg_approx_quantile"](spark, SF_DIR).collect()[0]
    e50, e95 = duck.execute(
        "SELECT quantile_cont(o_totalprice, 0.5), "
        "quantile_cont(o_totalprice, 0.95) FROM orders"
    ).fetchone()
    worst["q_agg_approx_quantile"] = max(rel(row.p50, e50), rel(row.p95, e95))

    rows = q["q_agg_hll_rollup"](spark, SF_DIR).collect()
    exact_day = dict(
        duck.execute(
            "SELECT CAST(date_trunc('day', ts) AS DATE), "
            "count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    exact_month = duck.execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    errs = [
        rel(r.approx_users, exact_month if r.day is None else exact_day[r.day])
        for r in rows
    ]
    worst["q_agg_hll_rollup"] = max(errs)

    (trow,) = q["q_sketch_theta"](spark, SF_DIR).collect()
    ex = dict(
        zip(
            ("n_click", "n_purchase", "n_both", "n_click_only", "n_either"),
            duck.execute(
                """
        WITH c AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'click'),
        p AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'purchase')
        SELECT (SELECT count(*) FROM c), (SELECT count(*) FROM p),
               (SELECT count(*) FROM c WHERE user_id IN (SELECT * FROM p)),
               (SELECT count(*) FROM c
                WHERE user_id NOT IN (SELECT * FROM p)),
               (SELECT count(*) FROM (SELECT * FROM c UNION
                                      SELECT * FROM p))
        """
            ).fetchone(),
        )
    )
    worst["q_sketch_theta"] = max(rel(trow[k], v) for k, v in ex.items())

    rows = q["q_sketch_kll"](spark, SF_DIR).collect()
    exact = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            "SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5), "
            "quantile_disc(o_totalprice, 0.95) FROM orders GROUP BY 1"
        ).fetchall()
    }
    worst["q_sketch_kll"] = max(
        max(rel(r.p50, exact[r.o_orderpriority][0]),
            rel(r.p95, exact[r.o_orderpriority][1]))
        for r in rows
    )

    for name, bound in PINNED.items():
        err = worst[name]
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": SF_DIR,
                    "pinned_bound": bound,
                    "worst_rel_err": round(err, 6),
                    "slack": round(bound / err, 2) if err else None,
                }
            )
        )


if __name__ == "__main__":
    main()
