#!/usr/bin/env python
"""Cheap host-noise probe: time ONLY the two bench sentinels, best-of-2,
against the calibration bands — ~40 s instead of a ~2.5 min full suite.

Run this BEFORE a full `python bench.py` whose artifact you intend to
commit: if the probe is out of band, the suite run will be too (the box
drifts 1.5-2x for stretches of tens of minutes — see the verify skill's
benchmarking notes). Exit status: 0 in-band, 1 out-of-band, 2 unknown
(no calibration file).

Fresh-session caveat: cold codegen over-reports heavy queries; the two
sentinels are chosen for LOW codegen weight and best-of-2 absorbs most
of the JIT warm-up, but treat a marginal (<10%) overshoot as ambiguous.

Usage::

    python tools/bench_probe.py
    BENCH_SENTINEL_FILE=... python tools/bench_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import bench
    from mapreduceframework_cpp_spark.operators.common import release_persisted
    from mapreduceframework_cpp_spark.session import get_spark

    bands = bench._load_sentinel_bands()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # measure under EXACTLY the engine bench.py runs (ADVICE r7: a bare
    # builder misses RUNTIME_CONFS — AQE/Arrow/UTC — plus the broadcast
    # threshold and driver memory, so probe timings sat under different
    # configs than the calibration bands they gate)
    spark = get_spark("bench-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    # same JVM/codegen warm-up as bench.py so the first timed run isn't
    # paying session startup
    bench._force(qs["q_scan_select_cols"](spark, sf_dir))

    vals: dict[str, float] = {}
    for name in ("q_agg_groupby", "q_scan_parquet"):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            bench._force(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            release_persisted()
        vals[name] = round(best, 3)
    if bands is None or set(bands) != set(vals):
        print(f"probe {vals} verdict=unknown (no/partial calibration)")
        return 2
    ok = all(lo <= vals[n] <= hi for n, (lo, hi) in bands.items())
    print(f"probe {vals} bands {bands} verdict={'quiet' if ok else 'NOISY'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
