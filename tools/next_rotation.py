#!/usr/bin/env python
"""Emit the next round's VERIFY_ROTATION list.

The external verifier hash-checks only the first ~50 registered queries
per round, so queries/__init__.py reorders registration each round to
lead with whatever still lacks a green driver row. This script automates
building that list from the accumulated CORRECTNESS_r*.json evidence:

    python tools/next_rotation.py            # prints the 50-name window

Policy (mirrors rounds 2-3): queries with NO green row ever (err /
hash-fail / never-in-window) first, oldest registration first; then
rows-only queries with no row this round; then hash-green
re-confirmations of the highest-value paths to fill the window.
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

from mapreduceframework_cpp_spark.registry import all_oracles, all_queries  # noqa: E402

WINDOW = 50


def green_set(paths, oracles) -> set[str]:
    """Fold driver CORRECTNESS rows into the set of driver-green names.

    THE single definition of "green" (ADVICE r4: the test suite used to
    carry a copy of this fold): SQL-oracle queries are green iff a row
    has hash_match and no err; rows-only queries are green iff a row ran
    clean (spark_rows present, err absent or the driver's "no_oracle"
    tag) — a clean run is the max driver signal a no-oracle query gets.
    tests/test_driver_contract.py imports this so policy can't diverge.
    """
    green: set[str] = set()
    for path in paths:
        rows = json.load(open(path))
        for name, r in rows.items():
            if name in oracles:
                if not r.get("err") and r.get("hash_match"):
                    green.add(name)
            elif r.get("spark_rows") is not None and r.get("err") in (
                None,
                "no_oracle",  # driver tags rows-only queries with this
            ):
                green.add(name)
    return green


def main() -> None:
    queries = list(all_queries())
    oracles = set(all_oracles())
    green = green_set(sorted(glob.glob("CORRECTNESS_r*.json")), oracles)
    unproven = [q for q in queries if q not in green]
    backfill = [q for q in queries if q in green]
    window = (unproven + backfill)[:WINDOW]

    print(f"# {len(unproven)} unproven of {len(queries)} registered; "
          f"window={WINDOW}")
    print("VERIFY_ROTATION = [")
    for name in window:
        tag = "" if name in unproven else "  # re-confirm"
        print(f'    "{name}",{tag}')
    print("]")


if __name__ == "__main__":
    main()
