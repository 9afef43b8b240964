#!/usr/bin/env python
"""Emit the next round's VERIFY_ROTATION list.

The external verifier hash-checks only the first ~50 registered queries
per round, so queries/__init__.py reorders registration each round to
lead with whatever still lacks a green driver row. This script automates
building that list from the accumulated CORRECTNESS_r*.json evidence:

    python tools/next_rotation.py            # prints the 50-name window

Policy (mirrors rounds 2-3, amended round 10 per VERDICT r9 item 2):
queries with NO green row ever (err / hash-fail / never-in-window)
first, oldest registration first; then hash-green re-confirmations of
the STALEST driver evidence to fill the window. Terminal rows-only
queries (registered without an oracle) are EXCLUDED from re-confirm
backfill — a re-confirm slot on a ``no_oracle`` query can only ever
re-prove "returns rows", wasting driver hash-evidence capacity (round
9 burned 2 slots this way). A NEW rows-only registration still gets
its first slot via the unproven head.
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


def derive_next_window(paths, queries, oracles, planned=(), window=WINDOW):
    """Derive the next verification window from driver evidence.

    ``paths`` are the CORRECTNESS artifacts in round order; ``planned``
    is a sequence of already-committed future windows assumed to land
    clean (the standing pre-commit pattern — if one comes back red, the
    reds re-queue at the head per the standing policy, displacing the
    tail). Unproven queries lead in registration order; the remaining
    slots re-confirm the stalest SQL-oracle evidence, ordered by
    (latest round with a driver row, row order within that artifact).
    Rows-only queries never take a re-confirm slot (see module doc).

    tests/test_driver_contract.py imports this and asserts the
    committed ROUND{N+1}_ROTATION equals its output, so the committed
    plan can't diverge from the policy (the ADVICE-r4 lesson applied
    to window derivation, not just the green fold).
    """
    green = green_set(paths, oracles)
    latest: dict[str, tuple[int, int]] = {}
    for i, path in enumerate(paths):
        rows = json.load(open(path))
        for j, name in enumerate(rows):
            latest[name] = (i + 1, j)
    base = len(paths)
    for k, win in enumerate(planned):
        for j, name in enumerate(win):
            latest[name] = (base + k + 1, j)
        green |= set(win)
    unproven = [q for q in queries if q not in green]
    backfill = sorted(
        (q for q in queries if q in green and q in oracles),
        key=lambda q: latest.get(q, (0, 0)),
    )
    return (unproven + backfill)[:window], unproven


def main() -> None:
    queries = list(all_queries())
    oracles = set(all_oracles())
    window, unproven = derive_next_window(
        sorted(glob.glob("CORRECTNESS_r*.json")), queries, oracles
    )

    print(f"# {len(unproven)} unproven of {len(queries)} registered; "
          f"window={WINDOW}")
    print("VERIFY_ROTATION = [")
    for name in window:
        tag = "" if name in unproven else "  # re-confirm"
        print(f'    "{name}",{tag}')
    print("]")


if __name__ == "__main__":
    main()
