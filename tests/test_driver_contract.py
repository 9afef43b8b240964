"""Contract tests against the external verifier's canonicalizer.

The verifier collects each query's result into pandas and sorts on every
column; array/map/struct-typed cells make that sort raise (``TypeError:
unhashable type: 'numpy.ndarray'`` — exactly how three queries errored in
round 1). So the standing contract is: every registered query's FINAL
projection emits atomic (scalar) columns only. Complex values must be
serialized (``concat_ws`` / ``to_json``) before return, mirrored in the
DuckDB oracle (``array_to_string`` / ``to_json``).

Schema analysis only — nothing executes, so this covers all queries in
seconds and catches offenders at registration time, not verify time.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from mapreduceframework_cpp_spark.registry import all_queries

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_output_columns_are_atomic(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: non-atomic output columns {complex_cols} would crash the "
        "verifier's canonicalizer — serialize them (concat_ws/to_json) in the "
        "final projection and mirror in the oracle"
    )


def test_registration_follows_verify_rotation():
    """The verifier checks the first ~50 registered queries per round;
    queries/__init__.py declares the rotation explicitly. Guard that
    registration actually honors it, that the live round-6 window leads
    with the driver's 50 slots, and that every slot is spent on a query
    with NO green driver row in any prior round (r01-r05). The green
    fold is imported from tools/next_rotation.py::green_set (ADVICE r4:
    a local copy of the fold silently diverged from the CLI's policy)."""
    import os
    import sys

    from mapreduceframework_cpp_spark.queries import (
        ROUND5_ROTATION,
        ROUND6_ROTATION,
        VERIFY_ROTATION,
    )
    from mapreduceframework_cpp_spark.registry import all_oracles

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.next_rotation import green_set

    registered = list(_QUERIES)
    assert VERIFY_ROTATION is ROUND6_ROTATION  # the live window alias
    assert registered[: len(ROUND6_ROTATION)] == ROUND6_ROTATION
    # 51 committed names; the driver's 50-slot window takes the first
    # 50 and the last (q_geo_grid_clusters) spills to round 7.
    assert len(ROUND6_ROTATION) == 51
    assert ROUND6_ROTATION[-1] == "q_geo_grid_clusters"
    # window entries are unique
    assert len(set(ROUND6_ROTATION)) == len(ROUND6_ROTATION)

    oracles = set(all_oracles())
    # frozen artifacts, never change after their round lands
    green = green_set(
        [
            os.path.join(repo_root, f"CORRECTNESS_{r}.json")
            for r in ("r01", "r02", "r03", "r04", "r05")
        ],
        oracles,
    )
    assert not green & set(ROUND6_ROTATION), (
        "round-6 window must only hold previously-unproven queries; "
        f"already green: {sorted(green & set(ROUND6_ROTATION))}"
    )
    # round 5 came back 50/50 green, so the committed two-window drain
    # plan held: the r6 window is EXACTLY the remaining backlog — every
    # registered query is either driver-green already or in this window.
    assert not set(ROUND5_ROTATION) & set(ROUND6_ROTATION)
    assert set(ROUND5_ROTATION) <= green
    unproven = [q for q in registered if q not in green]
    assert sorted(unproven) == sorted(ROUND6_ROTATION)

    # the committed round-7 plan: the round-6 spill first, then 49
    # re-confirmations of the OLDEST driver evidence (round-1 greens in
    # their r01 verification order, topped up from round 2) — a full
    # unique 50-slot window with no unproven query left out.
    from mapreduceframework_cpp_spark.queries import ROUND7_ROTATION

    assert len(ROUND7_ROTATION) == 50
    assert len(set(ROUND7_ROTATION)) == 50
    assert ROUND7_ROTATION[0] == "q_geo_grid_clusters"
    g1 = green_set([os.path.join(repo_root, "CORRECTNESS_r01.json")], oracles)
    g12 = green_set(
        [
            os.path.join(repo_root, f"CORRECTNESS_{r}.json")
            for r in ("r01", "r02")
        ],
        oracles,
    )
    rest = ROUND7_ROTATION[1:]
    # every re-confirm slot carries round-1 or round-2 evidence, and all
    # 47 round-1 greens are included (oldest-first policy, no gaps)
    assert set(rest) <= g12
    assert g1 <= set(rest)


def test_readme_counts_match_registry():
    """README's 'N of M registered queries are hash-verified' sentence
    drifted twice (r2, r3); pin it to the registry."""
    import re

    from mapreduceframework_cpp_spark.registry import all_oracles

    text = open("README.md").read()
    m = re.search(r"(\d+) of (\d+) registered\s+queries are hash-verified",
                  text)
    assert m, "README verification-count sentence not found"
    n_sql, total = map(int, m.groups())
    assert n_sql == len(all_oracles())
    assert total == len(_QUERIES)


def test_survey_totals_match_registry():
    """SURVEY.md §2.2's declared totals stay in lockstep with the
    registry — the declared contract is the source of truth."""
    import re

    from mapreduceframework_cpp_spark.registry import all_oracles

    text = open("SURVEY.md").read()
    m = re.search(
        r"\*\*Totals: (\d+) registered queries\*\* \((\d+) SQL-oracle, "
        r"(\d+) rows-only\)",
        text,
    )
    assert m, "SURVEY.md totals line not found"
    total, n_sql, n_rows_only = map(int, m.groups())
    assert total == len(_QUERIES)
    assert n_sql == len(all_oracles())
    assert n_rows_only == len(_QUERIES) - len(all_oracles())
