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
from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

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
    # Second standing contract (round-6 reds): no DECIMAL output
    # columns. The verifier hashes through pandas, where a Spark
    # DECIMAL collects as object-of-Decimal but the DuckDB oracle's
    # DECIMAL lands as float64 — a guaranteed hash-fail on equal
    # values. DECIMAL is fine (and encouraged) INSIDE a query for
    # exact money math; the final projection must emit BIGINT cents
    # or a DOUBLE. Watch /1000000.0-style literals: Spark parses them
    # as DECIMAL(8,1), silently infecting the division (use /1e6).
    dec_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)
    ]
    assert not dec_cols, (
        f"{name}: DECIMAL output columns {dec_cols} always hash-fail under "
        "the driver's pandas lens — emit BIGINT cents or CAST(... AS DOUBLE)"
    )


def test_registration_follows_verify_rotation():
    """The verifier checks the first ~50 registered queries per round;
    queries/__init__.py declares the rotation explicitly. Guard that
    registration actually honors it and that the live round-7 window
    spends its slots per the standing policy: round-6 reds re-queued at
    the head (derived HERE from the frozen CORRECTNESS_r06.json, so the
    pinned list can't drift from the evidence), then the round-6 spill
    (the one query with no driver row ever), then oldest-evidence
    re-confirmations. The green fold is imported from
    tools/next_rotation.py::green_set (ADVICE r4: a local copy of the
    fold silently diverged from the CLI's policy)."""
    import json
    import os
    import sys

    from mapreduceframework_cpp_spark.queries import (
        ROUND6_ROTATION,
        ROUND7_ROTATION,
        VERIFY_ROTATION,
    )
    from mapreduceframework_cpp_spark.registry import all_oracles

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.next_rotation import green_set

    registered = list(_QUERIES)
    assert VERIFY_ROTATION is ROUND7_ROTATION  # the live window alias
    assert registered[: len(ROUND7_ROTATION)] == ROUND7_ROTATION
    assert len(ROUND7_ROTATION) == 50
    assert len(set(ROUND7_ROTATION)) == 50

    oracles = set(all_oracles())
    # the round-6 reds, derived from the frozen artifact: SQL-oracle
    # rows that ran clean but hash-failed (the DECIMAL-output class)
    r06 = json.load(open(os.path.join(repo_root, "CORRECTNESS_r06.json")))
    reds = [
        n
        for n in ROUND6_ROTATION
        if n in r06
        and n in oracles
        and not r06[n].get("err")
        and not r06[n].get("hash_match")
    ]
    assert reds, "artifact drift: no round-6 reds found"
    assert ROUND7_ROTATION[: len(reds)] == reds
    # next slot: the round-6 spill — the only registered query with no
    # driver row in ANY round's artifact (artifacts loaded once, not
    # re-parsed per query — code-review r7)
    assert ROUND7_ROTATION[len(reds)] == "q_geo_grid_clusters"
    ever_rowed: set[str] = set()
    for r in ("r01", "r02", "r03", "r04", "r05", "r06"):
        with open(os.path.join(repo_root, f"CORRECTNESS_{r}.json")) as f:
            ever_rowed.update(json.load(f))
    never_rowed = [q for q in registered if q not in ever_rowed]
    assert never_rowed == ["q_geo_grid_clusters"]

    # cumulative evidence: every registered query is driver-green
    # except exactly the reds + the spill + the round-7 rows-only →
    # SQL-oracle upgrade (q_text_langid gained an oracle in r7, so its
    # historical rows-only-clean rows no longer satisfy the stricter
    # hash policy — by design, it awaits its first hash row), and ALL
    # of those sit inside the live window (the drain invariant,
    # round-7 form)
    green = green_set(
        [
            os.path.join(repo_root, f"CORRECTNESS_{r}.json")
            for r in ("r01", "r02", "r03", "r04", "r05", "r06")
        ],
        oracles,
    )
    unproven = [q for q in registered if q not in green]
    upgrades = ["q_text_langid", "q_graph_pagerank"]
    assert sorted(unproven) == sorted(
        reds + ["q_geo_grid_clusters"] + upgrades
    )
    assert set(unproven) <= set(ROUND7_ROTATION)

    # re-confirm slots: all carry round-1 evidence (oldest-first
    # policy; the four r1/r2 names displaced by the red-requeue move
    # to round 8). The upgrade slot's r1 evidence was rows-only-grade,
    # so it is exempted from the hash-green requirement here.
    g1 = green_set([os.path.join(repo_root, "CORRECTNESS_r01.json")], oracles)
    rest = ROUND7_ROTATION[len(reds) + 1 :]
    assert set(rest) - set(upgrades) <= g1

    # the committed round-8 plan: a unique 50-slot window, disjoint
    # from round 7, leading with the four displaced oldest-evidence
    # names, every slot carrying r1/r2/r3 driver evidence
    from mapreduceframework_cpp_spark.queries import ROUND8_ROTATION

    assert len(ROUND8_ROTATION) == 50
    assert len(set(ROUND8_ROTATION)) == 50
    assert not set(ROUND8_ROTATION) & set(ROUND7_ROTATION)
    assert ROUND8_ROTATION[:4] == [
        "q_project_expr", "q_filter_pred", "q_case_expr", "q_sort_multi"
    ]
    g123 = green_set(
        [
            os.path.join(repo_root, f"CORRECTNESS_{r}.json")
            for r in ("r01", "r02", "r03")
        ],
        oracles,
    )
    assert set(ROUND8_ROTATION) <= g123


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
