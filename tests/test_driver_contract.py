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
    registration actually honors it and that the live round-8 window
    spends its slots per the standing policy. Round 7 landed with ZERO
    reds (derived HERE from the frozen CORRECTNESS_r07.json, so the
    claim can't drift from the evidence), so the pre-committed round-8
    window runs unmodified: the four oldest-evidence names the round-7
    red-requeue displaced, then round-2/3 greens oldest-first. The
    green fold is imported from tools/next_rotation.py::green_set
    (ADVICE r4: a local copy of the fold silently diverged from the
    CLI's policy)."""
    import json
    import os
    import sys

    from mapreduceframework_cpp_spark.queries import (
        ROUND7_ROTATION,
        ROUND8_ROTATION,
        ROUND9_ROTATION,
        VERIFY_ROTATION,
    )
    from mapreduceframework_cpp_spark.registry import all_oracles

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.next_rotation import green_set

    registered = list(_QUERIES)
    assert VERIFY_ROTATION is ROUND8_ROTATION  # the live window alias
    assert registered[: len(ROUND8_ROTATION)] == ROUND8_ROTATION
    assert len(ROUND8_ROTATION) == 50
    assert len(set(ROUND8_ROTATION)) == 50
    # windows are disjoint EXCEPT a query may legitimately re-enter
    # when its grading got stricter mid-stream: q_dedup_simhash and
    # q_sim_lsh_topk had rows-only slots in r7 and re-enter r8 as
    # SQL-oracle upgrades needing their first hash rows
    assert set(ROUND8_ROTATION) & set(ROUND7_ROTATION) == {
        "q_dedup_simhash",
        "q_sim_lsh_topk",
    }
    assert ROUND8_ROTATION[:5] == [
        "q_project_expr", "q_filter_pred", "q_case_expr", "q_sort_multi",
        "q_scan_select_cols",  # displaced by the r7 pagerank upgrade slot
    ]

    oracles = set(all_oracles())
    # round 7 landed clean: no SQL-oracle row in the live window ran
    # without error yet hash-failed, so there is nothing to re-queue
    r07 = json.load(open(os.path.join(repo_root, "CORRECTNESS_r07.json")))
    reds = [
        n
        for n in ROUND7_ROTATION
        if n in r07
        and n in oracles
        and not r07[n].get("err")
        and not r07[n].get("hash_match")
    ]
    assert reds == [], f"round-7 reds exist — re-queue them: {reds}"

    # cumulative evidence through round 7: every registered query is
    # driver-green (the drain invariant reached its fixed point in r7 —
    # 280 hash-green + 16 rows-only clean, VERDICT r7) EXCEPT the
    # round-8 rows-only → SQL-oracle upgrades, whose historical
    # rows-only-clean rows no longer satisfy the stricter hash policy
    # (the r7 langid/pagerank precedent) — and those sit inside the
    # live window awaiting their first hash row
    green = green_set(
        [
            os.path.join(repo_root, f"CORRECTNESS_{r}.json")
            for r in ("r01", "r02", "r03", "r04", "r05", "r06", "r07")
        ],
        oracles,
    )
    unproven = [q for q in registered if q not in green]
    upgrades = [
        "q_sketch_countmin",
        "q_text_fingerprint",
        "q_dedup_simhash",
        "q_sim_lsh_topk",
    ]
    assert sorted(unproven) == sorted(upgrades), unproven
    assert set(unproven) <= set(ROUND8_ROTATION)

    # round-8 slots are re-confirmations of the OLDEST evidence rows:
    # every slot carries r1/r2/r3 driver evidence (the upgrades'
    # historical evidence was rows-only-grade, so they are exempt from
    # the hash-green requirement here)
    g123 = green_set(
        [
            os.path.join(repo_root, f"CORRECTNESS_{r}.json")
            for r in ("r01", "r02", "r03")
        ],
        oracles,
    )
    assert set(ROUND8_ROTATION) - set(upgrades) <= g123

    # the committed round-9 plan: a unique 50-slot window, disjoint
    # from rounds 7 and 8, leading with the two round-8 spills (the
    # last round-2 greens), every slot carrying r2/r3 driver evidence
    assert len(ROUND9_ROTATION) == 50
    assert len(set(ROUND9_ROTATION)) == 50
    assert not set(ROUND9_ROTATION) & set(ROUND8_ROTATION)
    assert not set(ROUND9_ROTATION) & set(ROUND7_ROTATION)
    assert ROUND9_ROTATION[:2] == ["q_emb_centroid", "q_emb_norm_stats"]
    g23 = green_set(
        [
            os.path.join(repo_root, f"CORRECTNESS_{r}.json")
            for r in ("r02", "r03")
        ],
        oracles,
    )
    assert set(ROUND9_ROTATION) <= g23
    # and the round-9 window drains the remaining oldest rows: nothing
    # OUTSIDE rounds 8+9 still has pre-r4 latest evidence, except what
    # provably cannot fit (the pool is ordered, so overflow is empty
    # when the two windows cover all ≤r3-latest rows)
    latest: dict[str, int] = {}
    for i, r in enumerate(("r01", "r02", "r03", "r04", "r05", "r06", "r07")):
        rows = json.load(open(os.path.join(repo_root, f"CORRECTNESS_{r}.json")))
        for name in rows:
            latest[name] = i + 1
    stale = {
        q for q, rnd in latest.items() if rnd <= 3 and q in registered
    }
    uncovered = stale - set(ROUND8_ROTATION) - set(ROUND9_ROTATION)
    # two slots of the 100 are spent on q_dedup_simhash and
    # q_sim_lsh_topk (r7-latest, in the window as oracle upgrades, not
    # staleness re-confirms), so exactly two stale names spill to
    # round 10 — the newest of them in r03 order
    assert uncovered == {"q_dedup_bow", "q_text_ngram_topk"}, (
        "oldest-evidence rows left out of the next two windows",
        sorted(uncovered)[:10],
    )


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
