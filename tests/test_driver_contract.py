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
    registration actually honors it and that the live round-9 window
    spends its slots per the standing policy. Round 8 landed with ZERO
    reds (derived HERE from the frozen CORRECTNESS_r08.json, so the
    claim can't drift from the evidence), so the pre-committed round-9
    window runs unmodified: the two round-8 spills (the last round-2
    greens), the four re-confirm slots the r8 oracle upgrades
    displaced, then round-3 greens oldest-first. The green fold is
    imported from tools/next_rotation.py::green_set (ADVICE r4: a
    local copy of the fold silently diverged from the CLI's policy)."""
    import json
    import os
    import sys

    from mapreduceframework_cpp_spark.queries import (
        ROUND8_ROTATION,
        ROUND9_ROTATION,
        ROUND10_ROTATION,
        VERIFY_ROTATION,
    )
    from mapreduceframework_cpp_spark.registry import all_oracles

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.next_rotation import green_set

    registered = list(_QUERIES)
    assert VERIFY_ROTATION is ROUND9_ROTATION  # the live window alias
    assert registered[: len(ROUND9_ROTATION)] == ROUND9_ROTATION
    assert len(ROUND9_ROTATION) == 50
    assert len(set(ROUND9_ROTATION)) == 50
    assert not set(ROUND9_ROTATION) & set(ROUND8_ROTATION)
    # head slots: the r9-registered q_stream_tws_sessions (event-time
    # timers + ListState) and q_stream_tws (transformWithState via the
    # protobuf bridge) plus the q_mm_decode rows-only -> SQL-oracle
    # upgrade each need their FIRST driver (hash) row — the r7
    # pagerank / r8 upgrade precedent; they displaced the planned tail
    # slots (q_dedup_editdist, q_graph_triangles, q_ts_ewma) to round
    # 10. q_mm_features (the third upgrade) already held a slot below.
    assert ROUND9_ROTATION[:5] == [
        "q_stream_tws_sessions", "q_stream_tws", "q_mm_decode",
        "q_emb_centroid", "q_emb_norm_stats",
    ]
    assert "q_mm_features" in ROUND9_ROTATION

    oracles = set(all_oracles())
    # round 8 landed clean: no SQL-oracle row in the live window ran
    # without error yet hash-failed, so there is nothing to re-queue
    r08 = json.load(open(os.path.join(repo_root, "CORRECTNESS_r08.json")))
    reds = [
        n
        for n in ROUND8_ROTATION
        if n in r08
        and n in oracles
        and not r08[n].get("err")
        and not r08[n].get("hash_match")
    ]
    assert reds == [], f"round-8 reds exist — re-queue them: {reds}"

    # cumulative evidence through round 8: EVERY registered query is
    # driver-green — the r8 window carried the last four rows-only →
    # SQL-oracle upgrades to their first hash rows, so the drain
    # invariant's fixed point now covers the whole registry (284
    # hash-green + 12 terminally rows-only clean, VERDICT r8)
    all_rounds = [
        os.path.join(repo_root, f"CORRECTNESS_{r}.json")
        for r in ("r01", "r02", "r03", "r04", "r05", "r06", "r07", "r08")
    ]
    green = green_set(all_rounds, oracles)
    unproven = [q for q in registered if q not in green]
    # the two new registrations plus the two r9 oracle upgrades (whose
    # historical rows-only-clean rows no longer satisfy the stricter
    # hash policy) — all inside the live window awaiting hash rows
    assert sorted(unproven) == [
        "q_mm_decode", "q_mm_features", "q_stream_tws",
        "q_stream_tws_sessions",
    ], unproven

    # round-9 slots are re-confirmations of the OLDEST evidence rows:
    # every slot carries r2/r3 driver evidence (except the new-query
    # head slot, which has none yet by construction)
    g23 = green_set(
        [
            os.path.join(repo_root, f"CORRECTNESS_{r}.json")
            for r in ("r02", "r03")
        ],
        oracles,
    )
    assert set(ROUND9_ROTATION) - set(unproven) <= g23

    # the committed round-10 plan: a unique 50-slot window, disjoint
    # from rounds 8 and 9, leading with the two round-9 spills (the
    # newest r03-latest rows), every slot carrying r3/r4 driver
    # evidence
    assert len(ROUND10_ROTATION) == 50
    assert len(set(ROUND10_ROTATION)) == 50
    assert not set(ROUND10_ROTATION) & set(ROUND9_ROTATION)
    assert not set(ROUND10_ROTATION) & set(ROUND8_ROTATION)
    assert ROUND10_ROTATION[:5] == [
        "q_dedup_bow", "q_text_ngram_topk", "q_dedup_editdist",
        "q_graph_triangles", "q_ts_ewma",
    ]
    g34 = green_set(
        [
            os.path.join(repo_root, f"CORRECTNESS_{r}.json")
            for r in ("r03", "r04")
        ],
        oracles,
    )
    assert set(ROUND10_ROTATION) <= g34

    # and the round-10 window drains the remaining oldest rows: after
    # rounds 9+10 run, nothing still has pre-r4 latest evidence, and
    # the r4-latest overflow is exactly the r04 tail that provably
    # cannot fit (the pool is ordered, so overflow = the names AFTER
    # the window's last slot in r04 order)
    latest: dict[str, int] = {}
    r04_order: dict[str, int] = {}
    for i, r in enumerate(
        ("r01", "r02", "r03", "r04", "r05", "r06", "r07", "r08")
    ):
        rows = json.load(open(os.path.join(repo_root, f"CORRECTNESS_{r}.json")))
        for j, name in enumerate(rows):
            latest[name] = i + 1
            if r == "r04":
                r04_order[name] = j
    covered = set(ROUND9_ROTATION) | set(ROUND10_ROTATION)
    stale3 = {q for q, rnd in latest.items() if rnd <= 3 and q in registered}
    assert stale3 <= covered, sorted(stale3 - covered)[:10]
    stale4 = {q for q, rnd in latest.items() if rnd == 4 and q in registered}
    spilled = stale4 - covered
    max_covered_r04 = max(
        r04_order[q] for q in ROUND10_ROTATION if q in r04_order
    )
    assert all(r04_order[q] > max_covered_r04 for q in spilled), (
        "a covered r04 slot was skipped in favor of a newer one",
        sorted(spilled)[:10],
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
