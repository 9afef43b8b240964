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
    queries/__init__.py declares the rotation explicitly
    (VERIFY_ROTATION: every query still lacking a driver correctness
    row, then the two fixed rows-only array-output queries). Guard that
    registration actually honors it, and that the window holds exactly
    the 50 highest-value entries."""
    from mapreduceframework_cpp_spark.queries import VERIFY_ROTATION

    registered = list(_QUERIES)
    assert registered[: len(VERIFY_ROTATION)] == VERIFY_ROTATION
    assert len(VERIFY_ROTATION) == 50  # exactly the driver's window
    # window entries are unique and the window is full
    assert len(set(VERIFY_ROTATION)) == len(VERIFY_ROTATION)
    # every query that still lacks a hard driver correctness row
    # (see VERDICT round 2) must sit inside the window
    unproven = {
        "q_text_pii_scrub", "q_text_quality_gates", "q_dataset_split",
        "q_source_blocklist", "q_source_python", "q_json_variant",
        "q_udaf_arrow", "q_join_asof_tol", "q_join_asof_fwd",
        "q_join_interval_binned", "q_skew_keys", "q_ts_rollup_multi",
        "q_agg_hll_rollup", "q_agg_approx_quantile", "q_agg_mode",
        "q_sketch_countmin", "q_win_first_last", "q_win_distinct_count",
        "q_text_fingerprint", "q_mm_features", "q_map_funcs",
    }
    assert unproven <= set(VERIFY_ROTATION)


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
