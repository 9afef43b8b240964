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


def test_first_fifty_registrations_cover_round1_gaps():
    """The verifier checks the first ~50 registered queries per round;
    round 1 left these families unverified. Guard the registration order
    so they stay inside the window until a round verifies them."""
    first50 = list(_QUERIES)[:50]
    must_be_in_window = [
        # relational tail (B/F/G + pivot)
        "q_case_expr", "q_sort_multi", "q_sort_limit",
        "q_union_all", "q_union_distinct", "q_intersect", "q_except",
        "q_pivot", "q_unpivot",
        # scalar functions (H)
        "q_str_funcs", "q_str_regexp", "q_str_split_explode",
        "q_date_funcs", "q_math_funcs", "q_json_funcs",
        "q_array_funcs", "q_map_funcs", "q_str_distance",
        # windows (E)
        "q_win_rank", "q_win_topk_group", "q_win_lag_lead",
        "q_win_running", "q_win_range_frame", "q_win_ntile_pct",
        # streaming (I)
        "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
        "q_ts_gapfill",
        # UDF surface (J)
        "q_udf_scalar", "q_udaf_grouped", "q_udtf_flatmap",
        # round-1 canonicalizer errors, now serialized
        "q_agg_collect", "q_text_fingerprint", "q_mm_features",
    ]
    missing = [q for q in must_be_in_window if q not in first50]
    assert not missing, f"queries outside the verifier window: {missing}"
