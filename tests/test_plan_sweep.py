"""Registry-WIDE plan hygiene: every registered query's optimized plan
is built and screened for the two anti-patterns that silently kill a
100 TB run — an unbounded ``CartesianProduct`` (a theta join that lost
its equi key) and ``BatchEvalPython`` (row-at-a-time Python in the hot
path; the Arrow-vectorized evaluators ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas are the sanctioned Python surface and don't
trigger it).

Unlike tests/test_plans.py (deep shape assertions on chosen queries),
this is the wide net: a NEW query that sneaks in a quadratic join or a
``F.udf`` hot loop fails CI even if nobody wrote it a dedicated plan
test. Plans are built driver-side only (no execution), so the whole
sweep is under a minute.
"""

from __future__ import annotations

import contextlib
import io

from mapreduceframework_cpp_spark.registry import all_queries

#: declared exceptions (currently none — the audit of round 2 found
#: every crossJoin lowers to a broadcast variant; keep this explicit so
#: an addition must be argued here, not silently absorbed)
SANCTIONED_CARTESIAN: frozenset[str] = frozenset()
SANCTIONED_BATCH_EVAL: frozenset[str] = frozenset()


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_no_cartesian_or_rowwise_python_anywhere(spark, oracle_sf_dir):
    cart, batch, errors = [], [], []
    for name, fn in all_queries().items():
        try:
            p = _plan(fn(spark, oracle_sf_dir))
        except Exception as e:  # a query that can't even plan is a bug
            errors.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        if "CartesianProduct" in p and name not in SANCTIONED_CARTESIAN:
            cart.append(name)
        if "BatchEvalPython" in p and name not in SANCTIONED_BATCH_EVAL:
            batch.append(name)
    assert not errors, f"queries failed to plan: {errors}"
    assert not cart, f"unsanctioned CartesianProduct in: {cart}"
    assert not batch, f"row-at-a-time Python eval in: {batch}"
