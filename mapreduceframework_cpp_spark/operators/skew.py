"""Skew-robust join (100 TB design rule, SURVEY.md §4.2).

AQE's skew-join splitting handles moderate skew automatically (enabled in
session.RUNTIME_CONFS). Salting is the explicit recipe for the degenerate
heavy-hitter case — a single key so hot one task would process a large
fraction of the data even after AQE splits:

- fact side: add ``_salt = hash(whole row) mod K`` — deterministic, and
  NOT a function of the join key alone, so a hot key's rows spread over K
  partitions;
- dim side: replicate each row K times, one per salt value;
- join on (key, _salt): same matches as the plain join (each fact row
  meets exactly the one dim replica carrying its salt), K-way parallel on
  the hot key.

Cost: dim side ×K (fine for bounded dims — and hot-key joins are
fact×dim shaped); fact side unchanged. K ≈ cluster-cores / expected
hot-key concurrency; 8-32 is typical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key: result-identical to
    ``fact.join(dim, on, how)`` but immune to heavy-hitter join keys.
    Supports inner/left (the fact-preserving shapes salting is for)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (fact-preserving) joins")
    keys = [on] if isinstance(on, str) else list(on)
    fact_s = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(num_salts)).cast(
            "int"
        ),
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return fact_s.join(dim_s, keys + ["_salt"], how).drop("_salt")
