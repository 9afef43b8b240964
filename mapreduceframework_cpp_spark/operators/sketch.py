"""Count-min sketch as a pure DataFrame composition (SURVEY.md §2.2-K):
approximate frequency counting with sublinear state — the streaming/
merge-friendly answer to "how often does each of billions of keys
occur" when an exact group-by's state would not fit.

The sketch is a d×w counter matrix: row i counts keys by
``xxhash64(key, i) pmod w``. Estimates take the MIN over the d rows —
always an overestimate of the true count (collisions only add), within
eps·N (eps = e/w) with probability 1 - delta (delta = e^-d) [Cormode &
Muthukrishnan 2005].

Everything is shuffle-lean DataFrame algebra:
- building = one explode(d) + one group-by over (row, bucket): at most
  d·w result rows regardless of corpus size, partial-aggregated
  map-side — the sketch IS mergeable because integer counter matrices
  add (same reason the reference's R16 combiner works).
- estimation = a broadcast join of the queried keys against the d·w
  counter table + a min-agg per key. No full-data rescan.

Kernel lowering: R3 multi-emit (d rows per input) + R6/R8 count — the
reference could compute the same counters; what it lacks is the algebra
to then JOIN them against queries (SURVEY.md §2.1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def count_min_counters(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the d×w counter table (row, bucket, cnt) for values of
    ``col``. At most depth·width rows come back no matter how large
    ``df`` is; the group-by partial-aggregates map-side, so the shuffle
    carries counters, not occurrences."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(F.col(col).alias("_k"))
        .select("_k", rows)
        .select("row", F.pmod(F.xxhash64("_k", "row"), F.lit(width)).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    counters: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Estimated frequency for each distinct key in ``keys``: min over
    the d counter rows the key hashes into. The counter table (≤ d·w
    rows) is broadcast — estimation never shuffles the key set."""
    probes = (
        keys.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            "key",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        )
        .select(
            "key",
            "row",
            F.pmod(F.xxhash64("key", "row"), F.lit(width)).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
