"""Count-min sketch as a pure DataFrame composition (SURVEY.md §2.2-K):
approximate frequency counting with sublinear state — the streaming/
merge-friendly answer to "how often does each of billions of keys
occur" when an exact group-by's state would not fit.

The sketch is a d×w counter matrix: row i counts keys by a 32-bit hash
word ``pmod w``. Estimates take the MIN over the d rows — always an
overestimate of the true count (collisions only add), within eps·N
(eps = e/w) with probability 1 - delta (delta = e^-d) [Cormode &
Muthukrishnan 2005].

Hash family (r8, portable by design): row i's hash is the i-th 32-bit
word of an md5 digest of the key — ``conv(substr(md5(k), 1+8i, 8), 16,
10)`` — i.e. ONE digest per occurrence yields four row hashes (the
standard split-one-digest construction, cf. Kirsch & Mitzenmacher's
double hashing for Bloom filters). Rows beyond 4 chain salted digests
``md5(k || ':' || block)``. This replaced seeded xxhash64 so the sketch
is reproducible OUTSIDE Spark: any engine with md5 + base conversion
(DuckDB, Trino, Postgres) derives bit-identical counters, which is what
lets q_sketch_countmin carry a full SQL value oracle instead of a
rows-only check. Cost at scale: one md5 per occurrence (~a few hundred
ns on short tokens) amortized over all d rows, versus d seeded
xxhash64 calls before — a wash for d=4, and the counters themselves
still bound shuffle and state at d·w rows.

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
from pyspark.sql import Column, DataFrame


def _digests(key: Column, depth: int) -> Column:
    """Array of the ceil(depth/4) hex digests the row hashes are cut
    from: ``md5(k)`` then salted ``md5(k || ':' || block)``. For the
    common depth ≤ 4 this is a single-element array — one md5 per
    input row total."""
    blocks = (depth + 3) // 4
    return F.array(
        F.md5(key),
        *[F.md5(F.concat(key, F.lit(f":{b}"))) for b in range(1, blocks)],
    )


#: row hash from the exploded (``_digs``, ``row``) frame: the row-th
#: 32-bit word of the row's block digest, as a non-negative BIGINT.
_WORD = (
    "CAST(conv(substring(element_at(_digs, 1 + CAST(row / 4 AS INT)), "
    "1 + 8 * pmod(row, 4), 8), 16, 10) AS BIGINT)"
)


def count_min_counters(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the d×w counter table (row, bucket, cnt) for values of
    ``col``. At most depth·width rows come back no matter how large
    ``df`` is; the group-by partial-aggregates map-side, so the shuffle
    carries counters, not occurrences."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(_digests(F.col(col), depth).alias("_digs"))
        .select("_digs", rows)
        .select("row", F.pmod(F.expr(_WORD), F.lit(width)).alias("bucket"))
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
            _digests(F.col("key"), depth).alias("_digs"),
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        )
        .select(
            "key",
            "row",
            F.pmod(F.expr(_WORD), F.lit(width)).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
