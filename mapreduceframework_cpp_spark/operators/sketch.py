"""Count-min sketch as a pure DataFrame composition (SURVEY.md §2.2-K):
approximate frequency counting with sublinear state — the streaming/
merge-friendly answer to "how often does each of billions of keys
occur" when an exact group-by's state would not fit.

The sketch is a d×w counter matrix: row i counts keys by a 32-bit hash
word ``pmod w``. Estimates take the MIN over the d rows — always an
overestimate of the true count (collisions only add), within eps·N
(eps = e/w) with probability 1 - delta (delta = e^-d) [Cormode &
Muthukrishnan 2005].

Hash family (r8, portable by design): one base value per key — the
top 60 bits of its md5 digest, ``conv(substr(md5(k), 1, 15), 16, 10)``
— then row i's hash is the Carter–Wegman universal family
``(a_i·x + b_i) mod P`` over ``x = base mod P`` with the Mersenne
prime P = 2^31 − 1 and per-row constants derived arithmetically from
``i`` (so any depth works, no salted-digest chaining). This replaced
seeded xxhash64 so the sketch is reproducible OUTSIDE Spark: any
engine with md5 + base conversion (DuckDB, Trino, Postgres) derives
bit-identical counters, which is what lets q_sketch_countmin carry a
full SQL value oracle instead of a rows-only check. Cost at scale:
ONE md5 + ONE hex parse per occurrence amortized over all d rows plus
d integer multiply-mods (profiled 0.34 s vs 0.13 s for d seeded
xxhash64 calls over 270k occurrences — hex parsing d times instead
was 0.58 s, which is why the words-of-one-digest construction was
rejected); the counters themselves still bound shuffle and state at
d·w rows. Every multiply stays under 2^62 (P² < 2^62), so ANSI-mode
overflow checking never fires.

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


#: Mersenne prime for the Carter–Wegman row hashes; (P-1)² < 2^62 so
#: every intermediate product fits BIGINT with ANSI headroom.
CMS_P = 2_147_483_647
#: multiplier/offset seeds the per-row constants derive from
CMS_A = 1_103_515_245
CMS_B1, CMS_B2 = 12_345, 104_729

#: row hash from an exploded frame carrying ``_base`` (computed ONCE
#: per input row, below the generate) and ``row``:
#: bucket = ((a_row · (base mod P) + b_row) mod P) mod width, with
#: a_row = (A·(row+1)) mod P and b_row = B1 + B2·row. All-BIGINT
#: arithmetic, identical text and semantics in DuckDB (non-negative
#: operands, so pmod ≡ %). The CAST(... AS BIGINT) wrappers keep
#: ANSI int32 literal arithmetic from overflowing (A·4 > 2^31).
_ROW_HASH = (
    f"pmod(pmod(pmod(CAST({CMS_A} AS BIGINT) * (row + 1), {CMS_P})"
    f" * pmod(_base, {CMS_P}) + {CMS_B1} + CAST({CMS_B2} AS BIGINT) * row,"
    f" {CMS_P}), {{width}})"
)

#: the base-value projection: top 60 bits of the key's md5, hex-parsed
#: once per key (hex parsing is the expensive step — see module doc)
_BASE = "CAST(conv(substring(md5({col}), 1, 15), 16, 10) AS BIGINT)"


def count_min_counters(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the d×w counter table (row, bucket, cnt) for values of
    ``col``. At most depth·width rows come back no matter how large
    ``df`` is; the group-by partial-aggregates map-side, so the shuffle
    carries counters, not occurrences."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(F.expr(_BASE.format(col=col)).alias("_base"))
        .select("_base", rows)
        .select("row", F.expr(_ROW_HASH.format(width=width)).alias("bucket"))
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
            F.expr(_BASE.format(col="key")).alias("_base"),
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        )
        .select(
            "key",
            "row",
            F.expr(_ROW_HASH.format(width=width)).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
