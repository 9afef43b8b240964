"""Cross-engine-deterministic Bloom filter (build + probe as DataFrames).

The scale role: a semi join against a huge build side normally shuffles
the probe side on the key. When the build side's KEY SET fits a few KB
of bitmap, broadcasting the bitmap and pre-filtering the probe scan
removes that shuffle entirely — Spark's own runtime row-group filters
do this opportunistically; this operator makes it an explicit, testable
plan element (the reference kernel has no counterpart: its R6 shuffle
always materializes every key, ``MapReduceFramework.cpp:100-133``).

Determinism contract: hashes derive from ``md5(CAST(key AS STRING))``
(identical hex in Spark and DuckDB) parsed with the same instr-nibble
trick as queries/profiling; positions use Kirsch–Mitzenmacher double
hashing ``(h1 + i·h2) mod m``. Every step is integer-exact, so an
oracle can rebuild the filter bit-for-bit and the whole prune is
hash-verifiable — unlike ``xxhash64``-based sketches, which are
rows-only by necessity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: filter geometry: m = 2^16 bits (2048 32-bit words in BIGINTs, 8 KB)
#: and k = 4 probes — FPR ≈ (1 - e^(-4n/65536))^4, under 1e-4 for
#: n ≤ 2000 build keys. Real deployments size m from an
#: approx_count_distinct of the build side; the constants here keep the
#: oracle a pure literal.
M_BITS = 65536
K_HASHES = 4

def _hex_chunk(start: int, width: int) -> str:
    """SQL expression: nibbles [start, start+width) of hex string ``h``
    as a BIGINT — valid and identical in Spark SQL and DuckDB."""
    # the CAST keeps every term BIGINT: a sub-2^31 power literal types as
    # INT and 15 * 16^7 then overflows int32 under ANSI arithmetic
    return " + ".join(
        f"(instr('0123456789abcdef', substr(h, {i}, 1)) - 1)"
        f" * CAST({16 ** (start + width - 1 - i)} AS BIGINT)"
        for i in range(start, start + width)
    )

#: h1/h2: two independent 48-bit halves of the md5
H1_SQL = _hex_chunk(1, 12)
H2_SQL = _hex_chunk(13, 12)


def _positions(df: DataFrame, key_col: str) -> DataFrame:
    """Attach exploded bit positions: one row per (key row, probe i)."""
    return (
        df.withColumn("h", F.md5(F.col(key_col).cast("string")))
        .withColumn("h1", F.expr(H1_SQL))
        .withColumn("h2", F.expr(H2_SQL))
        .select(
            "*",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(K_HASHES - 1).cast("long"))
            ).alias("i"),
        )
        .withColumn("pos", (F.col("h1") + F.col("i") * F.col("h2")) % M_BITS)
        .drop("h", "h1", "h2", "i")
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Aggregate the build-side key set into bitmap words:
    (word_idx, word) with word = bit_or of 1<<(pos % 32). 32-bit words
    inside BIGINTs keep the shift < 63, which DuckDB would reject as
    signed overflow (and Spark would wrap) at bit 63. At most M_BITS/32
    rows — broadcastable regardless of build-side row count (the
    aggregation is the only pass over the keys)."""
    return (
        _positions(keys.select(key_col).distinct(), key_col)
        .select(
            F.expr("pos div 32").alias("word_idx"),
            # DataFrame-API shiftleft takes a literal count; the SQL
            # form accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(probe_keys: DataFrame, bloom: DataFrame, key_col: str) -> DataFrame:
    """Append ``bloom_pass`` (true ⇔ all K bits set) per distinct probe
    key. The bitmap broadcasts; a key passes iff every one of its K
    positions finds its bit — a left join (missing word ⇒ bit unset)
    plus an all-true aggregate per key. No shuffle of the probe side:
    the join key is word_idx into the broadcast bitmap."""
    pos = _positions(probe_keys.select(key_col).distinct(), key_col).withColumn(
        "word_idx", F.expr("pos div 32")
    )
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
    checked = pos.join(F.broadcast(bloom), "word_idx", "left").withColumn(
        "hit",
        F.when(
            F.col("word").isNotNull() & (F.col("word").bitwiseAND(bit) != 0), 1
        ).otherwise(0),
    )
    return checked.groupBy(key_col).agg(
        (F.sum("hit") == K_HASHES).alias("bloom_pass")
    )
