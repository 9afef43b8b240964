"""Bloom filter guarantees (operators/bloom): membership is never lost
(no false negatives — the property that makes it safe as a pre-join
prune), the false-positive rate stays within its design envelope, and
results are invariant to the physical input layout."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduceframework_cpp_spark.operators.bloom import (
    K_HASHES,
    M_BITS,
    bloom_build,
    bloom_probe,
)
from mapreduceframework_cpp_spark.sources.tables import tbl


@pytest.fixture(scope="module")
def keys(spark, sf_dir):
    return (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("key"))
    )


@pytest.fixture(scope="module")
def probe(spark, sf_dir):
    return tbl(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("key")
    )


def test_no_false_negatives(keys, probe):
    """Every true member must pass — a false negative would silently
    drop join rows."""
    bloom = bloom_build(keys, "key")
    passed = bloom_probe(probe, bloom, "key")
    missed = (
        passed.join(keys.distinct(), "key")
        .filter(~F.col("bloom_pass"))
        .count()
    )
    assert missed == 0


def test_fpr_within_envelope(keys, probe):
    """Observed FPR ≤ 3x the analytic (1 - e^(-kn/m))^k bound (slack for
    small-sample variance)."""
    import math

    n = keys.distinct().count()
    analytic = (1 - math.exp(-K_HASHES * n / M_BITS)) ** K_HASHES
    bloom = bloom_build(keys, "key")
    passed = bloom_probe(probe, bloom, "key")
    flagged = passed.join(
        keys.distinct().withColumn("_in", F.lit(1)), "key", "left"
    )
    non_members = flagged.filter(F.col("_in").isNull())
    fp = non_members.filter(F.col("bloom_pass")).count()
    total = non_members.count()
    assert total > 0
    assert fp / total <= max(3 * analytic, 2 / total), (
        f"FPR {fp}/{total} vs analytic {analytic:.2e} (n={n})"
    )


def test_bitmap_partition_invariant(keys):
    """The bitmap is a bit_or aggregate — identical for any layout."""
    ref = sorted(map(tuple, bloom_build(keys, "key").collect()))
    for parts in (1, 16):
        got = sorted(
            map(tuple, bloom_build(keys.repartition(parts), "key").collect())
        )
        assert got == ref, parts


def test_bitmap_broadcasts_in_probe(spark, keys, probe):
    """The probe side must join against a BROADCAST bitmap — shuffling
    the probe on word_idx would defeat the whole point."""
    import contextlib
    import io

    bloom = bloom_build(keys, "key")
    df = bloom_probe(probe, bloom, "key")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
