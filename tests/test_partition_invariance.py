"""Partition-count invariance: custom operators must produce identical
RESULTS for any physical layout of their input (1 partition, the default,
or many) — the property that makes a plan trustworthy when the cluster
re-splits 100 TB differently from the test box. Aggregation/ordering
tricks that accidentally depend on partition-local order (collect_list
without a sort, double sums without decimal discipline, per-partition
RNG) fail here."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduceframework_cpp_spark.operators.dedup import (
    dedup_clusters,
    minhash_lsh_near_dups,
    simhash_fingerprints,
)
from mapreduceframework_cpp_spark.operators.text import (
    fingerprints,
    repetition_signals,
)
from mapreduceframework_cpp_spark.sources.tables import tbl

PARTS = (1, 16)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return tbl(spark, sf_dir, "documents")


def test_minhash_lsh_partition_invariant(docs):
    ref = _rows(minhash_lsh_near_dups(docs, num_hashes=64, bands=32, rows_per_band=2))
    for n in PARTS:
        got = _rows(
            minhash_lsh_near_dups(
                docs.repartition(n), num_hashes=64, bands=32, rows_per_band=2
            )
        )
        assert got == ref, f"{n} partitions changed the near-dup pair set"


def test_simhash_partition_invariant(docs):
    ref = _rows(simhash_fingerprints(docs))
    for n in PARTS:
        assert _rows(simhash_fingerprints(docs.repartition(n))) == ref, n


def test_fingerprint_sketch_partition_invariant(docs):
    ref = _rows(fingerprints(docs).select("doc_id", F.col("fingerprint").cast("string")))
    for n in PARTS:
        got = _rows(
            fingerprints(docs.repartition(n)).select(
                "doc_id", F.col("fingerprint").cast("string")
            )
        )
        assert got == ref, n


def test_repetition_signals_partition_invariant(docs):
    ref = _rows(repetition_signals(docs))
    for n in PARTS:
        assert _rows(repetition_signals(docs.repartition(n))) == ref, n


def test_dedup_clusters_partition_invariant(spark):
    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (9, 11), (30, 31), (31, 40), (100, 101)],
        "doc_id_a long, doc_id_b long",
    )
    ref = _rows(dedup_clusters(pairs))
    for n in PARTS:
        assert _rows(dedup_clusters(pairs.repartition(n))) == ref, n
