"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Fan a narrow scan out to the session's full parallelism before a
    CPU-heavy per-row stage (hashing, shingling, Python UDF batches).

    File-size-based input splitting provisions partitions by bytes; for
    compute-bound stages the cost is per-row, so a small file arriving as
    one task serializes the whole stage — locally AND on a cluster
    whenever byte-based splitting under-provisions (the test parquet is
    the extreme case: single-row-group files, so at most ONE real reader
    per file no matter how byte ranges split). One extra shuffle of the
    narrow input buys full-width execution of everything downstream.
    Hash-partitioning by ``key`` keeps later group-bys on the same key
    co-located.

    GUARDED for scale (r5): when the input already has >= the session's
    default parallelism — the normal case for a big scan on a real
    cluster — this is a NO-OP, because repartitioning down to
    defaultParallelism would otherwise COALESCE a wide scan through a
    full shuffle of every byte. The width check is plan-time only
    (no job runs)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism, key)


#: frames persisted mid-composition by operators (plan diamonds). The
#: operator itself runs no action, so it cannot unpersist; a long-lived
#: session that never releases would accumulate cached shingle /
#: fingerprint blocks in executor storage memory.
_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``persist()`` plus session-level bookkeeping so callers with a
    natural batch boundary (bench loop, streaming foreachBatch, test
    teardown) can release every operator-held cache in one call."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
        n += 1
    return n
