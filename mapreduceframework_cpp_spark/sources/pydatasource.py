"""Custom Python data source (Spark 4 DataSource API) — the engine-side
counterpart of the reference's pluggable input: `startMapReduceJob` takes
any `InputVec` the client assembled (`MapReduceFramework.h:18-24`,
`Sample Client/SampleClient.cpp:74-79`); here a source PRODUCES that
input inside the executors instead of on the driver.

`synthetic_docs` generates a deterministic document corpus directly in
the executors: each of P input partitions yields its own doc_id stride,
so generation is embarrassingly parallel, nothing materializes on the
driver, and the output is a plain DataFrame any engine query consumes.
The row content is a pure function of doc_id (no RNG state), which keeps
the source replayable across retries — the property a real connector
must have for exactly-once semantics — and lets a SQL oracle reconstruct
the exact output for hash verification.

Batch reads implement `reader()`; micro-batch streaming implements
`simpleStreamReader()` over a monotone doc_id offset — the same
replayable-generator contract, exposed to Structured Streaming (offsets
are plain dicts checkpointed by the engine).
"""

from __future__ import annotations

import sys
from collections.abc import Iterator, Sequence

from pyspark import cloudpickle as _cloudpickle
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: deterministic token-id mixers (small odd constants; any fixed choice
#: works — the oracle mirrors them literally)
_MIX = (1, 31, 61)
_LANGS = ("en", "de", "fr", "es", "zh")

SCHEMA = "doc_id bigint, lang string, text string"


def _row(doc_id: int) -> tuple[int, str, str]:
    """One synthetic document — MUST stay trivially SQL-expressible
    (the q_source_python oracle reconstructs it in DuckDB)."""
    lang = _LANGS[doc_id % len(_LANGS)]
    text = " ".join(f"tok{(doc_id * m) % 97}" for m in _MIX)
    return doc_id, lang, text


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_docs").option("rows", N)
    .option("partitions", P).load()` — executor-side deterministic
    corpus generation."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "SyntheticDocsReader":  # noqa: ANN001
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":  # noqa: ANN001
        return SyntheticDocsStreamReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # stride partitioning: partition i owns doc_ids ≡ i (mod parts) —
        # balanced regardless of `rows`, no coordination
        for doc_id in range(partition.value, self.rows, self.parts):
            yield _row(doc_id)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch generator: offset = next doc_id to emit; each batch
    emits up to `batch_rows` documents. Replayable by construction
    (rows are a pure function of doc_id), so restart-from-checkpoint
    re-emits identical rows — the exactly-once contract."""

    def __init__(self, options: dict) -> None:
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        first = int(start["next"])
        end = {"next": first + self.batch_rows}
        return (iter([_row(i) for i in range(first, first + self.batch_rows)]), end)

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_row(i) for i in range(int(start["next"]), int(end["next"]))])


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration of the custom source."""
    spark.dataSource.register(SyntheticDocsDataSource)


# The DataSource class is cloudpickled onto Python workers. Ship it by
# VALUE so the engine works even when this package is not importable on
# the executors' PYTHONPATH (a driver that only sys.path-inserts the repo
# in its own process, a cluster without the wheel shipped) — the same
# self-containment every closure-style UDF in this repo already has.
_cloudpickle.register_pickle_by_value(sys.modules[__name__])
