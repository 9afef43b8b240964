"""Custom Python data SINK (Spark 4 DataSource writer API) — the
engine-side counterpart of the reference's output collection: reduce
workers emit3 into ONE shared ``OutputVec`` serialized by a mutex
(`MapReduceFramework.cpp:176-189`, the ``emit3`` critical section;
`MapReduceFramework.h:15-24` takes the client's output vector by
reference). That design is the write-path twin of its all-in-RAM input
model: a single driver-memory vector guarded by a lock cannot absorb a
100 TB result. Here every write TASK streams its partition to its own
staging file and the DRIVER performs one atomic metadata-only commit —
the task-temp + manifest protocol real table formats (Iceberg, Delta,
Spark's own FileOutputCommitter v2 successors) use, so data volume
scales with executors while the commit stays O(#tasks) metadata.

``txn_files`` semantics:

* each task writes ``_staging/stage-<uuid>.jsonl`` (empty partitions
  write nothing) and returns a :class:`FileCommit` message;
* batch ``commit()`` publishes staged files as ``part-*.jsonl`` and
  atomically (tmp + ``os.replace``) records them in a
  ``_txn/manifest-*.json``; ``abort()`` deletes the staged files, so a
  failed job leaves NOTHING visible;
* ``overwrite=True`` unpublishes all previous manifests inside the
  same commit before publishing the new file set;
* the streaming ``commit(messages, batchId)`` is IDEMPOTENT: a
  replayed micro-batch (restart between sink-commit and checkpoint
  advance — the classic at-least-once window) finds
  ``_txn/manifest-<batchId>.json`` already present, discards its own
  staged duplicates, and leaves the first commit untouched →
  exactly-once at file granularity;
* readers (:func:`read_committed`) list the manifests, never the
  directory, so staged/aborted/orphaned files are invisible by
  construction.

Cluster notes (local mode shares one filesystem; on a real cluster):
``path`` must be shared storage reachable from executors and driver.
On object stores without atomic rename, the manifest is already the
sole source of truth — publish would skip the rename and record the
staged keys directly; only the single tiny manifest write needs
put-if-absent. The rename here is an optimization, not a correctness
dependency.
"""

from __future__ import annotations

import atexit
import glob
import json
import os
import shutil
import sys
import tempfile
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark import cloudpickle as _cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

_STAGING = "_staging"
_TXN = "_txn"


@dataclass
class FileCommit(WriterCommitMessage):
    """Per-task commit message: the staged file (None for an empty
    partition) and its row count."""

    staged: str | None
    rows: int


def _stage_rows(path: str, iterator: Iterator) -> FileCommit:
    """Task-side: stream the partition into one staged JSONL file.
    Returns a message naming the file — publishing is the driver's
    job. ``default=str`` covers datetime/decimal; queries keep to
    long/double/string so the round trip is exact."""
    os.makedirs(os.path.join(path, _STAGING), exist_ok=True)
    staged = None
    rows = 0
    out = None
    try:
        for row in iterator:
            if out is None:
                staged = os.path.join(_STAGING, f"stage-{uuid.uuid4().hex}.jsonl")
                out = open(os.path.join(path, staged), "w")
            out.write(json.dumps(row.asDict(), default=str, sort_keys=True))
            out.write("\n")
            rows += 1
    finally:
        if out is not None:
            out.flush()
            os.fsync(out.fileno())
            out.close()
    return FileCommit(staged=staged, rows=rows)


def _publish(path: str, messages, manifest_name: str, clear: bool = False) -> None:
    """Driver-side atomic publish: rename staged files to ``part-*``,
    then write the manifest via tmp + ``os.replace``. ``clear`` first
    unpublishes every earlier manifest (overwrite semantics). Crash
    BEFORE the replace leaves renamed-but-unmanifested parts — garbage
    to readers (they only trust manifests), reclaimable by any later
    overwrite; crash AFTER is a completed commit."""
    txn = os.path.join(path, _TXN)
    os.makedirs(txn, exist_ok=True)
    if clear:
        for m in glob.glob(os.path.join(txn, "manifest-*.json")):
            for f in json.load(open(m))["files"]:
                old = os.path.join(path, f)
                if os.path.exists(old):
                    os.remove(old)
            os.remove(m)
    files, total = [], 0
    for msg in messages:
        if msg is None or msg.staged is None:
            continue
        final = os.path.basename(msg.staged).replace("stage-", "part-", 1)
        os.replace(os.path.join(path, msg.staged), os.path.join(path, final))
        files.append(final)
        total += msg.rows
    tmp = os.path.join(txn, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump({"files": files, "rows": total}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(txn, manifest_name))


def _discard(path: str, messages) -> None:
    """Remove staged files (abort, or a duplicate replayed batch)."""
    for msg in messages:
        if msg is not None and msg.staged is not None:
            staged = os.path.join(path, msg.staged)
            if os.path.exists(staged):
                os.remove(staged)


class TxnFilesDataSource(DataSource):
    """``df.write.format("txn_files").mode("append").save(path)`` /
    ``df.writeStream.format("txn_files").start(path)`` — transactional
    JSONL file sink with manifest-based atomic commit."""

    @classmethod
    def name(cls) -> str:
        return "txn_files"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("txn_files requires a path")
        return path

    def writer(self, schema, overwrite: bool) -> "TxnFilesWriter":  # noqa: ANN001
        return TxnFilesWriter(self._path(), overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "TxnFilesStreamWriter":  # noqa: ANN001
        return TxnFilesStreamWriter(self._path())


class TxnFilesWriter(DataSourceWriter):
    """Batch writer: one manifest per successful save() job."""

    def __init__(self, path: str, overwrite: bool) -> None:
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> FileCommit:
        return _stage_rows(self.path, iterator)

    def commit(self, messages) -> None:
        _publish(
            self.path,
            messages,
            f"manifest-job-{uuid.uuid4().hex}.json",
            clear=self.overwrite,
        )

    def abort(self, messages) -> None:
        _discard(self.path, messages)


class TxnFilesStreamWriter(DataSourceStreamWriter):
    """Streaming writer: one manifest per micro-batch, keyed by
    batchId so replays are detected and discarded (exactly-once)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator: Iterator) -> FileCommit:
        return _stage_rows(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        manifest = os.path.join(self.path, _TXN, f"manifest-{batchId:020d}.json")
        if os.path.exists(manifest):
            _discard(self.path, messages)  # replayed batch: keep the first commit
            return
        _publish(self.path, messages, os.path.basename(manifest))

    def abort(self, messages, batchId: int) -> None:
        _discard(self.path, messages)


def committed_files(path: str) -> list[str]:
    """Absolute paths of every committed part file, manifest order."""
    out: list[str] = []
    for m in sorted(glob.glob(os.path.join(path, _TXN, "manifest-*.json"))):
        out.extend(os.path.join(path, f) for f in json.load(open(m))["files"])
    return out


def read_committed(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read back ONLY manifest-listed files (staged/aborted files are
    invisible). Manifest listing is a driver-side metadata read — the
    same shape as a table format reading its log, O(#manifests), not a
    data scan."""
    files = committed_files(path)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


_TMP_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A tempdir cleaned at interpreter exit — sink targets and stream
    checkpoints for the registered queries (bench re-runs must not
    accrete /tmp garbage)."""
    d = tempfile.mkdtemp(prefix=prefix)
    _TMP_DIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for d in _TMP_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def register(spark) -> None:  # noqa: ANN001
    """Idempotent registration of the custom sink."""
    spark.dataSource.register(TxnFilesDataSource)


# Shipped by value for the same reason as pydatasource: the sink class
# is cloudpickled onto Python workers, which must not need this package
# on their own PYTHONPATH.
_cloudpickle.register_pickle_by_value(sys.modules[__name__])
