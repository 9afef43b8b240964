"""Job progress — JobState parity (R12, ``MapReduceFramework.h:8-13``).

The reference exposes ``getJobState(handle) -> {stage, percentage}``
updated under a mutex and polled by the client
(``Sample Client/SampleClient.cpp:85-94``). Spark's analog is the
``StatusTracker``: driver-side, lock-free, poll-based — same shape, so the
wrapper below maps Spark job/stage progress onto the reference's enum.

Stage mapping: Spark splits a shuffle query into stages at every exchange
(SURVEY.md §3.1). Earlier stages of a job ≙ MAP (they end by *writing*
shuffle files ≙ the reference's sort+publish), the shuffle fetch ≙
SHUFFLE, the final stage ≙ REDUCE. Percentage = completed/total tasks of
the current stage, exactly like emitted/num_pairs in ``emit3``
(``MapReduceFramework.cpp:186-188``).
"""

from __future__ import annotations

import enum
import threading
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession


class Stage(enum.Enum):
    """≙ stage_t (``MapReduceFramework.h:8``)."""

    UNDEFINED = 0
    MAP = 1
    SHUFFLE = 2
    REDUCE = 3


@dataclass
class JobState:
    """≙ JobState (``MapReduceFramework.h:10-13``)."""

    stage: Stage
    percentage: float


class JobStateTracker:
    """Poll-based job progress over ``spark.sparkContext.statusTracker()``.

    Usage::

        tracker = JobStateTracker(spark)
        with tracker:                       # samples while the body runs
            df.collect()                    # ≙ waitForJob
        tracker.state()                     # final state: REDUCE / 100%
        tracker.history                     # sampled JobStates (monotone)
    """

    def __init__(self, spark: SparkSession, poll_interval_s: float = 0.05):
        self._spark = spark
        self._interval = poll_interval_s
        self._lock = threading.Lock()
        self._state = JobState(Stage.UNDEFINED, 0.0)
        self.history: list[JobState] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- polling ---------------------------------------------------------

    def _sample(self) -> JobState | None:
        st = self._spark.sparkContext.statusTracker()
        job_ids = st.getActiveJobsIds()
        if not job_ids:
            return None
        job = st.getJobInfo(min(job_ids))
        if job is None:
            return None
        stage_ids = sorted(job.stageIds)
        total_stages = len(stage_ids)
        for pos, sid in enumerate(stage_ids):
            info = st.getStageInfo(sid)
            if info is None or info.numTasks == 0:
                continue
            if info.numCompletedTasks < info.numTasks:
                pct = 100.0 * info.numCompletedTasks / info.numTasks
                if total_stages == 1 or pos == total_stages - 1:
                    stage = Stage.REDUCE if total_stages > 1 else Stage.MAP
                elif pos == 0:
                    stage = Stage.MAP
                else:
                    stage = Stage.SHUFFLE
                return JobState(stage, pct)
        return None

    def _run(self) -> None:
        while not self._stop.is_set():
            s = self._sample()
            if s is not None:
                with self._lock:
                    self._state = s
                    self.history.append(s)
            time.sleep(self._interval)

    # -- lifecycle (≙ startMapReduceJob / waitForJob / closeJobHandle) ----

    def __enter__(self) -> JobStateTracker:
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)
        with self._lock:
            self._state = JobState(Stage.REDUCE, 100.0)
            self.history.append(self._state)

    def state(self) -> JobState:
        """≙ getJobState (``MapReduceFramework.h:23``)."""
        with self._lock:
            return self._state
