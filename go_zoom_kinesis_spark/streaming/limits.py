"""Per-record processing timeout (T3) and shard-concurrency limiting
(P2) — the two resource guards of the reference's processor loop.

Reference semantics:

- ``processing_timeout`` (src/processor.rs:1520-1522, test
  src/tests/test_suite.rs:257-292): each record's user future races a
  timer; a hung record yields ``ProcessingTimeout``. The reference
  fails the whole run; this engine quarantines the record with reason
  ``processing_timeout`` and completes the batch — consistent with its
  bounded-retry/quarantine variant of the reference's retry-forever
  (SURVEY §7 documents the delta).

- ``max_concurrent_shards`` (src/processor.rs:679-695, test
  src/tests/test_suite2.rs:215-273): a semaphore bounds how many shard
  processors run at once. The Spark-first analog is partition count:
  hashing the batch into N shard-keyed partitions means at most N
  tasks — hence at most N shards — process concurrently, enforced by
  the scheduler itself rather than a driver-side lock. At 100 TB this
  is the correct knob: it also bounds per-executor memory and sink
  connection fan-out, and it is a no-op shuffle of exactly one
  micro-batch, not the full stream.

The timeout guard is deliberately Python-side (``mapInPandas``): a
per-record wall-clock race is only meaningful when the per-record work
is opaque user code, which in this engine is exactly the Pandas-UDF
path. JVM expression pipelines cannot hang per-record and need no
guard. The guard spawns a worker thread ONLY after a timeout strands
the previous one, so the steady-state cost is one queue hop per
record, not one thread per record.
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

# A record-level processor: dict of column values -> outcome string
# ('success' | 'soft' | 'hard'), mirroring ProcessRecord's Ok/Soft/Hard.
RecordFn = Callable[[dict], str]


class _GuardedWorker:
    """One sequential worker thread; abandoned (daemonized, replaced)
    when a record overruns its deadline — the thread may stay stuck in
    the user function, but its queues are orphaned with it so a late
    result can never leak into a newer record's slot."""

    def __init__(self, fn: RecordFn):
        self._fn = fn
        self._in: queue.Queue = queue.Queue(1)
        self._out: queue.Queue = queue.Queue(1)
        self.dead = False
        t = threading.Thread(target=self._loop, daemon=True)
        t.start()

    def _loop(self):
        while True:
            rec = self._in.get()
            try:
                res = self._fn(rec)
            except Exception:
                res = "hard"
            self._out.put(res)

    def run(self, rec: dict, timeout_s: float | None) -> str:
        self._in.put(rec)
        try:
            return self._out.get(timeout=timeout_s)
        except queue.Empty:
            self.dead = True
            return "timeout"


def record_timeout_transform(fn: RecordFn, timeout_s: float | None):
    """Wrap a per-record processor into a :class:`StreamProcessor`
    UserTransform that enforces ``timeout_s`` per record.

    Output = input columns + ``outcome`` (``timeout`` for overruns,
    which the processor quarantines with reason ``processing_timeout``).
    """

    def transform(df: DataFrame) -> DataFrame:
        out_schema = StructType(
            list(df.schema.fields) + [StructField("outcome", StringType())]
        )

        def mapper(batches):
            worker = None
            for pdf in batches:
                outcomes = []
                for rec in pdf.to_dict("records"):
                    if worker is None or worker.dead:
                        worker = _GuardedWorker(fn)
                    outcomes.append(worker.run(rec, timeout_s))
                pdf = pdf.copy()
                pdf["outcome"] = outcomes
                yield pdf

        return df.mapInPandas(mapper, schema=out_schema)

    return transform


def limit_shard_concurrency(
    df: DataFrame, shard_col: str, max_concurrent: int
) -> DataFrame:
    """Bound concurrent shard processing to ``max_concurrent`` by
    shard-hash-partitioning the micro-batch into that many partitions:
    the scheduler can then run at most that many shard groups at once
    (the Semaphore analog, src/processor.rs:679-695). Shards colliding
    in one partition process sequentially — the same admissible
    schedule the reference's semaphore produces."""
    from pyspark.sql import functions as F

    return df.repartition(max_concurrent, F.col(shard_col))
