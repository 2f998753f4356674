"""Checkpoint-style SINK via the Spark 4 Python DataSource writer API —
the write-side twin of ``gzk_datasource.py``'s reader: the reference's
at-least-once checkpoint commit (src/store/mod.rs trait +
src/processor.rs:1542-1560 batch fold → save) re-expressed as a
two-phase Spark writer.

Protocol (the shape every transactional Spark sink uses):

1. ``write(iterator)`` runs ON EXECUTORS: each task serializes its
   partition to a uniquely-named ``*.part.jsonl`` under ``<path>/tmp/``
   and returns a commit message (file, row count, max sequence seen).
   A failed/retried task leaves only an orphaned temp file — never
   visible data.
2. ``commit(messages)`` runs ON THE DRIVER exactly once per successful
   job: temp files move into ``<path>/`` atomically (same-filesystem
   rename) and a manifest line records the batch — files not in the
   manifest are not data. ``abort()`` deletes the temps.
3. The STREAMING variant keys the manifest by ``batchId`` —
   re-committing an already-manifested batch is a NO-OP, which is what
   makes micro-batch replay after a checkpoint rollback idempotent
   (same guarantee as ``streaming/sinks.py``'s foreachBatch overwrite,
   now at the DataSource layer).

Scale: executors never coordinate (one temp file per task, no
renames until the driver commit); the manifest is O(batches), not
O(rows); max-sequence per shard aggregates from commit messages
driver-side exactly like the reference's per-shard checkpoint fold.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_manifest.jsonl"


class GzkCommitMessage(WriterCommitMessage):
    def __init__(self, fname: str, n_rows: int, max_seq: int | None):
        self.fname = fname
        self.n_rows = n_rows
        self.max_seq = max_seq


def _write_partition(path: str, iterator) -> GzkCommitMessage:
    tmp_dir = os.path.join(path, "tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    fname = f"{uuid.uuid4().hex}.part.jsonl"
    n, max_seq = 0, None
    with open(os.path.join(tmp_dir, fname), "w") as f:
        for row in iterator:
            d = row.asDict(recursive=True)
            for k, v in list(d.items()):
                if hasattr(v, "isoformat"):
                    d[k] = v.isoformat()
            if "sequence_number" in d and d["sequence_number"] is not None:
                s = int(d["sequence_number"])
                max_seq = s if max_seq is None else max(max_seq, s)
            f.write(json.dumps(d, sort_keys=True) + "\n")
            n += 1
    return GzkCommitMessage(fname, n, max_seq)


def _manifest_entries(path: str) -> list[dict]:
    """Parse manifest lines, TOLERATING a torn trailing line: a driver
    crash mid-append may leave a partial JSON line, and the recovery
    path (replay → read manifest → re-commit) must not be the one that
    breaks on it. A malformed line is skipped — its batch was never
    durably committed, which is exactly the at-least-once contract
    (the batch replays and re-appends)."""
    mf = os.path.join(path, MANIFEST)
    if not os.path.exists(mf):
        return []
    out: list[dict] = []
    with open(mf) as f:
        for line in f:
            if not line.strip():
                continue
            try:
                out.append(json.loads(line))
            except ValueError:
                continue  # torn line from a mid-append crash
    return out


def _manifest_batches(path: str) -> set:
    return {e["batch_id"] for e in _manifest_entries(path)}


def _append_manifest(path: str, entry: dict) -> None:
    """Crash-atomic append: rewrite via temp file + os.replace so a
    crash leaves either the old manifest or the new one, never a torn
    line. O(batches) bytes per commit — the manifest is batch-grain,
    not row-grain, so this stays driver-trivial at any data scale."""
    mf = os.path.join(path, MANIFEST)
    lines = [json.dumps(e, sort_keys=True) for e in _manifest_entries(path)]
    lines.append(json.dumps(entry, sort_keys=True))
    tmp = mf + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, mf)


def _commit_files(path: str, messages, batch_id, overwrite: bool = False) -> None:
    """Driver-side: publish temp files + append ONE manifest line.
    Idempotent per batch_id — a replayed commit is a no-op. With
    ``overwrite`` (batch writer ``mode('overwrite')``) the existing
    manifest and data files are cleared first, so the committed state
    is exactly this job's output."""
    if batch_id is not None and batch_id in _manifest_batches(path):
        for m in messages:  # replay: drop the re-written temps
            if m is not None:
                tmp = os.path.join(path, "tmp", m.fname)
                if os.path.exists(tmp):
                    os.remove(tmp)
        return
    if overwrite:
        # truncate-then-publish: drop the manifest first (readers see
        # "no committed data", never a mix of old manifest + missing
        # files), then the now-unreferenced data files
        mf = os.path.join(path, MANIFEST)
        if os.path.exists(mf):
            os.remove(mf)
        for fname in os.listdir(path):
            if fname.endswith(".part.jsonl"):
                os.remove(os.path.join(path, fname))
    files, total, max_seq = [], 0, None
    for m in messages:
        if m is None:
            continue
        os.replace(
            os.path.join(path, "tmp", m.fname), os.path.join(path, m.fname)
        )
        files.append(m.fname)
        total += m.n_rows
        if m.max_seq is not None:
            max_seq = m.max_seq if max_seq is None else max(max_seq, m.max_seq)
    _append_manifest(
        path,
        {
            "batch_id": batch_id,
            "files": sorted(files),
            "n_rows": total,
            "checkpoint_seq": max_seq,
        },
    )


def _abort_files(path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        tmp = os.path.join(path, "tmp", m.fname)
        if os.path.exists(tmp):
            os.remove(tmp)


class GzkBatchWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool = False):
        self._path = options["path"]
        self._overwrite = overwrite

    def write(self, iterator) -> GzkCommitMessage:
        return _write_partition(self._path, iterator)

    def commit(self, messages) -> None:
        _commit_files(self._path, messages, None, overwrite=self._overwrite)

    def abort(self, messages) -> None:
        _abort_files(self._path, messages)


class GzkStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self._path = options["path"]

    def write(self, iterator) -> GzkCommitMessage:
        return _write_partition(self._path, iterator)

    def commit(self, messages, batchId: int) -> None:
        _commit_files(self._path, messages, batchId)

    def abort(self, messages, batchId: int) -> None:
        _abort_files(self._path, messages)


class GzkSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gzk_checkpoint_sink"

    def writer(self, schema, overwrite: bool) -> GzkBatchWriter:
        return GzkBatchWriter(self.options, overwrite=overwrite)

    def streamWriter(self, schema, overwrite: bool) -> GzkStreamWriter:
        return GzkStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(GzkSinkDataSource)


def commit_batch(df, path: str, batch_id: int) -> None:
    """``foreachBatch`` adapter for the two-phase sink — the
    composition point between ``StreamProcessor`` (which owns the
    micro-batch loop via foreachBatch) and this sink's commit
    protocol: executors stage one temp file per partition (the same
    ``_write_partition`` the DataSource writer runs), the driver
    publishes them under this ``batch_id`` — so a micro-batch REPLAYED
    after a checkpoint rollback is a no-op, exactly like the
    ``DataSourceStreamWriter`` path.

    The ``mapPartitions`` hop exists because foreachBatch gives the
    sink a DataFrame, not a writer task context; the collected commit
    messages are O(partitions) driver data (file name + counts), the
    rows themselves never leave the executors."""
    os.makedirs(path, exist_ok=True)
    messages = df.rdd.mapPartitions(
        lambda it, p=path: [_write_partition(p, it)]
    ).collect()
    _commit_files(path, messages, batch_id)


def read_committed(path: str) -> list[dict]:
    """Read back ONLY manifested rows (the sink's visibility rule);
    torn trailing manifest lines are skipped, not fatal."""
    out: list[dict] = []
    for entry in _manifest_entries(path):
        for fname in entry["files"]:
            with open(os.path.join(path, fname)) as pf:
                out.extend(json.loads(ln) for ln in pf if ln.strip())
    return out
