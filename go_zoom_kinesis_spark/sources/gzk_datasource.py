"""Kinesis-shaped custom source via the Spark 4 Python DataSource API —
the idiomatic re-expression of the reference's ingestion loop
(/root/reference/src/processor.rs): shard discovery (S1) becomes
``partitions()`` (one InputPartition per shard), stream positioning
(S2) the ``start_sequence`` option / stored stream offsets, the
GetRecords batch limit (S4) the per-microbatch offset advance, and
batch pacing (S5) the latestOffset cadence. No AWS dependency: records
are generated deterministically from (shard, sequence) with the repo's
portable polynomial hash, so a DuckDB oracle can re-derive the exact
stream and the driver can hash-verify a scan of this source.

Scale posture: partitions are per-shard, so Spark schedules one task
per shard exactly like the reference's per-shard tokio tasks; a real
deployment swaps the generator in ``_record`` for a GetRecords call
and keeps every interface unchanged.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

P = 2_147_483_647  # portable polynomial hash modulus (functions/hashes.py)

DEFAULT_SHARDS = 8
DEFAULT_RECORDS_PER_SHARD = 1000
DEFAULT_BATCH_LIMIT = 100  # reference GetRecords default (processor.rs:373)

_BASE_TS = datetime(2026, 1, 1, 0, 0, 0)

SCHEMA = (
    "shard_id string, sequence_number bigint, ts timestamp, payload string, "
    "payload_hash bigint"
)


def _payload(shard: int, seq: int) -> str:
    return f"rec-{shard}-{seq}"


def _char_hash(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * 31 + ord(c)) % P
    return acc


def _record(shard: int, seq: int):
    p = _payload(shard, seq)
    return (
        f"shard-{shard}",
        seq,
        _BASE_TS + timedelta(seconds=seq),
        p,
        _char_hash(p),
    )


@dataclass
class _ShardRange(InputPartition):
    shard: int
    start: int
    end: int  # exclusive


class _Opts:
    def __init__(self, options):
        self.shards = int(options.get("shards", DEFAULT_SHARDS))
        self.records_per_shard = int(
            options.get("records_per_shard", DEFAULT_RECORDS_PER_SHARD)
        )
        self.batch_limit = int(options.get("batch_limit", DEFAULT_BATCH_LIMIT))
        self.start_sequence = int(options.get("start_sequence", 0))
        self.progress_path = options.get("progress_path")


class GzkBatchReader(DataSourceReader):
    def __init__(self, options):
        self.o = _Opts(options)

    def partitions(self):
        # S1: shard discovery — one input partition per shard
        return [
            _ShardRange(s, self.o.start_sequence, self.o.records_per_shard)
            for s in range(self.o.shards)
        ]

    def read(self, partition: _ShardRange):
        for seq in range(partition.start, partition.end):
            yield _record(partition.shard, seq)


class GzkStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offsets are {shard: next_sequence} dicts and
    each ``latestOffset`` advances every shard by at most
    ``batch_limit`` records — the GetRecords cap — until the bounded
    stream (records_per_shard) is drained.

    ``latestOffset`` takes no argument in the Python API (no admission
    control), so a generated stream must remember its own tip across
    restarts: like the reference's checkpoint-preferred resume
    (S3/K4, src/store/), the reader persists a high-water mark to
    ``progress_path`` on every commit and seeds pacing from it on
    construction — otherwise a restart would hand Spark a
    backward offset and replay committed records. Every offset Spark
    shows us (``partitions``/``commit``) also ratchets the mark
    forward as defense."""

    def __init__(self, options):
        self.o = _Opts(options)
        self._cur = self._load_progress() or {
            str(s): self.o.start_sequence for s in range(self.o.shards)
        }
        if not self.o.progress_path:
            import warnings

            warnings.warn(
                "gzk_stream without progress_path: a query restart "
                "resets the pacing cursor to start_sequence; Spark's "
                "committed offsets stay ahead until the cursor "
                "re-ratchets from the first trigger's start offsets",
                stacklevel=2,
            )

    # --- durable high-water mark (reference CheckpointStore analog) ---

    def _load_progress(self):
        import os

        p = self.o.progress_path
        if not p or not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return {str(k): int(v) for k, v in json.load(f).items()}
        except (OSError, ValueError):
            return None

    def _save_progress(self, offsets) -> None:
        import os

        p = self.o.progress_path
        if not p:
            return
        tmp = f"{p}.tmp"
        with open(tmp, "w") as f:
            json.dump(offsets, f)
        os.replace(tmp, p)  # atomic, like the store's conditional put

    def _ratchet(self, offsets) -> None:
        self._cur = {
            s: max(int(self._cur.get(s, 0)), int(v))
            for s, v in {**self._cur, **offsets}.items()
        }

    # --- DataSourceStreamReader API -----------------------------------

    def initialOffset(self):
        # S2: positioning — TrimHorizon at start_sequence
        return {str(s): self.o.start_sequence for s in range(self.o.shards)}

    def latestOffset(self):
        nxt = {
            s: min(int(v) + self.o.batch_limit, self.o.records_per_shard)
            for s, v in self._cur.items()
        }
        self._cur = nxt
        return nxt

    def partitions(self, start, end):
        # ratchet from BOTH bounds: `start` carries Spark's committed
        # high-water mark, so a restarted reader with no progress file
        # resynchronizes its pacing cursor in this first trigger instead
        # of emitting backward offsets until it catches up
        self._ratchet(start)
        self._ratchet(end)
        return [
            _ShardRange(int(s), int(start[s]), int(end[s]))
            for s in sorted(start, key=int)
            if int(end[s]) > int(start[s])
        ]

    def read(self, partition: _ShardRange):
        for seq in range(partition.start, partition.end):
            yield _record(partition.shard, seq)

    def commit(self, end):
        # persist the RATCHETED cursor, not the raw `end`: if the
        # progress file was deleted while the query was behind, writing
        # raw `end` could regress the durable high-water mark
        self._ratchet(end)
        self._save_progress({s: int(v) for s, v in self._cur.items()})


class GzkStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gzk_stream"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> GzkBatchReader:
        return GzkBatchReader(self.options)

    def streamReader(self, schema) -> GzkStreamReader:
        return GzkStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(GzkStreamDataSource)


def offsets_roundtrip(offsets: dict) -> dict:
    """Offsets must survive JSON serialization (Spark's offset log)."""
    return json.loads(json.dumps(offsets))
