"""Two-phase checkpoint sink (Python DataSource writer API): batch and
streaming writes publish only driver-committed files, and a replayed
micro-batch commit is a no-op."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.sources.gzk_sink import (
    GzkCommitMessage,
    _commit_files,
    read_committed,
    register,
)


def _events_slice(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 97 == 0)
        .select(
            F.col("event_id").alias("sequence_number"),
            "user_id",
            "event_type",
        )
    )


def test_batch_write_commits_all_partitions(spark, sf_dir, tmp_path):
    register(spark)
    path = str(tmp_path / "sink_batch")
    df = _events_slice(spark, sf_dir)
    df.write.format("gzk_checkpoint_sink").mode("append").save(path)

    rows = read_committed(path)
    exp = [r.asDict() for r in df.collect()]
    key = lambda d: d["sequence_number"]  # noqa: E731
    assert sorted(rows, key=key) == sorted(exp, key=key)
    # phase-2 visibility rule: nothing left un-published
    assert os.listdir(os.path.join(path, "tmp")) == []
    # manifest checkpoint fold = max sequence across partitions
    with open(os.path.join(path, "_manifest.jsonl")) as f:
        entries = [json.loads(line) for line in f]
    assert len(entries) == 1
    assert entries[0]["checkpoint_seq"] == max(e["sequence_number"] for e in exp)
    assert entries[0]["n_rows"] == len(exp)


def test_stream_write_equals_batch(spark, sf_dir, tmp_path):
    register(spark)
    src = str(tmp_path / "sink_src")
    batch = _events_slice(spark, sf_dir)
    batch.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    path = str(tmp_path / "sink_stream")
    q = (
        stream.writeStream.format("gzk_checkpoint_sink")
        .option("path", path)
        .option("checkpointLocation", str(tmp_path / "ck_sink"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = read_committed(path)
    exp = [r.asDict() for r in batch.collect()]
    key = lambda d: d["sequence_number"]  # noqa: E731
    assert sorted(rows, key=key) == sorted(exp, key=key)
    with open(os.path.join(path, "_manifest.jsonl")) as f:
        entries = [json.loads(line) for line in f]
    assert all(e["batch_id"] is not None for e in entries)


def test_replayed_batch_commit_is_noop(tmp_path):
    """The at-least-once contract: re-committing an already-manifested
    batchId publishes nothing and drops the replayed temp files."""
    path = str(tmp_path / "sink_replay")
    os.makedirs(os.path.join(path, "tmp"))

    def stage(fname, rows):
        with open(os.path.join(path, "tmp", fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return GzkCommitMessage(fname, len(rows), max(r["sequence_number"] for r in rows))

    m1 = stage("a.part.jsonl", [{"sequence_number": 1}, {"sequence_number": 7}])
    _commit_files(path, [m1], 0)
    assert len(read_committed(path)) == 2

    # micro-batch 0 replays after a checkpoint rollback: same batchId,
    # fresh temp file — must NOT double-publish
    m2 = stage("b.part.jsonl", [{"sequence_number": 1}, {"sequence_number": 7}])
    _commit_files(path, [m2], 0)
    assert len(read_committed(path)) == 2
    assert os.listdir(os.path.join(path, "tmp")) == []

    # a NEW batch still publishes
    m3 = stage("c.part.jsonl", [{"sequence_number": 9}])
    _commit_files(path, [m3], 1)
    assert len(read_committed(path)) == 3
