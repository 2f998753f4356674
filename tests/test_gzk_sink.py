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
    assert q.awaitTermination(120), "streaming query did not finish in 120s"

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


def test_torn_manifest_line_tolerated(tmp_path):
    """Crash-recovery hardening (r7 advice): a driver crash mid-append
    can leave a partial JSON line; every subsequent read AND commit
    must skip it instead of raising — the un-manifested batch simply
    replays (at-least-once)."""
    from go_zoom_kinesis_spark.sources.gzk_sink import MANIFEST, _manifest_batches

    path = str(tmp_path / "sink_torn")
    os.makedirs(os.path.join(path, "tmp"))

    def stage(fname, rows):
        with open(os.path.join(path, "tmp", fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return GzkCommitMessage(
            fname, len(rows), max(r["sequence_number"] for r in rows)
        )

    _commit_files(path, [stage("a.part.jsonl", [{"sequence_number": 1}])], 0)
    # simulate the crash: torn half-written line at the tail
    with open(os.path.join(path, MANIFEST), "a") as f:
        f.write('{"batch_id": 1, "files": ["b.part.jso')

    assert _manifest_batches(path) == {0}
    assert len(read_committed(path)) == 1
    # the recovery commit (replay of batch 1) must succeed and heal the
    # manifest (atomic rewrite drops the torn line)
    _commit_files(path, [stage("b.part.jsonl", [{"sequence_number": 2}])], 1)
    assert _manifest_batches(path) == {0, 1}
    assert len(read_committed(path)) == 2
    with open(os.path.join(path, MANIFEST)) as f:
        for line in f:
            json.loads(line)  # every surviving line is whole


def test_batch_overwrite_mode_truncates(spark, sf_dir, tmp_path):
    """``mode('overwrite')`` must replace the committed state, not
    silently append (r7 advice: the writer used to ignore the flag)."""
    register(spark)
    path = str(tmp_path / "sink_overwrite")
    df = _events_slice(spark, sf_dir)

    df.write.format("gzk_checkpoint_sink").mode("append").save(path)
    n1 = len(read_committed(path))
    assert n1 > 0

    # append doubles; overwrite resets to exactly one copy
    df.write.format("gzk_checkpoint_sink").mode("append").save(path)
    assert len(read_committed(path)) == 2 * n1
    df.write.format("gzk_checkpoint_sink").mode("overwrite").save(path)
    rows = read_committed(path)
    assert len(rows) == n1
    exp = [r.asDict() for r in df.collect()]
    key = lambda d: d["sequence_number"]  # noqa: E731
    assert sorted(rows, key=key) == sorted(exp, key=key)
    # no orphaned data files outside the manifest
    manifested = {f for e in __import__(
        "go_zoom_kinesis_spark.sources.gzk_sink", fromlist=["_manifest_entries"]
    )._manifest_entries(path) for f in e["files"]}
    on_disk = {f for f in os.listdir(path) if f.endswith(".part.jsonl")}
    assert on_disk == manifested
