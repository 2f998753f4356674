"""Kinesis-shaped Python DataSource: batch determinism, streaming
pacing (GetRecords-style limits), checkpoint resume, offset
serializability."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from go_zoom_kinesis_spark.sources import gzk_datasource as ds


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    try:
        ds.register(spark)
    except Exception:
        pass  # already registered on this shared session


def _batch(spark, **opts):
    r = spark.read.format("gzk_stream")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_is_deterministic_and_complete(spark):
    df = _batch(spark, shards=4, records_per_shard=50)
    assert df.count() == 200
    per = {
        r["shard_id"]: r
        for r in df.groupBy("shard_id")
        .agg(
            F.count("*").alias("n"),
            F.min("sequence_number").alias("mn"),
            F.max("sequence_number").alias("mx"),
            F.countDistinct("sequence_number").alias("d"),
        )
        .collect()
    }
    assert set(per) == {f"shard-{i}" for i in range(4)}
    for r in per.values():
        assert (r["n"], r["mn"], r["mx"], r["d"]) == (50, 0, 49, 50)
    # payload hash column matches the python reference
    row = df.filter(
        (F.col("shard_id") == "shard-2") & (F.col("sequence_number") == 7)
    ).collect()[0]
    assert row["payload"] == ds._payload(2, 7)
    assert row["payload_hash"] == ds._char_hash(ds._payload(2, 7))


def test_batch_start_sequence_positions_scan(spark):
    df = _batch(spark, shards=2, records_per_shard=30, start_sequence=20)
    assert df.count() == 2 * 10
    assert df.agg(F.min("sequence_number")).collect()[0][0] == 20


def _drain(spark, q, name, total, timeout_s=300):
    # generous ceiling: under a full-suite run the shared local JVM is
    # contended and microbatches slow down ~5x; the loop exits as soon as
    # `total` rows land, so the happy path is unaffected.
    for _ in range(int(timeout_s * 2)):
        n = spark.sql(f"SELECT count(*) c FROM {name}").collect()[0]["c"]
        if n >= total:
            break
        time.sleep(0.5)
    q.stop()
    return spark.sql(f"SELECT count(*) c FROM {name}").collect()[0]["c"]


def test_stream_paces_by_batch_limit_and_covers_exactly(spark, tmp_path):
    sdf = (
        spark.readStream.format("gzk_stream")
        .option("shards", 2)
        .option("records_per_shard", 250)
        .option("batch_limit", 100)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("gzk_pace_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    got = _drain(spark, q, "gzk_pace_t", 500)
    assert got == 500  # exactly-once per sequence: no dups, no gaps
    rows = spark.sql(
        "SELECT shard_id, count(*) n, count(DISTINCT sequence_number) d, "
        "min(sequence_number) mn, max(sequence_number) mx "
        "FROM gzk_pace_t GROUP BY shard_id"
    ).collect()
    for r in rows:
        assert (r["n"], r["d"], r["mn"], r["mx"]) == (250, 250, 0, 249)
    # 250 records at a 100-record GetRecords cap needs >= 3 microbatches
    assert q.lastProgress["batchId"] >= 2


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    # memory sinks cannot recover a checkpoint; the file sink exercises
    # the real offset-log resume path (S3: checkpoint-preferred resume)
    ck = str(tmp_path / "ck_resume")
    out = str(tmp_path / "out_resume")
    progress = str(tmp_path / "gzk_progress.json")

    def start():
        return (
            spark.readStream.format("gzk_stream")
            .option("shards", 2)
            .option("records_per_shard", 300)
            .option("batch_limit", 50)
            .option("progress_path", progress)
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def written():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    q = start()
    for _ in range(720):  # stop mid-stream after the first chunk lands
        if written() >= 100:
            break
        time.sleep(0.25)
    q.stop()
    mid = written()
    assert 0 < mid < 600
    q2 = start()
    for _ in range(720):
        if written() >= 600:
            break
        time.sleep(0.25)
    q2.stop()
    rows = spark.read.parquet(out).select("shard_id", "sequence_number").collect()
    keys = [(r["shard_id"], r["sequence_number"]) for r in rows]
    # resumed from the offset log: every sequence exactly once, no
    # TrimHorizon replay, no gaps
    assert len(keys) == 600
    assert len(set(keys)) == 600


def test_offsets_json_roundtrip():
    r = ds.GzkStreamReader({"shards": "3", "records_per_shard": "10", "batch_limit": "4"})
    o0 = r.initialOffset()
    assert ds.offsets_roundtrip(o0) == o0
    o1 = r.latestOffset()
    assert ds.offsets_roundtrip(o1) == o1
    assert all(int(v) <= 10 for v in o1.values())
    parts = r.partitions(o0, o1)
    assert {p.shard for p in parts} == {0, 1, 2}
    assert all(p.end - p.start == 4 for p in parts)


def test_source_through_stream_processor(spark, tmp_path):
    """Capstone integration: the Kinesis-shaped source feeding the
    reference-faithful processor — soft/hard classification, bounded
    retries, per-shard max-success checkpoints — is the whole reference
    consumer re-expressed on Spark APIs end-to-end."""
    from go_zoom_kinesis_spark.streaming.backoff import ExponentialBackoff
    from go_zoom_kinesis_spark.streaming.checkpoint import InMemoryCheckpointStore
    from go_zoom_kinesis_spark.streaming.processor import (
        ProcessorConfig,
        StreamProcessor,
    )

    shards, per_shard = 4, 120
    # batch_limit == per_shard: an availableNow-style run snapshots
    # latestOffset once, so the tip must cover the bounded stream here
    # (pacing across microbatches is pinned by the tests above)
    opts = {"shards": shards, "records_per_shard": per_shard, "batch_limit": per_shard}

    def load(reader):
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load()

    stream = load(spark.readStream.format("gzk_stream"))
    snapshot = load(spark.read.format("gzk_stream"))

    def classify(df):
        return df.withColumn(
            "outcome",
            F.when(F.col("payload_hash") % 50 == 0, F.lit("hard"))
            .when(
                (F.col("sequence_number") % 17 == 0) & (F.col("attempt") < 1),
                F.lit("soft"),
            )
            .otherwise(F.lit("success")),
        )

    store = InMemoryCheckpointStore()
    sunk: list = []
    cfg = ProcessorConfig(
        checkpoint_location=str(tmp_path / "ds_ckpt"),
        total_timeout=180.0,
        backoff=ExponentialBackoff(0.001, 0.002, jitter_factor=0),
    )
    proc = StreamProcessor(
        spark, classify, store, cfg,
        sink=lambda df, e: sunk.extend(df.collect()), sleep=lambda s: None,
    )
    q = proc.run_stream(stream, source_snapshot=snapshot)
    assert proc.await_with_timeout(q)

    n_hard = snapshot.filter(F.col("payload_hash") % 50 == 0).count()
    assert len(sunk) == shards * per_shard - n_hard  # soft retried, hard dropped
    cps = store.all_checkpoints()
    assert len(cps) == shards
    # checkpoint = max successfully-processed sequence per shard
    for shard, seq in cps.items():
        assert int(seq) <= per_shard - 1
