"""State data source: a checkpoint's internal keyed state must read
back as a DataFrame equal to the batch fold, and the metadata source
must inventory the operator and its batch range."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.streaming.state_inspect import (
    read_query_state,
    read_state_metadata,
)


def _run_shard_counts(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "st_src")
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withColumn("shard_id", F.col("user_id") % 8)
        .groupBy("shard_id")
        .agg(F.count("*").alias("n"))
    )
    ck = str(tmp_path / "st_ck")
    q = (
        agg.writeStream.format("memory")
        .queryName("state_inspect_t")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    return ev, ck


def test_statestore_reads_back_aggregation_state(spark, sf_dir, tmp_path):
    ev, ck = _run_shard_counts(spark, sf_dir, tmp_path)
    state = read_query_state(spark, ck)
    got = {
        r["key"]["shard_id"]: r["value"]["count"] for r in state.collect()
    }
    exp = {
        r["shard_id"]: r["n"]
        for r in ev.withColumn("shard_id", F.col("user_id") % 8)
        .groupBy("shard_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp
    # the state scan is partition-parallel, not a driver readback
    assert state.select("partition_id").distinct().count() >= 1


def test_state_metadata_inventories_checkpoint(spark, sf_dir, tmp_path):
    _, ck = _run_shard_counts(spark, sf_dir, tmp_path)
    meta = read_state_metadata(spark, ck).collect()
    assert len(meta) >= 1
    row = meta[0]
    assert row["operatorId"] == 0
    assert "Aggregate" in row["operatorName"] or "stateStore" in str(row)
    assert row["minBatchId"] >= 0 and row["maxBatchId"] >= row["minBatchId"]
