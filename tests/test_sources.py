"""Sources & sinks: lossless format round-trips, partitioned writes,
stream builders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_zoom_kinesis_spark.io import load_table
from go_zoom_kinesis_spark.plans import plan_summary
from go_zoom_kinesis_spark.sources import (
    file_stream,
    kinesis_stream,
    rate_stream,
    read_any,
    write_any,
)


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_round_trip_lossless(spark, tmp_path, events, fmt):
    path = str(tmp_path / f"rt_{fmt}")
    write_any(events, path, fmt)
    got = read_any(spark, path, fmt, schema=events.schema)
    assert _sorted_rows(got) == _sorted_rows(events)


def test_unknown_format_rejected(spark, tmp_path, events):
    with pytest.raises(ValueError, match="unsupported format"):
        write_any(events, str(tmp_path / "x"), "avroz")
    with pytest.raises(ValueError, match="unsupported format"):
        read_any(spark, str(tmp_path / "x"), "avroz")


def test_partitioned_write_enables_pruning(spark, tmp_path, events):
    """Hive-layout partitioning must turn a partition-column filter into
    partition pruning (no data files of other partitions scanned)."""
    path = str(tmp_path / "by_type")
    write_any(events, path, "parquet", partition_by=["event_type"])
    got = read_any(spark, path, "parquet").filter(F.col("event_type") == "purchase")
    assert got.count() == events.filter(F.col("event_type") == "purchase").count()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]


def test_file_stream_reads_everything(spark, tmp_path, events):
    src = str(tmp_path / "stream_src")
    events.write.mode("overwrite").parquet(src)
    stream = file_stream(spark, src, events.schema, max_files_per_trigger=2)
    q = (
        stream.groupBy()
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("src_count")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    assert spark.sql("SELECT n FROM src_count").collect()[0][0] == events.count()


def test_rate_stream_is_streaming(spark):
    assert rate_stream(spark).isStreaming


def test_kinesis_builder_validates_position(spark):
    with pytest.raises(ValueError, match="initial_position"):
        kinesis_stream(spark, "s", "us-east-1", initial_position="BOGUS")


def test_kinesis_builder_fails_cleanly_without_connector(spark):
    """No aws-kinesis connector in this container: building the source
    must fail with the standard DATA_SOURCE_NOT_FOUND error, not hang or
    mis-route."""
    with pytest.raises(Exception, match="DATA_SOURCE_NOT_FOUND"):
        kinesis_stream(spark, "s", "us-east-1")


def test_plan_summary_shape(spark, sf_dir, events):
    s = plan_summary(events.filter(F.col("event_id") > 10).select("event_id"))
    assert s["pushed_filters"] and not s["cartesian"]
    assert any("event_id" in p for p in s["pushed_filters"])


def test_fan_out_narrow(spark, sf_dir):
    """Single-file scans widen to default parallelism; already-wide
    inputs pass through without an extra shuffle."""
    from go_zoom_kinesis_spark.io import fan_out_narrow, load_table

    docs = load_table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    wide = fan_out_narrow(docs)
    assert (
        wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )
    assert wide.count() == docs.count()
    # already wide ⇒ identity (no repartition node added)
    again = fan_out_narrow(wide)
    assert again is wide


def test_schema_evolution_merge_read(spark, tmp_path, events):
    """Schema evolution across parquet generations — a 100 TB table
    accumulates files written by different pipeline versions. A
    mergeSchema read must union the schemas (new columns null-filled
    for old files) and per-file pruning/pushdown must keep working."""
    base = str(tmp_path / "evolving")
    v1 = events.select("event_id", "event_type", "value")
    v1.write.parquet(base + "/gen=1")
    v2 = events.select(
        "event_id",
        "event_type",
        "value",
        F.lit("v2").alias("pipeline_version"),  # column added later
    )
    v2.write.parquet(base + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) >= {
        "event_id", "event_type", "value", "pipeline_version", "gen",
    }
    assert merged.count() == v1.count() + v2.count()
    # old generation reads the evolved column as null
    olds = merged.filter(F.col("gen") == 1)
    assert olds.filter(F.col("pipeline_version").isNull()).count() == olds.count()
    news = merged.filter(F.col("gen") == 2)
    assert news.filter(F.col("pipeline_version") == "v2").count() == news.count()
